"""Duplicate of depth_midas.py — the reference ships midas.py and
depth_midas.py as byte-identical copies (SURVEY.md file census); this module
preserves that public surface by re-exporting the same API.
"""

from depth_midas import DepthEstimator, VidStream, main  # noqa: F401

if __name__ == "__main__":
    main()
