#!/usr/bin/env python
"""Serve K video feeds through one batched device dispatch per tick.

Thin repo-root launcher for depth_estimation_tpu.tools.serve (the packaged
`depth-serve` console script). Mixed resolutions are bucketed per (H, W).

Usage:
  python tools/serve_multistream.py --src a.mp4 --src b.mp4 [--output a.avi --output b.avi]
  python tools/serve_multistream.py --src synthetic:30x480x640 --src synthetic:45x480x640
"""

import sys

sys.path.insert(0, ".")  # run from the repo root

from depth_estimation_tpu.tools.serve import main

if __name__ == "__main__":
    main()
