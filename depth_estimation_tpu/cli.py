"""Console-script entry points (installed via pyproject.toml).

Thin wrappers over the repo-root entry modules so both `python depth_midas.py`
(reference-style) and `depth-midas` (installed) work.
"""

from __future__ import annotations

import importlib.util
import pathlib
import sys


def _load_root_module(name: str):
    # repo checkout: the entry scripts sit at the repository root
    root = pathlib.Path(__file__).resolve().parent.parent
    path = root / f"{name}.py"
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault(name, mod)
    spec.loader.exec_module(mod)
    return mod


def depth_midas_main():
    return _load_root_module("depth_midas").main()


def midas_mediapipe_main():
    return _load_root_module("midas_mediapipe").main()


def depth_by_detection_main():
    return _load_root_module("depth_by_detection").main()
