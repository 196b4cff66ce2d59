"""Detector weight auto-loading from the TFLite cache directory.

Drop the public MediaPipe model files (the exact ones mediapipe 0.8.11
bundles — reference requirements.txt:2) into
``~/.cache/depth_estimation_tpu/tflite/`` (or ``$DEPTH_ESTIMATION_TPU_CACHE/
tflite/``):

    face_detection_short_range.tflite   (a.k.a. face_detection_front.tflite)
    face_landmark.tflite
    iris_landmark.tflite
    pose_detection.tflite
    pose_landmark_full.tflite           (or _lite / _heavy)

and ``PersonDetector`` / ``FaceDetector`` become production-accurate with no
code changes: each file is structurally converted (utils/convert.py) on
first use and the converted tree is cached content-hashed via orbax, so
subsequent constructions load instantly.
"""

from __future__ import annotations

import json
import warnings
from typing import Dict, Optional

from depth_estimation_tpu.utils import checkpoint as ckpt

# params-key → (candidate file names in preference order, converter)
_SPECS = {
    "blazeface": (
        ("face_detection_short_range.tflite", "face_detection_front.tflite"),
        "convert_blazeface_tflite",
    ),
    "facemesh": (
        (("face_landmark.tflite", "iris_landmark.tflite"),),
        "convert_facemesh_tflite",
    ),
    "blazepose_detector": (
        ("pose_detection.tflite",),
        "convert_blazepose_detector_tflite",
    ),
    "blazepose": (
        ("pose_landmark_full.tflite", "pose_landmark_lite.tflite", "pose_landmark_heavy.tflite"),
        "convert_blazepose_tflite",
    ),
}


def tflite_dir():
    return ckpt.cache_dir() / "tflite"


def _convert_one(key: str) -> Optional[Dict]:
    from depth_estimation_tpu.utils import convert as cv

    names, fn_name = _SPECS[key]
    fn = getattr(cv, fn_name)
    root = tflite_dir()
    for cand in names:
        paths = [root / c for c in (cand if isinstance(cand, tuple) else (cand,))]
        if not all(p.exists() for p in paths):
            continue
        digest = "+".join(ckpt.content_hash(p) for p in paths)
        cache_key = f"detector_{key}"
        meta_file = ckpt.cache_dir() / cache_key / "meta.json"
        if meta_file.exists():
            meta = json.loads(meta_file.read_text())
            if meta.get("source_sha256") == digest:
                cached = ckpt.load_params(cache_key)
                if cached is not None:
                    return cached
        try:
            params = fn(*(str(p) for p in paths))
        except (ValueError, RuntimeError) as e:
            # ValueError: structural mismatch; RuntimeError: flatbuffers
            # runtime unavailable. Either way the documented contract is
            # auto-load-if-possible with random-init fallback, not a crash.
            warnings.warn(
                f"TFLite conversion for {key!r} unavailable: {e}",
                stacklevel=2,
            )
            return None
        ckpt.save_params(cache_key, params, meta={"source_sha256": digest})
        return params
    return None


def load_detector_params() -> Dict[str, Dict]:
    """{params_key: converted tree} for every detector whose TFLite file(s)
    are present in the cache dir; {} when none are (random-init fallback)."""
    out = {}
    if not tflite_dir().exists():
        return out
    for key in _SPECS:
        p = _convert_one(key)
        if p is not None:
            out[key] = p
    return out
