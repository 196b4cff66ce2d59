"""torch.hub "transforms" compatibility shim.

The reference obtains callables via
``torch.hub.load("intel-isl/MiDaS", "transforms")`` and uses
``.dpt_transform`` / ``.small_transform`` (depth_midas.py:12-16). This module
exposes the same names as plain callables so code ported from the reference
keeps working:

    from depth_estimation_tpu import transforms
    batch = transforms.dpt_transform(rgb_float_or_uint8_image)

Each returns a normalized float32 NHWC batch on device (NOT NCHW — this
framework is NHWC end to end).
"""

from __future__ import annotations

import numpy as np

from depth_estimation_tpu.config import (
    DEFAULT_PREPROCESS,
    DPT_PREPROCESS,
    SMALL_PREPROCESS,
)
from depth_estimation_tpu.ops.preprocess import preprocess


def _as_u8(img: np.ndarray) -> np.ndarray:
    if img.dtype == np.uint8:
        return img
    # the hub transforms take float RGB in [0,1]; ours ingest uint8
    return np.clip(np.asarray(img) * 255.0, 0, 255).astype(np.uint8)


def dpt_transform(img):
    """384 'minimal' resize, mean=std=0.5 (DPT_Large / DPT_Hybrid input)."""
    return preprocess(_as_u8(img), DPT_PREPROCESS, bgr_to_rgb=False)


def small_transform(img):
    """256 'upper_bound' resize, ImageNet stats (MiDaS_small input)."""
    return preprocess(_as_u8(img), SMALL_PREPROCESS, bgr_to_rgb=False)


def default_transform(img):
    """384 'upper_bound' resize, ImageNet stats — the hub's own pairing for
    the v2.1 "MiDaS" model. The reference never reaches it (its non-DPT
    branch selects small_transform, depth_midas.py:13-16; docs/PARITY.md #8b),
    so it is exposed only for hub-surface compatibility."""
    return preprocess(_as_u8(img), DEFAULT_PREPROCESS, bgr_to_rgb=False)
