"""MiDaS input transforms, TPU-native.

Equivalent of the two torch.hub transform pipelines the reference selects at
depth_midas.py:12-16 (``dpt_transform`` / ``small_transform``), each of which
is: scale uint8 to [0,1] → aspect-preserving cubic resize constrained to a
multiple of 32 → per-channel normalize → CHW batch prep.

Here the whole chain (uint8 BGR → normalized float tensor) is a single
jit-compiled function per (input-shape → output-shape) pair: the BGR→RGB
flip, /255, the two resize matmuls (see :mod:`ops.resize`) and the
normalization are all fused by XLA into the first matmul's epilogue/prologue,
so the frame crosses host→HBM exactly once as raw uint8 and everything else
happens on-chip. Layout is NHWC (TPU-native) rather than the reference's NCHW.

Shape selection (``compute_resize_shape``) is scalar host math replicating
the MiDaS ``Resize.get_size`` behavior, including numpy banker's rounding in
the multiple-of-32 constraint.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from depth_estimation_tpu.config import PreprocessConfig
from depth_estimation_tpu.ops.resize import resize2d


def _constrain_to_multiple_of(x: float, multiple: int, min_val: int = 0, max_val: int | None = None) -> int:
    y = int(np.round(x / multiple) * multiple)
    if max_val is not None and y > max_val:
        y = int(np.floor(x / multiple) * multiple)
    if y < min_val:
        y = int(np.ceil(x / multiple) * multiple)
    return y


def compute_resize_shape(height: int, width: int, cfg: PreprocessConfig) -> Tuple[int, int]:
    """(new_height, new_width) per the MiDaS Resize policy.

    ``minimal``     — scale the side whose scale is closest to 1 (DPT).
    ``upper_bound`` — both sides ≤ target (MiDaS-small).
    ``lower_bound`` — both sides ≥ target.
    """
    scale_h = cfg.target_height / height
    scale_w = cfg.target_width / width

    if cfg.keep_aspect_ratio:
        if cfg.resize_method == "lower_bound":
            if scale_w > scale_h:
                scale_h = scale_w
            else:
                scale_w = scale_h
        elif cfg.resize_method == "upper_bound":
            if scale_w < scale_h:
                scale_h = scale_w
            else:
                scale_w = scale_h
        elif cfg.resize_method == "minimal":
            if abs(1 - scale_w) < abs(1 - scale_h):
                scale_h = scale_w
            else:
                scale_w = scale_h
        else:
            raise ValueError(f"unknown resize_method {cfg.resize_method!r}")

    m = cfg.ensure_multiple_of
    if cfg.resize_method == "lower_bound":
        new_h = _constrain_to_multiple_of(scale_h * height, m, min_val=cfg.target_height)
        new_w = _constrain_to_multiple_of(scale_w * width, m, min_val=cfg.target_width)
    elif cfg.resize_method == "upper_bound":
        new_h = _constrain_to_multiple_of(scale_h * height, m, max_val=cfg.target_height)
        new_w = _constrain_to_multiple_of(scale_w * width, m, max_val=cfg.target_width)
    else:  # minimal
        new_h = _constrain_to_multiple_of(scale_h * height, m)
        new_w = _constrain_to_multiple_of(scale_w * width, m)
    return new_h, new_w


@functools.partial(jax.jit, static_argnames=("out_hw", "mean", "std", "bgr_to_rgb"))
def _preprocess_impl(img_u8, out_hw, mean, std, bgr_to_rgb):
    x = img_u8
    if bgr_to_rgb:
        x = x[..., ::-1]
    x = x.astype(jnp.float32) / 255.0
    x = resize2d(x, out_hw, method="cubic", align_corners=False)
    mean_v = jnp.asarray(mean, dtype=jnp.float32)
    std_v = jnp.asarray(std, dtype=jnp.float32)
    x = (x - mean_v) / std_v
    if x.ndim == 3:
        x = x[None]  # add batch dim -> NHWC
    return x


def preprocess(img_bgr_u8: np.ndarray, cfg: PreprocessConfig, bgr_to_rgb: bool = True) -> jnp.ndarray:
    """uint8 BGR HxWx3 (or BxHxWx3) → normalized float32 NHWC batch on device.

    The BGR→RGB conversion replicates depth_midas.py:22; the rest replicates
    the hub transform chain applied at depth_midas.py:23.
    """
    h, w = img_bgr_u8.shape[-3:-1]
    out_hw = compute_resize_shape(h, w, cfg)
    return _preprocess_impl(img_bgr_u8, out_hw, tuple(cfg.mean), tuple(cfg.std), bgr_to_rgb)
