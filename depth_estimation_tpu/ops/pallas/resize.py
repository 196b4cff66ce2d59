"""Pallas fused preprocess + resize kernels (N3/N7 in SURVEY.md §2b).

The separable resize is two dense matmuls (see ops/resize.py). XLA executes
them well but materializes the row-resized intermediate in HBM between the
two contractions and keeps the uint8→f32/normalize steps as separate
fusions. These kernels run the whole chain in one ``pallas_call`` with every
operand VMEM-resident:

* ``pallas_preprocess`` — uint8 CHW-planar frame → BGR→RGB flip → /255 →
  cubic H-resize → cubic W-resize → per-channel normalize, per-channel 2D
  matmuls on the MXU (f32 accumulation), zero HBM intermediates.
* ``pallas_resize2d`` — single-plane resize (the depth-map bicubic upsample
  of depth_midas.py:28-33) as one fused W_h · D · W_wᵀ kernel.

Both fall back to the XLA path when the working set exceeds the VMEM budget
or off-TPU (tests run them in interpret mode).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from depth_estimation_tpu.ops.resize import interp_matrix

_VMEM_BUDGET = 12 * 1024 * 1024  # leave headroom under ~16MB/core


def _dot_f32(a, b):
    # true-f32 MXU matmul (multi-pass); DEFAULT would round inputs to bf16
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def _preprocess_kernel(mean_ref, std_ref, x_ref, wh_ref, wwt_ref, out_ref):
    # grid over channels: x_ref block is ONE input plane (1, H_in, W_in) u8
    # (the BGR→RGB flip is folded into the input index_map); out_ref is the
    # matching output plane. Mosaic has no direct u8->f32 cast; hop via i32.
    c = pl.program_id(0)
    xc = x_ref[0].astype(jnp.int32).astype(jnp.float32) * (1.0 / 255.0)
    o = _dot_f32(_dot_f32(wh_ref[:], xc), wwt_ref[:])
    out_ref[0] = (o - mean_ref[c]) / std_ref[c]


def _fits_vmem(h_in, w_in, h_out, w_out, planes=3):
    bytes_needed = (
        planes * h_in * w_in  # u8 input
        + 4 * (h_out * h_in + w_in * w_out)  # weight mats
        + 4 * planes * (h_out * w_in + h_out * w_out)  # intermediate + out
    )
    return bytes_needed < _VMEM_BUDGET


@functools.partial(
    jax.jit, static_argnames=("out_hw", "mean", "std", "bgr_to_rgb", "method", "interpret")
)
def pallas_preprocess(
    img_u8: jnp.ndarray,
    out_hw: Tuple[int, int],
    mean: Tuple[float, float, float],
    std: Tuple[float, float, float],
    bgr_to_rgb: bool = True,
    method: str = "cubic",
    interpret: bool = False,
) -> jnp.ndarray:
    """uint8 (H, W, 3) → normalized f32 (1, H_out, W_out, 3), one kernel."""
    h_in, w_in = img_u8.shape[:2]
    h_out, w_out = out_hw
    wh = jnp.asarray(interp_matrix(h_in, h_out, method, False))
    wwt = jnp.asarray(interp_matrix(w_in, w_out, method, False).T)
    x = jnp.transpose(img_u8, (2, 0, 1))  # planar
    mean_v = jnp.asarray(mean, jnp.float32)
    std_v = jnp.asarray(std, jnp.float32)

    src_plane = (lambda c: (2 - c, 0, 0)) if bgr_to_rgb else (lambda c: (c, 0, 0))
    out = pl.pallas_call(
        _preprocess_kernel,
        grid=(3,),
        out_shape=jax.ShapeDtypeStruct((3, h_out, w_out), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # mean (3,)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # std (3,)
            pl.BlockSpec((1, h_in, w_in), src_plane, memory_space=pltpu.VMEM),
            pl.BlockSpec((h_out, h_in), lambda c: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w_in, w_out), lambda c: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h_out, w_out), lambda c: (c, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(mean_v, std_v, x, wh, wwt)
    return jnp.transpose(out, (1, 2, 0))[None]


def _resize_kernel(x_ref, wh_ref, wwt_ref, out_ref):
    out_ref[:] = _dot_f32(_dot_f32(wh_ref[:], x_ref[:].astype(jnp.float32)), wwt_ref[:])


@functools.partial(jax.jit, static_argnames=("out_hw", "method", "align_corners", "interpret"))
def pallas_resize2d(
    plane: jnp.ndarray,
    out_hw: Tuple[int, int],
    method: str = "cubic",
    align_corners: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """(H, W) → (H_out, W_out) fused separable resize (e.g. the depth-map
    bicubic upsample, reference depth_midas.py:28-33)."""
    h_in, w_in = plane.shape
    h_out, w_out = out_hw
    wh = jnp.asarray(interp_matrix(h_in, h_out, method, align_corners))
    wwt = jnp.asarray(interp_matrix(w_in, w_out, method, align_corners).T)
    return pl.pallas_call(
        _resize_kernel,
        out_shape=jax.ShapeDtypeStruct((h_out, w_out), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(plane, wh, wwt)


def preprocess_fits_vmem(in_hw: Tuple[int, int], out_hw: Tuple[int, int]) -> bool:
    return _fits_vmem(in_hw[0], in_hw[1], out_hw[0], out_hw[1])
