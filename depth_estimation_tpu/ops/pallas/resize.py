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
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from depth_estimation_tpu.ops.resize import interp_matrix

_VMEM_BUDGET = 12 * 1024 * 1024  # leave headroom under ~16MB/core


def _preprocess_kernel(x_ref, wh_ref, wwt_ref, out_ref, *, mean, std, bgr_to_rgb):
    # x_ref: (3, H_in, W_in) uint8 planar; out_ref: (3, H_out, W_out) f32
    wh = wh_ref[:]
    wwt = wwt_ref[:]
    for c in range(3):
        src_c = 2 - c if bgr_to_rgb else c
        # Mosaic has no direct u8->f32 cast; hop through i32
        xc = x_ref[src_c].astype(jnp.int32).astype(jnp.float32) * (1.0 / 255.0)
        t = jnp.dot(wh, xc, preferred_element_type=jnp.float32)
        o = jnp.dot(t, wwt, preferred_element_type=jnp.float32)
        out_ref[c] = (o - mean[c]) * (1.0 / std[c])


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

    kernel = functools.partial(
        _preprocess_kernel, mean=tuple(mean), std=tuple(std), bgr_to_rgb=bgr_to_rgb
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((3, h_out, w_out), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, wh, wwt)
    return jnp.transpose(out, (1, 2, 0))[None]


def _resize_kernel(x_ref, wh_ref, wwt_ref, out_ref):
    t = jnp.dot(wh_ref[:], x_ref[:].astype(jnp.float32), preferred_element_type=jnp.float32)
    out_ref[:] = jnp.dot(t, wwt_ref[:], preferred_element_type=jnp.float32)


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
