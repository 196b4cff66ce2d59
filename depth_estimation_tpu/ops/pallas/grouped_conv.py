"""Pallas TPU kernel for the ResNeXt grouped 3x3 convolution.

Why this exists (BASELINE.md round 3, tools/v21_profile.py): XLA's native
grouped-conv lowering runs the MiDaS v2.1 encoder's 32-group conv2s at
0.04-1.7 TFLOP/s effective, and both pure-XLA rewrites shipped earlier have
a structural HBM cost — the block-diagonal dense expansion streams
23 x 37.7 MB of zero-padded kernels per frame at layer3, and the im2col
batched matmul materializes ~9x-inflated patch tensors (the per-section
profile shows layer3 moving 2.17 GB/frame and dominating the forward at
3.02 of 4.91 ms bf16). The conv's FUNDAMENTAL traffic is ~40 MB and its
FLOPs ~3.5 GF for all of layer3 — the lowering, not the hardware, is the
bottleneck.

This kernel removes the materialization entirely:

- **Shifted-matmul formulation.** The input is padded to (H+3, W+2) and
  flattened to 2D rows once (fused XLA pad outside the kernel). Every one
  of the 9 conv taps is then a CONTIGUOUS static row-slice of that buffer:
  source index (h+dh)*(W+2) + (w+dw) is affine in the output's flat index
  h*(W+2) + w when the output keeps the padded row stride. The kernel
  computes H*(W+2) output rows and the wrapper slices off the 2 wrap-around
  columns per row (~12% extra rows, traded for zero relayouts).
- **Block-diagonal superblocks in VMEM.** The compact grouped kernel
  (3, 3, Cg, C) — the exact param nn.Conv uses, so converters/checkpoints/
  goldens are untouched — is expanded to (bw, bw) block-diagonal tiles
  (bw = f*Cg groups fused per MXU matmul, default 128 lanes) *inside* the
  kernel with a concat + iota mask: the zeros never touch HBM. Each
  (tap, superblock) is then one clean (H*(W+2), bw) x (bw, bw) MXU matmul
  with f32 accumulation.

Numerics: pure reassociation of the grouped conv's products plus exact-zero
contributions — parity-tested against ``nn.Conv(feature_group_count=G)`` in
tests/test_midas_v21.py. f32 inputs pin an explicit dot precision (Mosaic
rejects ambient ``jax.default_matmul_precision('high')`` inside kernels).

Reference parity: torchvision resnext101_32x8d Bottleneck.conv2 as consumed
by MiDaS v2.1 (reference depth_midas.py:10-12 model_type="MiDaS").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


_PRECISIONS = {
    "default": jax.lax.Precision.DEFAULT,
    "highest": jax.lax.Precision.HIGHEST,
}


def _split_bf16(a):
    """Hi/lo bf16 split of an f32 array: a ≈ hi + lo exactly as XLA's
    bf16_3x decomposition takes it (hi = round-to-bf16, lo = residual)."""
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot_f32(a, b, precision):
    """In-kernel f32 matmul at a named precision tier.

    Mosaic's dot lowering accepts only DEFAULT and HIGHEST — there is no
    HIGH enum path (jax/_src/pallas/mosaic/lowering.py raises
    NotImplementedError on it). "high" is therefore emulated as the same
    3-pass bf16 decomposition XLA's bf16_3x HIGH lowering performs:
    a·b ≈ ah·bh + ah·bl + al·bh with f32 accumulation (the al·bl term is
    below f32 rounding and dropped, exactly as XLA drops it). Half the MXU
    passes of the kernel's conservative HIGHEST default.
    """
    if precision == "high":
        if a.dtype != jnp.float32:
            # bf16 (or lower) operands carry no residual: both lo terms of
            # the decomposition are exactly zero, so the 3-pass emulation
            # would spend 3x the MXU passes to reproduce a single DEFAULT
            # dot. Short-circuit (ADVICE r4).
            precision = "default"
        else:
            ah, al = _split_bf16(a)
            bh, bl = _split_bf16(b)
            d = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                                  precision=jax.lax.Precision.DEFAULT)
            return d(ah, bh) + d(ah, bl) + d(al, bh)
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=_PRECISIONS[precision])


def pick_block_channels(channels: int, group_size: int, target: int = 128) -> int:
    """Largest multiple of ``group_size`` that divides ``channels`` and is <= target.

    Falls back to ``group_size`` (one group per matmul) when the target is
    smaller than a single group; ``channels`` itself is always a valid return.
    """
    if target >= channels:
        return channels
    f = max(1, target // group_size)
    while (channels // group_size) % f:
        f -= 1
    return f * group_size


def _kernel(x_ref, w_ref, out_ref, *, height, width, cg, bw, precision):
    """One (batch, superblock) grid step of the shifted-matmul grouped conv.

    x_ref:   (1, (H+3)*(W+2), bw) — zero-padded input rows, this superblock's
             channel columns.
    w_ref:   (9*cg, bw) — compact grouped kernel, rows ordered (tap, ci).
    out_ref: (1, H*(W+2), bw) — padded-stride output rows.
    """
    wp = width + 2
    rows = height * wp
    f = bw // cg
    dtype = x_ref.dtype
    # Block-diagonal mask for f groups fused into one (bw, bw) matmul; 0/1 is
    # exact in every dtype. Built once; Mosaic hoists it across the tap loop.
    rg = jax.lax.broadcasted_iota(jnp.int32, (bw, bw), 0) // cg
    cgi = jax.lax.broadcasted_iota(jnp.int32, (bw, bw), 1) // cg
    mask = (rg == cgi).astype(dtype)
    acc = jnp.zeros((rows, bw), jnp.float32)
    for tap in range(9):
        dh, dw = divmod(tap, 3)
        shift = dh * wp + dw
        a = x_ref[0, shift:shift + rows, :]
        kc = w_ref[tap * cg:(tap + 1) * cg, :]  # (cg, bw)
        # Tile the cg input rows across the f fused groups, then zero the
        # off-diagonal blocks — tiled[r, c] = kc[r % cg, c].
        tiled = kc if f == 1 else jnp.concatenate([kc] * f, axis=0)
        kd = tiled * mask
        acc += _dot_f32(a, kd, precision)
    out_ref[0] = acc.astype(out_ref.dtype)


def _row_chunk(h: int, wp: int, bw: int, itemsize: int, budget: int) -> int:
    """Largest divisor of ``h`` whose padded input block fits the VMEM budget.

    The 9 unrolled tap slices are relayout copies of the (rows, bw) block, so
    per-call VMEM scales with the row count; at MiDaS v2.1 layer1 (64x64x256
    f32) an unchunked call blows the 16 MB scoped-vmem limit (22.8 MB).
    """
    for hc in range(h, 0, -1):
        if h % hc == 0 and (hc + 3) * wp * bw * itemsize <= budget:
            return hc
    return 1


@functools.partial(
    jax.jit,
    static_argnames=(
        "groups", "block_channels", "precision", "interpret", "vmem_block_bytes"
    ),
)
def grouped_conv3x3_pallas(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    groups: int,
    block_channels: int = 128,
    precision: str | None = None,
    interpret: bool = False,
    vmem_block_bytes: int = 1 << 20,
) -> jnp.ndarray:
    """Grouped 3x3 conv, stride 1, SAME padding, NHWC / HWIO(grouped).

    ``x``: (B, H, W, C); ``kernel``: (3, 3, C // groups, C) exactly as
    ``nn.Conv(feature_group_count=groups)`` stores it. ``precision`` applies
    to the in-kernel dots ("default" | "high" | "highest"); None picks
    "highest" for f32 inputs (the 1e-3 accuracy-gate default) and "default"
    for bf16. Large spatial extents are split into row chunks (3-row halo
    re-read per chunk) so each pallas call stays within ``vmem_block_bytes``
    per input block.
    """
    b, h, w, c = x.shape
    if c % groups:
        raise ValueError(f"channels {c} not divisible by groups {groups}")
    cg = c // groups
    if kernel.shape != (3, 3, cg, c):
        raise ValueError(f"kernel shape {kernel.shape} != (3, 3, {cg}, {c})")
    dtype = jnp.promote_types(x.dtype, kernel.dtype)
    if precision is None:
        precision = "default" if dtype == jnp.bfloat16 else "highest"
    if precision not in ("default", "high", "highest"):
        raise ValueError(f"precision must be default|high|highest, got {precision!r}")
    bw = pick_block_channels(c, cg, block_channels)
    n_sb = c // bw
    wp = w + 2
    hc = _row_chunk(h, wp, bw, jnp.dtype(dtype).itemsize, vmem_block_bytes)
    # (H+3, W+2) zero pad: +1 top / +1 left for the conv's SAME padding,
    # +2 bottom / +1 right so the tap-(2,2) row slice stays in bounds.
    x_pad = jnp.pad(x.astype(dtype), ((0, 0), (1, 2), (1, 1), (0, 0)))
    w2 = kernel.astype(dtype).reshape(9 * cg, c)
    call = pl.pallas_call(
        functools.partial(_kernel, height=hc, width=w, cg=cg, bw=bw,
                          precision=precision),
        grid=(b, n_sb),
        in_specs=[
            pl.BlockSpec((1, (hc + 3) * wp, bw), lambda i, j: (i, 0, j)),
            pl.BlockSpec((9 * cg, bw), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((1, hc * wp, bw), lambda i, j: (i, 0, j)),
        out_shape=jax.ShapeDtypeStruct((b, hc * wp, c), dtype),
        interpret=interpret,
    )
    chunks = []
    for r0 in range(0, h, hc):
        xc = x_pad[:, r0:r0 + hc + 3, :, :].reshape(b, (hc + 3) * wp, c)
        chunks.append(call(xc, w2))
    out_pad = chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks, axis=1)
    # Drop the 2 wrap-around columns each row carried for the affine trick.
    return out_pad.reshape(b, h, wp, c)[:, :, :w, :]
