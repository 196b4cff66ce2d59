"""On-device depth sampling + ROI reductions.

TPU-native counterparts of the reference's host-side depth lookups:

* ``depth_at_points`` — sample the depth map at landmark coordinates
  (face.get_depth reads two iris pixels, face.py:91-116). The ``faithful``
  flag reproduces the reference's transposed ``img[x, y]`` indexing.
* ``roi_median_depth`` — median depth inside detector boxes (BASELINE.json
  config 5: "detector boxes → per-ROI median depth + distance estimate").
  Branch-free: a fixed-size mask + masked median via sort, so it fuses into
  the same XLA program as the detector and depth net (detect-then-reduce
  with no host round-trip).
"""

from __future__ import annotations

import jax.numpy as jnp


def _bilinear_gather(img, xi, xi1, yi, yi1, tx, ty):
    """Shared bilinear sampler core on precomputed neighbor indices and
    fractions (the two crop-resize callers differ only in how they clamp
    them). Gathers rows then columns — two 1-D gathers instead of a 2-D
    one: contiguous lane access on TPU."""
    top = img[yi]  # (oh, W, C)
    bot = img[yi1]
    tl, tr = top[:, xi], top[:, xi1]  # (oh, ow, C)
    bl, br = bot[:, xi], bot[:, xi1]
    txc = tx[None, :, None]
    tyc = ty[:, None, None]
    return (tl * (1 - txc) + tr * txc) * (1 - tyc) + (bl * (1 - txc) + br * txc) * tyc


def crop_resize_bilinear(img: jnp.ndarray, box_xys: jnp.ndarray, out_hw) -> jnp.ndarray:
    """Sample a square sub-window of ``img`` to a fixed output size.

    img: (H, W, C); box_xys: (3,) = (x0, y0, side) in pixels (may be traced
    values — the crop is gather-based, so the box can be dynamic inside
    jit); out_hw: static (out_h, out_w). Half-pixel-centered bilinear (the
    align_corners=False convention), clamped at the image border.

    This is the ROI-extraction primitive of the landmark pipelines (eye
    crops for iris refinement, person crops for pose) — MediaPipe does the
    same with its ImageCroppingCalculator on the host; here it stays on
    device inside the same XLA program as the nets.
    """
    h, w = img.shape[0], img.shape[1]
    out_h, out_w = out_hw
    x0, y0, side = box_xys[0], box_xys[1], box_xys[2]
    sx = side / out_w
    sy = side / out_h
    xs = x0 + (jnp.arange(out_w, dtype=jnp.float32) + 0.5) * sx - 0.5  # (ow,)
    ys = y0 + (jnp.arange(out_h, dtype=jnp.float32) + 0.5) * sy - 0.5  # (oh,)
    xf = jnp.clip(jnp.floor(xs), 0, w - 1)
    yf = jnp.clip(jnp.floor(ys), 0, h - 1)
    tx = jnp.clip(xs - xf, 0.0, 1.0)
    ty = jnp.clip(ys - yf, 0.0, 1.0)
    xi = xf.astype(jnp.int32)
    yi = yf.astype(jnp.int32)
    xi1 = jnp.minimum(xi + 1, w - 1)
    yi1 = jnp.minimum(yi + 1, h - 1)
    return _bilinear_gather(img, xi, xi1, yi, yi1, tx, ty)


def crop_resize_bilinear_rect(img: jnp.ndarray, box_xywh: jnp.ndarray, out_hw) -> jnp.ndarray:
    """Rectangular crop-and-resize with crop-then-resize border semantics.

    img: (H, W, C); box_xywh: (4,) = (x0, y0, bw, bh) in pixels with integer
    values (may be traced); out_hw: static (out_h, out_w). Reproduces
    ``resize2d(img[y0:y0+bh, x0:x0+bw], out_hw, "linear")`` exactly: sample
    coordinates are clamped to the *box* interior (not the image border), so
    the result is bit-equivalent to slicing the crop on the host and
    resizing it — the primitive that lets the FaceMesh stage join the fused
    single-dispatch frame program (runtime/fused.py) with a dynamic,
    detection-dependent box.
    """
    out_h, out_w = out_hw
    x0, y0 = box_xywh[0], box_xywh[1]
    bw, bh = box_xywh[2], box_xywh[3]
    sx = bw / out_w
    sy = bh / out_h
    xs = x0 + jnp.clip((jnp.arange(out_w, dtype=jnp.float32) + 0.5) * sx - 0.5, 0.0, bw - 1.0)
    ys = y0 + jnp.clip((jnp.arange(out_h, dtype=jnp.float32) + 0.5) * sy - 0.5, 0.0, bh - 1.0)
    xf = jnp.floor(xs)
    yf = jnp.floor(ys)
    tx = xs - xf
    ty = ys - yf
    xi = xf.astype(jnp.int32)
    yi = yf.astype(jnp.int32)
    xi1 = jnp.minimum(xi + 1, (x0 + bw - 1).astype(jnp.int32))
    yi1 = jnp.minimum(yi + 1, (y0 + bh - 1).astype(jnp.int32))
    return _bilinear_gather(img, xi, xi1, yi, yi1, tx, ty)


def depth_at_points(depth: jnp.ndarray, points_xy: jnp.ndarray, faithful: bool = False) -> jnp.ndarray:
    """depth: (H, W); points_xy: (N, 2) pixel (x, y). Returns (N,) samples.

    faithful=True indexes depth[x, y] (the reference's transposed read,
    face.py:106-107); otherwise depth[y, x]. Coordinates are clamped.
    """
    h, w = depth.shape[-2], depth.shape[-1]
    x = jnp.clip(points_xy[:, 0].astype(jnp.int32), 0, w - 1)
    y = jnp.clip(points_xy[:, 1].astype(jnp.int32), 0, h - 1)
    if faithful:
        xs = jnp.clip(points_xy[:, 0].astype(jnp.int32), 0, h - 1)
        ys = jnp.clip(points_xy[:, 1].astype(jnp.int32), 0, w - 1)
        return depth[xs, ys]
    return depth[y, x]


def iris_depth(depth: jnp.ndarray, l_center_xy: jnp.ndarray, r_center_xy: jnp.ndarray) -> jnp.ndarray:
    """Mean relative inverse depth of the two iris centers (face.py:91-110),
    corrected indexing. Scalar output, fully on-device."""
    pts = jnp.stack([l_center_xy, r_center_xy], axis=0)
    return depth_at_points(depth, pts).mean()


def masked_median(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Median of ``values[mask]`` with static shapes: sort with +inf fill,
    then index the middle of the valid prefix."""
    v = jnp.where(mask, values, jnp.inf)
    v = jnp.sort(v.reshape(-1))
    n = mask.sum().astype(jnp.int32)
    lo = jnp.maximum((n - 1) // 2, 0)
    hi = jnp.maximum(n // 2, 0)
    med = (v[lo] + v[hi]) / 2.0
    return jnp.where(n > 0, med, jnp.nan)


def roi_median_depth(depth: jnp.ndarray, box_yxyx: jnp.ndarray) -> jnp.ndarray:
    """Median depth inside a (ymin, xmin, ymax, xmax) pixel box, on-device.

    Static-shaped: builds an (H, W) membership mask with broadcasted iotas
    (no dynamic slicing), then a masked median.
    """
    h, w = depth.shape[-2], depth.shape[-1]
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    ymin, xmin, ymax, xmax = box_yxyx[0], box_yxyx[1], box_yxyx[2], box_yxyx[3]
    mask = (ys >= ymin) & (ys < ymax) & (xs >= xmin) & (xs < xmax)
    return masked_median(depth, mask)


def rois_median_depth(depth: jnp.ndarray, boxes_yxyx: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Vectorized over M boxes: (M,) medians; invalid slots → nan."""
    import jax

    meds = jax.vmap(lambda b: roi_median_depth(depth, b))(boxes_yxyx)
    return jnp.where(valid, meds, jnp.nan)


def crop_resize_linear_matmul(img: jnp.ndarray, box_xywh: jnp.ndarray, out_hw) -> jnp.ndarray:
    """``crop_resize_bilinear_rect`` as two dense contractions.

    Identical sampling semantics (crop-then-resize border clamping), but
    instead of dynamic gathers — lane-hostile on TPU — the interpolation
    weights become dense (out, in) matrices built with broadcasted iota
    comparisons, and the sampling runs as two matmuls on the MXU (the same
    trick ops/resize.py uses for static resizes, extended to a dynamic,
    traced box). Weight build is elementwise; contraction cost
    out_h·H·W·C + out_h·out_w·W·C flops.

    Weights are exact one-hot pairs ((1-t)·[x=xi] + t·[x=xi+1]; the clamped
    duplicate-index case sums to 1 exactly as the gather path's tl==tr
    blend), and the dots run at HIGHEST precision so numerics match the
    gather implementation to f32 rounding.
    """
    h, w = img.shape[0], img.shape[1]
    out_h, out_w = out_hw
    x0, y0 = box_xywh[0], box_xywh[1]
    bw, bh = box_xywh[2], box_xywh[3]
    sx = bw / out_w
    sy = bh / out_h
    xs = x0 + jnp.clip((jnp.arange(out_w, dtype=jnp.float32) + 0.5) * sx - 0.5, 0.0, bw - 1.0)
    ys = y0 + jnp.clip((jnp.arange(out_h, dtype=jnp.float32) + 0.5) * sy - 0.5, 0.0, bh - 1.0)
    xf = jnp.floor(xs)
    yf = jnp.floor(ys)
    tx = xs - xf
    ty = ys - yf
    xi = xf.astype(jnp.int32)
    yi = yf.astype(jnp.int32)
    xi1 = jnp.minimum(xi + 1, (x0 + bw - 1).astype(jnp.int32))
    yi1 = jnp.minimum(yi + 1, (y0 + bh - 1).astype(jnp.int32))

    cols = jnp.arange(w, dtype=jnp.int32)[None, :]
    rows = jnp.arange(h, dtype=jnp.int32)[None, :]
    w_col = (cols == xi[:, None]) * (1.0 - tx[:, None]) + (cols == xi1[:, None]) * tx[:, None]
    w_row = (rows == yi[:, None]) * (1.0 - ty[:, None]) + (rows == yi1[:, None]) * ty[:, None]

    import jax

    hi = jax.lax.Precision.HIGHEST
    tmp = jnp.einsum("ih,hwc->iwc", w_row, img, precision=hi)
    return jnp.einsum("iwc,jw->ijc", tmp, w_col, precision=hi)
