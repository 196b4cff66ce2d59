"""Depth evaluation metrics (beyond-reference subsystem).

The reference's only quality metrics are the streaming HUD's RMSE/MAE
between triangle-similarity and depth-derived distances
(/root/reference/face.py:141-153); it has no dataset evaluation at all.
This module adds the standard monocular-depth eval protocol so training
runs (train/loop.py) can be scored:

* predictions and ground truth are DISPARITY (inverse depth) maps, the
  MiDaS-family output convention;
* per-image least-squares scale+shift alignment of the prediction to the
  ground truth in disparity space — the MiDaS zero-shot protocol, the same
  closed form the SSI loss uses (train/losses.py::_lstsq_scale_shift) and
  the batched analogue of the reference's ``rel2abs_2`` lstsq fit
  (face.py:118-130);
* metrics computed in DEPTH space (1/disparity) where that is the standard
  (abs_rel, sq_rel, rmse, rmse_log, log10, δ<1.25^k).

Everything is pure jnp over (B, H, W) batches and jittable; masks mark
valid ground-truth pixels (gt_disp > eps).
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from depth_estimation_tpu.train.losses import _lstsq_scale_shift

METRIC_NAMES = ("abs_rel", "sq_rel", "rmse", "rmse_log", "log10", "d1", "d2", "d3")


def align_disparity(pred: jnp.ndarray, gt: jnp.ndarray,
                    mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Per-image least-squares s·pred + t alignment to gt in disparity space."""
    if mask is None:
        mask = jnp.ones_like(gt)
    s, t = _lstsq_scale_shift(pred, gt, mask.astype(jnp.float32))
    return pred * s[:, None, None] + t[:, None, None]


def depth_metrics(pred_disp: jnp.ndarray, gt_disp: jnp.ndarray,
                  mask: Optional[jnp.ndarray] = None, align: bool = True,
                  eps: float = 1e-6) -> Dict[str, jnp.ndarray]:
    """Standard depth metrics over (B, H, W) disparity maps.

    Returns per-image means over valid pixels, averaged over the batch —
    each value a f32 scalar. ``align=False`` scores the raw prediction
    (metric-calibrated models); ``align=True`` is the zero-shot protocol.
    """
    if mask is None:
        mask = gt_disp > eps
    mask = mask.astype(jnp.float32)
    if align:
        pred_disp = align_disparity(pred_disp, gt_disp, mask)
    # disparity → depth; clamp so aligned predictions crossing zero stay finite
    pred_d = 1.0 / jnp.maximum(pred_disp, eps)
    gt_d = 1.0 / jnp.maximum(gt_disp, eps)

    n = jnp.maximum(mask.sum(axis=(-2, -1)), 1.0)

    def per_image_mean(x):
        return (x * mask).sum(axis=(-2, -1)) / n

    err = pred_d - gt_d
    abs_rel = per_image_mean(jnp.abs(err) / gt_d)
    sq_rel = per_image_mean(err * err / gt_d)
    rmse = jnp.sqrt(per_image_mean(err * err))
    log_err = jnp.log(pred_d) - jnp.log(gt_d)
    rmse_log = jnp.sqrt(per_image_mean(log_err * log_err))
    log10 = per_image_mean(jnp.abs(log_err) / jnp.log(10.0))
    ratio = jnp.maximum(pred_d / gt_d, gt_d / pred_d)
    d1 = per_image_mean((ratio < 1.25).astype(jnp.float32))
    d2 = per_image_mean((ratio < 1.25 ** 2).astype(jnp.float32))
    d3 = per_image_mean((ratio < 1.25 ** 3).astype(jnp.float32))

    out = (abs_rel, sq_rel, rmse, rmse_log, log10, d1, d2, d3)
    return {k: v.mean() for k, v in zip(METRIC_NAMES, out)}


def evaluate_pairs(apply_fn: Callable, pairs: Iterable[Tuple[np.ndarray, np.ndarray]],
                   batch: int = 8, align: bool = True) -> Dict[str, float]:
    """Score ``apply_fn(imgs_u8) -> (B, H, W) disparity`` over (image, gt)
    pairs; returns image-weighted mean metrics as plain floats.

    ``apply_fn`` takes a raw uint8 batch (the fused-preprocess apply of
    train/data.py::make_training_apply, partially applied with params).
    Batches of equal size share one compiled program; the tail batch
    compiles once more at its own shape (offline eval — acceptable).
    """
    metrics_fn = jax.jit(lambda p, g: depth_metrics(p, g, align=align))
    sums = {k: 0.0 for k in METRIC_NAMES}
    total = 0
    buf_img, buf_gt = [], []

    def flush():
        nonlocal total
        if not buf_img:
            return
        imgs = np.stack(buf_img)
        gts = np.stack(buf_gt)
        pred = apply_fn(imgs)
        m = jax.device_get(metrics_fn(pred, jnp.asarray(gts)))
        for k in METRIC_NAMES:
            sums[k] += float(m[k]) * len(buf_img)
        total += len(buf_img)
        buf_img.clear()
        buf_gt.clear()

    for img, gt in pairs:
        buf_img.append(img)
        buf_gt.append(gt)
        if len(buf_img) == batch:
            flush()
    flush()
    if total == 0:
        raise ValueError("no (image, disparity) pairs to evaluate")
    return {k: sums[k] / total for k in METRIC_NAMES} | {"images": total}
