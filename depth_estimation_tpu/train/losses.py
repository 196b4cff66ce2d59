"""Depth training losses.

The reference does no training (SURVEY.md §5: "weights only"); these are the
standard MiDaS-family objectives so the framework is trainable end-to-end:

* ``ssi_loss`` — scale-and-shift-invariant MAE: per-image least-squares
  (s, t) alignment of the prediction to ground truth in disparity space,
  then trimmed absolute error (MiDaS paper's ρ_ssitrim with trim=0.2).
* ``gradient_matching_loss`` — multi-scale gradient matching regularizer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _lstsq_scale_shift(pred, gt, mask):
    """Closed-form per-image least squares: min_{s,t} ||s·pred + t - gt||²_mask."""
    n = jnp.maximum(mask.sum(axis=(-2, -1)), 1.0)
    sp = (pred * mask).sum(axis=(-2, -1))
    sg = (gt * mask).sum(axis=(-2, -1))
    spp = (pred * pred * mask).sum(axis=(-2, -1))
    spg = (pred * gt * mask).sum(axis=(-2, -1))
    det = spp * n - sp * sp
    det = jnp.where(jnp.abs(det) < 1e-6, 1e-6, det)
    s = (spg * n - sp * sg) / det
    t = (spp * sg - sp * spg) / det
    return s, t


def ssi_loss(pred: jnp.ndarray, gt: jnp.ndarray, mask: jnp.ndarray | None = None, trim: float = 0.2):
    """Scale-shift-invariant trimmed MAE over (B, H, W) disparity maps."""
    if mask is None:
        mask = jnp.ones_like(gt)
    mask = mask.astype(jnp.float32)
    s, t = _lstsq_scale_shift(pred, gt, mask)
    aligned = pred * s[:, None, None] + t[:, None, None]
    err = jnp.abs(aligned - gt) * mask
    if trim > 0:
        # trim the largest `trim` fraction of residuals per image
        b = err.shape[0]
        flat = err.reshape(b, -1)
        k = flat.shape[1]
        cut = jnp.quantile(flat, 1.0 - trim, axis=1, keepdims=True)
        flat = jnp.where(flat <= cut, flat, 0.0)
        denom = jnp.maximum(mask.reshape(b, -1).sum(axis=1) * (1.0 - trim), 1.0)
        return (flat.sum(axis=1) / denom).mean()
    denom = jnp.maximum(mask.sum(axis=(-2, -1)), 1.0)
    return (err.sum(axis=(-2, -1)) / denom).mean()


def gradient_matching_loss(pred: jnp.ndarray, gt: jnp.ndarray, scales: int = 4):
    """Multi-scale gradient matching term (MiDaS R_reg)."""
    total = 0.0
    p, g = pred, gt
    for _ in range(scales):
        diff = p - g
        gx = jnp.abs(diff[..., :, 1:] - diff[..., :, :-1]).mean()
        gy = jnp.abs(diff[..., 1:, :] - diff[..., :-1, :]).mean()
        total = total + gx + gy
        p = p[..., ::2, ::2]
        g = g[..., ::2, ::2]
    return total / scales
