"""Minimum enclosing circle (cv2.minEnclosingCircle equivalent, N9).

The reference fits circles to the 4 iris landmarks per eye
(detectors.py:63-64). Two implementations:

* ``min_enclosing_circle`` — exact host-side solver for small point sets
  (candidate enumeration over all pairs/triples; equivalent to Welzl for the
  ≤16-point sets used here).
* ``min_enclosing_circle_jax`` — the same enumeration vectorized in jax so a
  fused on-device pipeline can produce iris center/radius without a host
  round-trip (SURVEY.md N4: "iris circle fit as on-device reduce").
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np

_EPS = 1e-9


def _circumcircle(p1, p2, p3):
    ax, ay = p1
    bx, by = p2
    cx, cy = p3
    d = 2.0 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
    if abs(d) < _EPS:
        return None
    ux = ((ax * ax + ay * ay) * (by - cy) + (bx * bx + by * by) * (cy - ay) + (cx * cx + cy * cy) * (ay - by)) / d
    uy = ((ax * ax + ay * ay) * (cx - bx) + (bx * bx + by * by) * (ax - cx) + (cx * cx + cy * cy) * (bx - ax)) / d
    r = float(np.hypot(ax - ux, ay - uy))
    return (float(ux), float(uy)), r


def min_enclosing_circle(points: Sequence[Sequence[float]]) -> Tuple[Tuple[float, float], float]:
    """Exact minimum enclosing circle of ≤ a few dozen 2D points."""
    pts = np.asarray(points, dtype=np.float64).reshape(-1, 2)
    n = len(pts)
    if n == 0:
        raise ValueError("need at least one point")
    if n == 1:
        return (float(pts[0, 0]), float(pts[0, 1])), 0.0

    best: Tuple[Tuple[float, float], float] | None = None

    def contains_all(c, r):
        return np.all(np.hypot(pts[:, 0] - c[0], pts[:, 1] - c[1]) <= r + 1e-7)

    for i in range(n):
        for j in range(i + 1, n):
            c = ((pts[i, 0] + pts[j, 0]) / 2, (pts[i, 1] + pts[j, 1]) / 2)
            r = float(np.hypot(pts[i, 0] - pts[j, 0], pts[i, 1] - pts[j, 1]) / 2)
            if contains_all(c, r) and (best is None or r < best[1]):
                best = (c, r)
    if best is None:
        for i in range(n):
            for j in range(i + 1, n):
                for k in range(j + 1, n):
                    cc = _circumcircle(pts[i], pts[j], pts[k])
                    if cc is None:
                        continue
                    c, r = cc
                    if contains_all(c, r) and (best is None or r < best[1]):
                        best = (c, r)
    assert best is not None
    (cx, cy), r = best
    return (cx, cy), r


def min_enclosing_circle_jax(points: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Vectorized exact MEC for a fixed small N (e.g. the 4 iris points).

    points: (N, 2) float. Returns (center (2,), radius ()). Enumerates all
    pair-diameter and triple-circumcircle candidates, masks those that don't
    contain every point, and takes the min-radius survivor — branch-free,
    fully on-device.
    """
    pts = points.astype(jnp.float32)
    n = pts.shape[0]
    ii, jj = jnp.triu_indices(n, k=1)
    # pair candidates
    pc = (pts[ii] + pts[jj]) / 2.0
    pr = jnp.linalg.norm(pts[ii] - pts[jj], axis=-1) / 2.0

    # triple candidates
    tri = [(i, j, k) for i in range(n) for j in range(i + 1, n) for k in range(j + 1, n)]
    if tri:
        ti = jnp.asarray([t[0] for t in tri])
        tj = jnp.asarray([t[1] for t in tri])
        tk = jnp.asarray([t[2] for t in tri])
        a, b, c = pts[ti], pts[tj], pts[tk]
        d = 2.0 * (a[:, 0] * (b[:, 1] - c[:, 1]) + b[:, 0] * (c[:, 1] - a[:, 1]) + c[:, 0] * (a[:, 1] - b[:, 1]))
        d_safe = jnp.where(jnp.abs(d) < _EPS, 1.0, d)
        a2 = jnp.sum(a * a, axis=-1)
        b2 = jnp.sum(b * b, axis=-1)
        c2 = jnp.sum(c * c, axis=-1)
        ux = (a2 * (b[:, 1] - c[:, 1]) + b2 * (c[:, 1] - a[:, 1]) + c2 * (a[:, 1] - b[:, 1])) / d_safe
        uy = (a2 * (c[:, 0] - b[:, 0]) + b2 * (a[:, 0] - c[:, 0]) + c2 * (b[:, 0] - a[:, 0])) / d_safe
        tc = jnp.stack([ux, uy], axis=-1)
        tr = jnp.linalg.norm(a - tc, axis=-1)
        tr = jnp.where(jnp.abs(d) < _EPS, jnp.inf, tr)
        centers = jnp.concatenate([pc, tc], axis=0)
        radii = jnp.concatenate([pr, tr], axis=0)
    else:
        centers, radii = pc, pr

    dist = jnp.linalg.norm(centers[:, None, :] - pts[None, :, :], axis=-1)
    # f32-scale-aware containment: on-circle points land within ~1e-4·r
    valid = jnp.all(dist <= radii[:, None] * (1.0 + 1e-4) + 1e-5, axis=1)
    radii = jnp.where(valid, radii, jnp.inf)
    best = jnp.argmin(radii)
    return centers[best], radii[best]
