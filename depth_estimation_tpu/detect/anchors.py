"""SSD anchors, box decoding and NMS for the BlazeFace/BlazePose detectors.

Equivalents of MediaPipe's SsdAnchorsCalculator + TensorsToDetections +
(weighted) NMS calculators (N5 in SURVEY.md §2b) — everything is expressed
as fixed-shape array ops so the whole detect-then-reduce chain can run
inside one XLA program on TPU (no host round-trips, per the BASELINE north
star). NMS over a fixed anchor count is an O(N²) masked matrix computation —
tiny for N=896 and MXU/VPU-friendly, unlike the sequential host NMS the
C++ stack uses.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class AnchorConfig:
    input_size: int = 128
    # (feature_map_size, anchors_per_cell) per detection head
    heads: Tuple[Tuple[int, int], ...] = ((16, 2), (8, 6))


BLAZEFACE_FRONT = AnchorConfig()
# pose_detection_cpu.pbtxt SsdAnchorsCalculator: strides (8, 16, 32, 32, 32),
# aspect 1.0 + interpolated scale → 2 anchors/cell at strides 8 and 16, and
# 6/cell on the 7×7 grid the three stride-32 layers share:
# 28²·2 + 14²·2 + 7²·6 = 2254 anchors
BLAZEPOSE_DETECTOR = AnchorConfig(input_size=224, heads=((28, 2), (14, 2), (7, 6)))


def build_anchors(cfg: AnchorConfig) -> np.ndarray:
    """(N, 4) anchors as (x_center, y_center, w, h) in [0,1] units.

    MediaPipe's front-camera configs collapse to unit-size anchors at cell
    centers (fixed_anchor_size=true), which is what the decode consumes.
    """
    anchors = []
    for fm, per_cell in cfg.heads:
        for y in range(fm):
            for x in range(fm):
                cx = (x + 0.5) / fm
                cy = (y + 0.5) / fm
                for _ in range(per_cell):
                    anchors.append((cx, cy, 1.0, 1.0))
    return np.asarray(anchors, dtype=np.float32)


def decode_boxes(raw: jnp.ndarray, anchors: jnp.ndarray, scale: float) -> jnp.ndarray:
    """Raw SSD regressions → boxes+keypoints in [0,1] image units.

    raw: (..., N, 16) = (dx, dy, w, h, 6 keypoints × (x, y)); MediaPipe
    decode with x/y/w/h_scale = input_size and unit anchors.
    Returns same shape with (ymin, xmin, ymax, xmax, kpts...).
    """
    ax, ay, aw, ah = anchors[..., 0], anchors[..., 1], anchors[..., 2], anchors[..., 3]
    cx = raw[..., 0] / scale * aw + ax
    cy = raw[..., 1] / scale * ah + ay
    w = raw[..., 2] / scale * aw
    h = raw[..., 3] / scale * ah
    ymin = cy - h / 2.0
    xmin = cx - w / 2.0
    ymax = cy + h / 2.0
    xmax = cx + w / 2.0
    n_kp = (raw.shape[-1] - 4) // 2
    kps = []
    for k in range(n_kp):
        kx = raw[..., 4 + 2 * k] / scale * aw + ax
        ky = raw[..., 4 + 2 * k + 1] / scale * ah + ay
        kps.extend([kx, ky])
    return jnp.stack([ymin, xmin, ymax, xmax, *kps], axis=-1)


def decode_scores(logits: jnp.ndarray, clip: float = 100.0) -> jnp.ndarray:
    """MediaPipe clips logits to ±100 before the sigmoid."""
    return jnp.reciprocal(1.0 + jnp.exp(-jnp.clip(logits, -clip, clip)))


def _iou_matrix(boxes: jnp.ndarray) -> jnp.ndarray:
    """(N, N) pairwise IoU for (ymin, xmin, ymax, xmax) boxes."""
    ymin, xmin, ymax, xmax = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = jnp.maximum(ymax - ymin, 0) * jnp.maximum(xmax - xmin, 0)
    iy = jnp.maximum(
        jnp.minimum(ymax[:, None], ymax[None, :]) - jnp.maximum(ymin[:, None], ymin[None, :]), 0
    )
    ix = jnp.maximum(
        jnp.minimum(xmax[:, None], xmax[None, :]) - jnp.maximum(xmin[:, None], xmin[None, :]), 0
    )
    inter = iy * ix
    union = area[:, None] + area[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float = 0.3,
    score_threshold: float = 0.5,
    max_outputs: int = 16,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Hard NMS over a fixed anchor set, branch-free.

    Returns (boxes (M, D), scores (M,), valid (M,) bool) with M=max_outputs;
    invalid slots are zero-score. Runs as masked matrix ops inside jit.
    """
    score_mask = scores >= score_threshold
    s = jnp.where(score_mask, scores, -1.0)
    iou = _iou_matrix(boxes)
    # suppressed[i] if some higher-scoring j overlaps i beyond threshold
    higher = (s[None, :] > s[:, None]) | ((s[None, :] == s[:, None]) & (jnp.arange(s.shape[0])[None, :] < jnp.arange(s.shape[0])[:, None]))
    suppressed = jnp.any((iou > iou_threshold) & higher & score_mask[None, :], axis=1)
    keep = score_mask & ~suppressed
    s_kept = jnp.where(keep, scores, -1.0)
    order = jnp.argsort(-s_kept)[:max_outputs]
    return boxes[order], jnp.maximum(s_kept[order], 0.0), s_kept[order] > 0


def weighted_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float = 0.3,
    score_threshold: float = 0.5,
    max_outputs: int = 16,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """MediaPipe-style blending NMS: each kept detection is the score-weighted
    average of all candidates overlapping it above the IoU threshold."""
    kept_boxes, kept_scores, valid = nms(boxes, scores, iou_threshold, score_threshold, max_outputs)
    cand_mask = scores >= score_threshold
    for_blend = jnp.where(cand_mask, scores, 0.0)
    # IoU of kept boxes vs all candidates
    ymin, xmin, ymax, xmax = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    kymin, kxmin, kymax, kxmax = (kept_boxes[:, i] for i in range(4))
    iy = jnp.maximum(jnp.minimum(kymax[:, None], ymax[None, :]) - jnp.maximum(kymin[:, None], ymin[None, :]), 0)
    ix = jnp.maximum(jnp.minimum(kxmax[:, None], xmax[None, :]) - jnp.maximum(kxmin[:, None], xmin[None, :]), 0)
    inter = iy * ix
    karea = jnp.maximum(kymax - kymin, 0) * jnp.maximum(kxmax - kxmin, 0)
    area = jnp.maximum(ymax - ymin, 0) * jnp.maximum(xmax - xmin, 0)
    iou = inter / jnp.maximum(karea[:, None] + area[None, :] - inter, 1e-9)
    w = jnp.where(iou > iou_threshold, for_blend[None, :], 0.0)  # (M, N)
    wsum = jnp.maximum(w.sum(axis=1, keepdims=True), 1e-9)
    blended = (w @ boxes) / wsum
    out_boxes = jnp.where(valid[:, None], blended, 0.0)
    return out_boxes, kept_scores, valid
