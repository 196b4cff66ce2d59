"""Single-dispatch fused frame program: depth + face detection together.

The reference's fused loop (midas_mediapipe.py:32-129) runs detection and
depth as separate stages with host work between them; our first cut kept
that staging (three jit dispatches per frame). This module compiles ONE XLA
program per source resolution that computes

  depth map (full frame)  +  BlazeFace boxes/scores (decoded, NMS'd)

from a single uint8 frame already resident on device — the detect-then-
reduce design of the BASELINE north star. The FaceMesh landmark stage still
runs as a second dispatch only when a face was actually found (its crop
depends on the detection result).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from depth_estimation_tpu.detect.anchors import (
    BLAZEFACE_FRONT,
    build_anchors,
    decode_boxes,
    decode_scores,
    weighted_nms,
)
from depth_estimation_tpu.ops.preprocess import compute_resize_shape
from depth_estimation_tpu.ops.resize import resize2d


def make_fused_frame_fn(estimator, detector, in_hw: Tuple[int, int]):
    """Returns fn(depth_params, face_params, img_u8) ->
    (depth (H, W) f32, boxes (M, 16), scores (M,), valid (M,))."""
    cfg = estimator.preprocess_cfg
    net_hw = compute_resize_shape(*in_hw, cfg)
    mean = jnp.asarray(cfg.mean, jnp.float32)
    std = jnp.asarray(cfg.std, jnp.float32)
    model = estimator.model
    dtype = estimator.dtype
    face_model = detector._face_det
    anchors = jnp.asarray(build_anchors(BLAZEFACE_FRONT))
    thresh = detector.minDetectionCon

    precision = getattr(estimator, "matmul_precision", "high")

    @jax.jit
    def fused(depth_params, face_params, img_u8):
      with jax.default_matmul_precision(precision):
        rgb = img_u8[..., ::-1].astype(jnp.float32) / 255.0

        # depth branch
        x = resize2d(rgb, net_hw, method="cubic", align_corners=False)
        x = ((x - mean) / std).astype(dtype)
        pred = model.apply(depth_params, x[None]).astype(jnp.float32)
        depth = resize2d(pred[0], in_hw, method="cubic", align_corners=False)

        # detection branch (shares the rgb f32 conversion)
        d = resize2d(rgb * 2.0 - 1.0, (128, 128), method="linear", align_corners=False)
        raw_boxes, raw_scores = face_model.apply(face_params, d[None])
        boxes = decode_boxes(raw_boxes[0], anchors, 128.0)
        scores = decode_scores(raw_scores[0])
        boxes, scores, valid = weighted_nms(boxes, scores, iou_threshold=0.3, score_threshold=thresh)
        return depth, boxes, scores, valid  # noqa: E501  (indented under precision ctx)

    return fused


class FusedFrameRunner:
    """Caches the fused program per source resolution; one dispatch/frame."""

    def __init__(self, estimator, detector):
        self.estimator = estimator
        self.detector = detector
        self._cache = {}

    def __call__(self, img_u8):
        key = img_u8.shape[:2]
        fn = self._cache.get(key)
        if fn is None:
            fn = make_fused_frame_fn(self.estimator, self.detector, key)
            self._cache[key] = fn
        return fn(self.estimator.params, self.detector._face_det_params, img_u8)
