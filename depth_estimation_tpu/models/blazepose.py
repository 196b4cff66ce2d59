"""BlazePose person detector + 33-landmark regressor (N6 in SURVEY.md §2b).

TPU-native equivalent of MediaPipe Pose (``mp.solutions.pose``), whose
landmarks 7/8 (ears) the reference consumes for its head-width fallback
(detectors.py:93-97). Two stages, mirroring the MediaPipe graph:

* ``BlazePoseDetector`` — SSD person/ROI detector on 224×224 input
  (anchors in detect/anchors.py, BLAZEPOSE_DETECTOR config).
* ``BlazePose`` — landmark network on a 256×256 person crop regressing
  33×5 values (x, y in crop pixels, z, visibility, presence) + pose score,
  matching the TFLite output contract (visibility/presence pre-sigmoid).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from depth_estimation_tpu.models.blazeface import BlazeBlock

NUM_LANDMARKS = 33
INPUT_SIZE = 256


class BlazePoseDetector(nn.Module):
    """(B, 224, 224, 3) → (raw_boxes (B, N, 12), raw_scores (B, N)) with
    N = 28²·2 + 14²·2 + 7²·8 = 2352 anchors, 4 box + 4 keypoints × 2."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        h = nn.Conv(24, (5, 5), strides=(2, 2), padding="SAME", name="stem")(x)
        h = nn.relu(h)  # 112
        for i, (wdt, s) in enumerate([(32, 2), (32, 1), (64, 2), (64, 1)]):
            h = BlazeBlock(wdt, strides=s, name=f"block_{i}")(h)
        f28 = h  # (B, 28, 28, 64)
        h = BlazeBlock(96, strides=2, name="block_d14")(f28)
        h = BlazeBlock(96, strides=1, name="block_d14b")(h)
        f14 = h
        h = BlazeBlock(128, strides=2, name="block_d7")(f14)
        h = BlazeBlock(128, strides=1, name="block_d7b")(h)
        f7 = h

        B = x.shape[0]
        heads = [(f28, 2, "28"), (f14, 2, "14"), (f7, 8, "7")]
        scores, boxes = [], []
        for fm, per_cell, tag in heads:
            scores.append(nn.Conv(per_cell, (1, 1), name=f"classifier_{tag}")(fm).reshape(B, -1))
            boxes.append(nn.Conv(per_cell * 12, (1, 1), name=f"regressor_{tag}")(fm).reshape(B, -1, 12))
        return jnp.concatenate(boxes, axis=1), jnp.concatenate(scores, axis=1)


class BlazePose(nn.Module):
    """(B, 256, 256, 3) in [0,1] → (landmarks (B, 33, 5), score (B,))."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        h = nn.Conv(16, (3, 3), strides=(2, 2), padding="SAME", name="stem")(x)
        h = nn.relu(h)  # 128
        plan = [(32, 2), (32, 1), (64, 2), (64, 1), (128, 2), (128, 1), (192, 2), (192, 1)]
        for i, (wdt, s) in enumerate(plan):
            h = BlazeBlock(wdt, strides=s, kernel_size=3, name=f"block_{i}")(h)
        # h: (B, 8, 8, 192)
        feat = h.reshape(h.shape[0], -1)
        lm = nn.Dense(NUM_LANDMARKS * 5, name="landmarks")(feat).reshape(-1, NUM_LANDMARKS, 5)
        scalexy = jnp.asarray([INPUT_SIZE, INPUT_SIZE, INPUT_SIZE, 1.0, 1.0], jnp.float32)
        lm = lm * scalexy
        score = nn.Dense(1, name="pose_flag")(feat)[:, 0]
        return lm, jnp.reciprocal(1.0 + jnp.exp(-score))
