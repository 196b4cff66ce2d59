"""BlazePose person detector + 33-landmark regressor (N6 in SURVEY.md §2b).

TPU-native equivalent of MediaPipe Pose (``mp.solutions.pose``), whose
landmarks 7/8 (ears) the reference consumes for its head-width fallback
(detectors.py:93-97). Two stages, mirroring the MediaPipe graph:

* ``BlazePoseDetector`` — the ``pose_detection.tflite`` SSD on 224×224
  input with the REAL anchor configuration: strides (8, 16, 32, 32, 32)
  with aspect 1.0 and interpolated scale → 28²·2 + 14²·2 + 7²·6 = **2254**
  anchors (MediaPipe pose_detection_cpu.pbtxt SsdAnchorsCalculator), each
  regressing 12 values (4 box + 4 alignment keypoints × 2: hip centre,
  full-body ROI centre/scale/rotation points).
* ``BlazePose`` — the landmark network on a 256×256 person crop, built as
  the paper describes (BlazePose, arXiv 2006.10204 fig. 4): a conv encoder
  with a **heatmap branch** decoded back to 64×64×39 via skip connections
  (training-time supervision; also exported by the public
  pose_landmark_*.tflite as Identity_3) and a **regression branch** that
  descends to 1×1 and emits 39×5 screen landmarks (x, y in crop pixels,
  z, visibility, presence — vis/presence as raw logits, matching the
  TFLite Identity output), a pose-presence flag, and 39×3 world landmarks
  (Identity_4). The public 33-landmark contract slices the first 33 rows
  (the remaining 6 are auxiliary alignment points).

Activations are per-channel PReLU as in the shipped TFLite graphs. The
structural converter (utils/convert.py) populates these modules from the
real .tflite op streams and shape-checks every layer.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from depth_estimation_tpu.models.layers import MPBlock, PReLU

NUM_LANDMARKS = 33
NUM_RAW_LANDMARKS = 39  # 33 + 6 auxiliary alignment landmarks
INPUT_SIZE = 256
DETECTOR_INPUT_SIZE = 224
HEATMAP_SIZE = 64


class BlazePoseDetector(nn.Module):
    """(B, 224, 224, 3) in [-1, 1] → (raw_boxes (B, 2254, 12),
    raw_scores (B, 2254))."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        h = nn.Conv(24, (5, 5), strides=(2, 2), padding="SAME", name="stem")(x)
        h = PReLU(24, name="stem_act")(h)  # 112
        for i in range(2):
            h = MPBlock(24, name=f"b112_{i}")(h)
        h = MPBlock(48, strides=2, name="down56")(h)  # 56
        for i in range(3):
            h = MPBlock(48, name=f"b56_{i}")(h)
        h = MPBlock(96, strides=2, name="down28")(h)  # 28
        for i in range(3):
            h = MPBlock(96, name=f"b28_{i}")(h)
        f28 = h
        h = MPBlock(96, strides=2, name="down14")(f28)  # 14
        for i in range(3):
            h = MPBlock(96, name=f"b14_{i}")(h)
        f14 = h
        h = MPBlock(96, strides=2, name="down7")(f14)  # 7
        for i in range(3):
            h = MPBlock(96, name=f"b7_{i}")(h)
        f7 = h

        B = x.shape[0]
        # anchors per cell: 2 at stride 8 and 16; 6 at the three stride-32
        # layers sharing the 7×7 grid (28²·2 + 14²·2 + 7²·6 = 2254)
        heads = [(f28, 2, "28"), (f14, 2, "14"), (f7, 6, "7")]
        scores, boxes = [], []
        for fm, per_cell, tag in heads:
            scores.append(
                nn.Conv(per_cell, (1, 1), name=f"classifier_{tag}")(fm).reshape(B, -1)
            )
            boxes.append(
                nn.Conv(per_cell * 12, (1, 1), name=f"regressor_{tag}")(fm).reshape(B, -1, 12)
            )
        return jnp.concatenate(boxes, axis=1), jnp.concatenate(scores, axis=1)


class BlazePose(nn.Module):
    """(B, 256, 256, 3) in [0, 1] → (landmarks (B, 33, 5), score (B,)).

    Landmarks are (x, y in crop pixels, z, visibility, presence) with
    visibility/presence as raw logits — the TFLite output contract.
    ``return_full=True`` additionally returns the raw 39×5 landmarks, the
    64×64×39 heatmap and the 39×3 world landmarks.
    """

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_full: bool = False):
        h = nn.Conv(16, (3, 3), strides=(2, 2), padding="SAME", name="stem")(x)
        h = PReLU(16, name="stem_act")(h)  # 128
        h = MPBlock(16, name="b128_0")(h)
        h = MPBlock(32, strides=2, name="down64")(h)  # 64 (stride 4)
        for i in range(2):
            h = MPBlock(32, name=f"b64_{i}")(h)
        f64 = h
        h = MPBlock(64, strides=2, name="down32")(f64)  # 32
        for i in range(2):
            h = MPBlock(64, name=f"b32_{i}")(h)
        f32 = h
        h = MPBlock(128, strides=2, name="down16")(f32)  # 16
        for i in range(2):
            h = MPBlock(128, name=f"b16_{i}")(h)
        f16 = h
        h = MPBlock(192, strides=2, name="down8")(f16)  # 8
        for i in range(2):
            h = MPBlock(192, name=f"b8_{i}")(h)
        f8 = h

        # -- heatmap branch: decode f8 back to 64×64 with skips (paper fig.4)
        def up2(t):
            bh, hh, ww, cc = t.shape
            t = jnp.broadcast_to(t[:, :, None, :, None, :], (bh, hh, 2, ww, 2, cc))
            return t.reshape(bh, hh * 2, ww * 2, cc)

        d = nn.Conv(128, (1, 1), name="hm_lat8")(f8)
        d = up2(d) + nn.Conv(128, (1, 1), name="hm_lat16")(f16)  # 16
        d = MPBlock(128, name="hm_b16")(d)
        d = nn.Conv(64, (1, 1), name="hm_proj32")(d)
        d = up2(d) + nn.Conv(64, (1, 1), name="hm_lat32")(f32)  # 32
        d = MPBlock(64, name="hm_b32")(d)
        d = nn.Conv(32, (1, 1), name="hm_proj64")(d)
        d = up2(d) + nn.Conv(32, (1, 1), name="hm_lat64")(f64)  # 64
        d = MPBlock(32, name="hm_b64")(d)
        heatmap = nn.Conv(NUM_RAW_LANDMARKS, (3, 3), padding="SAME", name="hm_out")(d)

        # -- regression branch: descend to 1×1
        r = MPBlock(256, strides=2, name="reg_down4")(f8)  # 4
        r = MPBlock(256, name="reg_b4")(r)
        r = MPBlock(288, strides=2, name="reg_down2")(r)  # 2
        r = MPBlock(288, name="reg_b2")(r)
        r = nn.Conv(288, (2, 2), padding="VALID", name="reg_out")(r)
        r = PReLU(288, name="reg_out_act")(r)
        feat = r.reshape(r.shape[0], -1)  # (B, 288)

        ld = nn.Dense(NUM_RAW_LANDMARKS * 5, name="ld_3d")(feat)
        ld = ld.reshape(-1, NUM_RAW_LANDMARKS, 5)
        world = nn.Dense(NUM_RAW_LANDMARKS * 3, name="world_3d")(feat)
        world = world.reshape(-1, NUM_RAW_LANDMARKS, 3)
        flag = nn.Dense(1, name="pose_flag")(feat)[:, 0]
        score = jnp.reciprocal(1.0 + jnp.exp(-flag))

        lm33 = ld[:, :NUM_LANDMARKS]
        if return_full:
            return lm33, score, {"ld_raw": ld, "heatmap": heatmap, "world": world}
        return lm33, score
