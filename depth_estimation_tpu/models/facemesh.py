"""FaceMesh landmark regressor with iris refinement (N4 in SURVEY.md §2b).

TPU-native equivalent of MediaPipe's FaceMesh(refine_landmarks=True) — the
478-landmark model whose iris points (indices 468-477) the reference consumes
at detectors.py:19-20. Takes a 192×192 face crop and regresses 478×3
landmark coordinates (x, y in crop pixels, z relative) plus a face-presence
score, mirroring the TFLite graph's output contract.

Backbone: depthwise-separable conv pyramid (BlazeBlock family) down to 6×6,
then dense heads. Landmark projection back to full-image coordinates is in
detect/person_detector.py.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from depth_estimation_tpu.models.blazeface import BlazeBlock

NUM_LANDMARKS = 478  # 468 mesh + 10 iris refinement points
INPUT_SIZE = 192


class FaceMesh(nn.Module):
    """(B, 192, 192, 3) in [0,1] → (landmarks (B, 478, 3), score (B,))."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        h = nn.Conv(16, (3, 3), strides=(2, 2), padding="SAME", name="stem")(x)
        h = nn.relu(h)  # 96
        plan = [(32, 2), (32, 1), (64, 2), (64, 1), (128, 2), (128, 1), (128, 2), (128, 1)]
        for i, (wdt, s) in enumerate(plan):
            h = BlazeBlock(wdt, strides=s, kernel_size=3, name=f"block_{i}")(h)
        # h: (B, 6, 6, 128)
        feat = h.reshape(h.shape[0], -1)
        lm = nn.Dense(NUM_LANDMARKS * 3, name="landmarks")(feat)
        lm = lm.reshape(-1, NUM_LANDMARKS, 3)
        # raw coords are in crop-pixel units like the TFLite model
        lm = lm * jnp.asarray([INPUT_SIZE, INPUT_SIZE, INPUT_SIZE], jnp.float32)
        score = nn.Dense(1, name="face_flag")(feat)[:, 0]
        return lm, jnp.reciprocal(1.0 + jnp.exp(-score))
