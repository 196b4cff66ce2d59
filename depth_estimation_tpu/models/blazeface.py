"""BlazeFace short-range face detector (N5 in SURVEY.md §2b), NHWC Flax.

TPU-native equivalent of MediaPipe's face_detection_front model (the SSD the
reference drives via ``mp.solutions.face_detection`` at
depth_by_detection.py:24-26). Architecture per the BlazeFace paper
(PAPERS.md: arxiv 1907.05047) and the public TFLite graph: 128×128 input,
5×5 depthwise "BlazeBlocks", dual detection heads on the 16×16 (2 anchors/
cell) and 8×8 (6 anchors/cell) maps → 896 anchors × (1 score + 16 box/
keypoint regressions).

The decode (anchors, sigmoid-with-clip, weighted NMS) lives in
detect/anchors.py and composes with this module inside one jit.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp


class BlazeBlock(nn.Module):
    """5×5 depthwise + 1×1 pointwise with residual (channel-pad / maxpool on
    stride-2), per the BlazeFace paper."""

    out_features: int
    strides: int = 1
    kernel_size: int = 5

    @nn.compact
    def __call__(self, x):
        in_f = x.shape[-1]
        h = nn.Conv(
            in_f,
            (self.kernel_size, self.kernel_size),
            strides=(self.strides, self.strides),
            padding="SAME",
            feature_group_count=in_f,
            name="conv_dw",
        )(x)
        h = nn.Conv(self.out_features, (1, 1), name="conv_pw")(h)
        if self.strides == 2:
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        if self.out_features > in_f:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, self.out_features - in_f)))
        return nn.relu(h + x)


class BlazeFace(nn.Module):
    """Returns (raw_boxes (B, 896, 16), raw_scores (B, 896))."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        # x: (B, 128, 128, 3) in [-1, 1]
        h = nn.Conv(24, (5, 5), strides=(2, 2), padding="SAME", name="stem")(x)
        h = nn.relu(h)
        widths1 = [24, 28, 32, 36, 42, 48, 56, 64, 72, 80, 88]
        stride2_at = {2, 5}
        for i, wdt in enumerate(widths1):
            h = BlazeBlock(wdt, strides=2 if i in stride2_at else 1, name=f"blaze_{i}")(h)
        f16 = h  # (B, 16, 16, 88)
        h2 = f16
        for i, wdt in enumerate([96, 96, 96, 96, 96]):
            h2 = BlazeBlock(wdt, strides=2 if i == 0 else 1, name=f"blaze2_{i}")(h2)
        f8 = h2  # (B, 8, 8, 96)

        B = x.shape[0]
        s16 = nn.Conv(2, (1, 1), name="classifier_16")(f16).reshape(B, -1)
        s8 = nn.Conv(6, (1, 1), name="classifier_8")(f8).reshape(B, -1)
        r16 = nn.Conv(2 * 16, (1, 1), name="regressor_16")(f16).reshape(B, -1, 16)
        r8 = nn.Conv(6 * 16, (1, 1), name="regressor_8")(f8).reshape(B, -1, 16)
        raw_scores = jnp.concatenate([s16, s8], axis=1)  # (B, 896)
        raw_boxes = jnp.concatenate([r16, r8], axis=1)  # (B, 896, 16)
        return raw_boxes, raw_scores
