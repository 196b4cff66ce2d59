"""MiDaS v2.1 small — EfficientNet-Lite3 encoder + feature-fusion decoder.

Behavioral equivalent of the torch.hub ``MiDaS_small`` model the reference
loads at depth_midas.py:10 (MiDaS ``MidasNet_small``: features=64,
expand=True, non_negative=True, align_corners=True). NHWC, inference-first.

Decoder structure:
  layerX_rn : 3x3 conv (bias-free) projecting each encoder tap to
              64/128/256/512 channels
  refinenet4..1 : FeatureFusionBlock — two residual conv units, add skip,
              2x bilinear (align_corners=True) upsample, 1x1 out-projection
              halving channels (except refinenet1)
  head      : conv3x3 64→32 → 2x bilinear (align_corners=False) → conv3x3
              32→32 → ReLU → conv1x1 32→1 → ReLU

Upsampling uses the matmul-based resize (ops/resize.py) so every stage stays
on the MXU; XLA fuses the surrounding elementwise work into the convs.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from depth_estimation_tpu.models.efficientnet_lite import EfficientNetLite3
from depth_estimation_tpu.ops.resize import resize_bilinear, upsample2x_conv3x3


def _upsample2x(x, align_corners: bool):
    h, w = x.shape[-3], x.shape[-2]
    return resize_bilinear(x, (2 * h, 2 * w), align_corners=align_corners)


class UpsampleConv3x3(nn.Module):
    """``conv3x3_SAME(2x bilinear upsample(x))`` with ``nn.Conv``'s param tree.

    The head chain all three families end with, evaluated in the
    MXU-friendly reassociated order (ops/resize.py::upsample2x_conv3x3):
    the channel matmul runs at LOW H with the three kernel rows stacked
    into the lane dim instead of at 4x pixels with 32 lanes. Params are
    byte-identical to ``nn.Conv(features, (3, 3))`` — kernel (3, 3, C, F)
    + bias (F,) — so converters/checkpoints/goldens are untouched.
    """

    features: int
    align_corners: bool = False

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        return upsample2x_conv3x3(x, kernel, bias,
                                  align_corners=self.align_corners)


class ResidualConvUnit(nn.Module):
    """MiDaS ResidualConvUnit_custom (bn=False): relu→conv→relu→conv + x."""

    features: int

    @nn.compact
    def __call__(self, x):
        h = nn.relu(x)
        h = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)), name="conv1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)), name="conv2")(h)
        return h + x


class FeatureFusionBlock(nn.Module):
    """MiDaS FeatureFusionBlock_custom (deconv=False, bn=False)."""

    features: int
    expand: bool = False
    align_corners: bool = True

    @nn.compact
    def __call__(self, x, skip: Optional[jnp.ndarray] = None):
        out_features = self.features // 2 if self.expand else self.features
        h = x
        if skip is not None:
            h = h + ResidualConvUnit(self.features, name="resConfUnit1")(skip)
        h = ResidualConvUnit(self.features, name="resConfUnit2")(h)
        # Reference order is upsample -> out_conv (MiDaS
        # FeatureFusionBlock_custom); a 1x1 conv (channel dim) and the
        # bilinear resize (spatial dims) act on disjoint axes so they
        # commute exactly — applying the conv first runs it on 1/4 the
        # pixels and (when expand) halves the channels the resize touches.
        h = nn.Conv(out_features, (1, 1), name="out_conv")(h)
        h = _upsample2x(h, align_corners=self.align_corners)
        return h


class MidasSmall(nn.Module):
    features: int = 64
    non_negative: bool = True
    align_corners: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, H, W, 3) normalized. Returns (B, H, W) inverse depth."""
        f = self.features
        feats = EfficientNetLite3(name="pretrained")(x)

        rn1 = nn.Conv(f, (3, 3), padding=((1, 1), (1, 1)), use_bias=False, name="layer1_rn")(feats["layer1"])
        rn2 = nn.Conv(f * 2, (3, 3), padding=((1, 1), (1, 1)), use_bias=False, name="layer2_rn")(feats["layer2"])
        rn3 = nn.Conv(f * 4, (3, 3), padding=((1, 1), (1, 1)), use_bias=False, name="layer3_rn")(feats["layer3"])
        rn4 = nn.Conv(f * 8, (3, 3), padding=((1, 1), (1, 1)), use_bias=False, name="layer4_rn")(feats["layer4"])

        p4 = FeatureFusionBlock(f * 8, expand=True, align_corners=self.align_corners, name="refinenet4")(rn4)
        p3 = FeatureFusionBlock(f * 4, expand=True, align_corners=self.align_corners, name="refinenet3")(p4, rn3)
        p2 = FeatureFusionBlock(f * 2, expand=True, align_corners=self.align_corners, name="refinenet2")(p3, rn2)
        p1 = FeatureFusionBlock(f, expand=False, align_corners=self.align_corners, name="refinenet1")(p2, rn1)

        h = nn.Conv(f // 2, (3, 3), padding=((1, 1), (1, 1)), name="output_conv_0")(p1)
        h = UpsampleConv3x3(32, align_corners=False, name="output_conv_2")(h)
        h = nn.relu(h)
        h = nn.Conv(1, (1, 1), name="output_conv_4")(h)
        if self.non_negative:
            h = nn.relu(h)
        return h[..., 0]
