"""ResNetV2 (BiT-style) stem for the DPT-Hybrid backbone, NHWC Flax.

The "DPT_Hybrid" model (reference name string, depth_midas.py:13) uses the
timm ``vit_base_r50_s16_384`` backbone: a ResNetV2-50 front (weight-
standardized convs + GroupNorm(32) + ReLU, pre-activation bottlenecks,
3 stages of depths (3, 4, 9)) whose stage-1/2 outputs feed the DPT pyramid
directly (hooks 0 and 1) and whose stage-3 output (1024ch, stride 16) is
patch-embedded into the ViT-B/16 trunk.
"""

from __future__ import annotations

from typing import List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class StdConv(nn.Module):
    """Weight-standardized conv (timm StdConv2d, eps=1e-6)."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: object = "SAME"
    use_bias: bool = False
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        in_f = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (kh, kw, in_f, self.features)
        )
        mean = kernel.mean(axis=(0, 1, 2), keepdims=True)
        var = kernel.var(axis=(0, 1, 2), keepdims=True)
        kernel = (kernel - mean) * jax.lax.rsqrt(var + self.eps)
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        y = jax.lax.conv_general_dilated(
            x, kernel, self.strides, pad, dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,))
        return y


class GroupNormRelu(nn.Module):
    num_groups: int = 32

    @nn.compact
    def __call__(self, x):
        return nn.relu(nn.GroupNorm(num_groups=self.num_groups, epsilon=1e-5, name="gn")(x))


class PreActBottleneck(nn.Module):
    out_features: int
    strides: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x):
        mid = self.out_features // 4
        h = GroupNormRelu(name="norm1")(x)
        if self.downsample:
            shortcut = StdConv(self.out_features, (1, 1), strides=(self.strides, self.strides), name="downsample")(h)
        else:
            shortcut = x
        h = StdConv(mid, (1, 1), name="conv1")(h)
        h = GroupNormRelu(name="norm2")(h)
        h = StdConv(mid, (3, 3), strides=(self.strides, self.strides), padding=1, name="conv2")(h)
        h = GroupNormRelu(name="norm3")(h)
        h = StdConv(self.out_features, (1, 1), name="conv3")(h)
        return h + shortcut


class ResNetV2Stem(nn.Module):
    """Stages (3, 4, 9) → returns (stage3 output for patch embed,
    [stage1 (256ch, stride 4), stage2 (512ch, stride 8)])."""

    depths: Tuple[int, int, int] = (3, 4, 9)

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        x = StdConv(64, (7, 7), strides=(2, 2), padding=3, name="stem_conv")(x)
        x = GroupNormRelu(name="stem_norm")(x)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")

        outs = []
        channels = (256, 512, 1024)
        for si, (depth, c) in enumerate(zip(self.depths, channels)):
            for bi in range(depth):
                stride = 2 if (si > 0 and bi == 0) else 1
                x = PreActBottleneck(
                    c,
                    strides=stride,
                    downsample=(bi == 0),
                    name=f"stage{si}_block{bi}",
                )(x)
            outs.append(x)
        return outs[2], [outs[0], outs[1]]
