"""ResNetV2 (BiT-style) stem for the DPT-Hybrid backbone, NHWC Flax.

The "DPT_Hybrid" model (reference name string, depth_midas.py:13) uses the
timm ``vit_base_r50_s16_384`` backbone: ResNetV2 with layers (3, 4, 9),
``preact=False``, 'same' stem — i.e. weight-standardized convs with TF-SAME
padding, GroupNorm(32)+ReLU *after* each conv, non-preact bottlenecks with a
conv+norm downsample branch and post-add ReLU. Stage-1/2 outputs feed the
DPT pyramid (hooks 0, 1); the stage-3 output (1024ch, stride 16) is
patch-embedded into the ViT-B trunk.
"""

from __future__ import annotations

from typing import List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class StdConv(nn.Module):
    """Weight-standardized conv (timm StdConv2dSame, eps=1e-6), TF-SAME pad."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
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
        y = jax.lax.conv_general_dilated(
            x, kernel, self.strides, "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,))
        return y


class GroupNormAct(nn.Module):
    """timm GroupNormAct: GN(32) with optional fused ReLU."""

    num_groups: int = 32
    act: bool = True

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(num_groups=self.num_groups, epsilon=1e-5, name="gn")(x)
        return nn.relu(h) if self.act else h


class Bottleneck(nn.Module):
    """Non-preact ResNetV2 bottleneck (timm, as used by vit_base_r50_s16)."""

    out_features: int
    strides: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x):
        mid = self.out_features // 4
        if self.downsample:
            shortcut = StdConv(self.out_features, (1, 1), strides=(self.strides, self.strides), name="downsample_conv")(x)
            shortcut = GroupNormAct(act=False, name="downsample_norm")(shortcut)
        else:
            shortcut = x
        h = StdConv(mid, (1, 1), name="conv1")(x)
        h = GroupNormAct(name="norm1")(h)
        h = StdConv(mid, (3, 3), strides=(self.strides, self.strides), name="conv2")(h)
        h = GroupNormAct(name="norm2")(h)
        h = StdConv(self.out_features, (1, 1), name="conv3")(h)
        h = GroupNormAct(act=False, name="norm3")(h)
        return nn.relu(h + shortcut)


class ResNetV2Stem(nn.Module):
    """Stages (3, 4, 9) → (stage3 output for the patch embed,
    [stage1 (256ch, stride 4), stage2 (512ch, stride 8)]).

    ``depths`` may be truncated to a prefix — e.g. ``(3,)`` or ``(3, 4)`` —
    in which case the return is (last built stage's output, [earlier
    stages]); block naming is depth-independent so truncated stems reuse
    the full param tree (tools/dpt_profile.py prefix programs).
    """

    depths: Tuple[int, ...] = (3, 4, 9)

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        x = StdConv(64, (7, 7), strides=(2, 2), name="stem_conv")(x)
        x = GroupNormAct(name="stem_norm")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")

        outs = []
        channels = (256, 512, 1024)
        for si, (depth, c) in enumerate(zip(self.depths, channels)):
            for bi in range(depth):
                stride = 2 if (si > 0 and bi == 0) else 1
                x = Bottleneck(
                    c, strides=stride, downsample=(bi == 0), name=f"stage{si}_block{bi}"
                )(x)
            outs.append(x)
        # outs[-1] == outs[2] at the default depths; the general form lets
        # truncated stems (tools/dpt_profile.py prefix programs) reuse the
        # full param tree — block naming is depth-independent.
        return outs[-1], list(outs[:-1])
