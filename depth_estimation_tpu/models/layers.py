"""Shared NN building blocks (NHWC, inference-first).

Conventions:
* Layout is NHWC everywhere (TPU-native); the weight converter transposes
  from torch's NCHW/OIHW at load time.
* Convs use TF-style ``SAME`` padding (the MiDaS encoder is
  ``tf_efficientnet_lite3``, which pads TF-SAME; JAX's ``SAME`` matches TF
  exactly) unless an explicit symmetric padding is given (torch decoder convs
  with ``padding=1``).
* BatchNorm is inference-only and stored as plain params
  (scale/bias/mean/var) so the whole model is a single flat param tree —
  XLA folds the affine into the neighbouring conv.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp


def relu6(x):
    return jnp.minimum(jnp.maximum(x, 0.0), 6.0)


class FrozenBatchNorm(nn.Module):
    """Inference batch-norm: y = (x - mean) * rsqrt(var + eps) * scale + bias.

    tf_efficientnet variants use eps=1e-3; torch default is 1e-5.
    """

    features: int
    eps: float = 1e-3

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        inv = jnp.reciprocal(jnp.sqrt(var + self.eps)) * scale
        return x * inv + (bias - mean * inv)


class ConvBnAct(nn.Module):
    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    act: Optional[Callable] = relu6
    groups: int = 1
    bn_eps: float = 1e-3

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features,
            self.kernel_size,
            strides=self.strides,
            padding="SAME",
            feature_group_count=self.groups,
            use_bias=False,
            name="conv",
        )(x)
        x = FrozenBatchNorm(self.features, eps=self.bn_eps, name="bn")(x)
        if self.act is not None:
            x = self.act(x)
        return x


class DepthwiseSeparable(nn.Module):
    """geffnet DepthwiseSeparableConv: dw(k,s)+bn+act → pw 1x1+bn.

    Residual when stride 1 and channels match (not the case in lite3's
    first stage, but implemented for generality).
    """

    out_features: int
    kernel_size: int = 3
    strides: int = 1
    bn_eps: float = 1e-3

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        h = nn.Conv(
            in_features,
            (self.kernel_size, self.kernel_size),
            strides=(self.strides, self.strides),
            padding="SAME",
            feature_group_count=in_features,
            use_bias=False,
            name="conv_dw",
        )(x)
        h = FrozenBatchNorm(in_features, eps=self.bn_eps, name="bn1")(h)
        h = relu6(h)
        h = nn.Conv(self.out_features, (1, 1), use_bias=False, name="conv_pw")(h)
        h = FrozenBatchNorm(self.out_features, eps=self.bn_eps, name="bn2")(h)
        if self.strides == 1 and in_features == self.out_features:
            h = h + x
        return h


class PReLU(nn.Module):
    """Per-channel parametric ReLU — the activation of MediaPipe's landmark
    TFLite graphs (FaceMesh / iris / pose ship PRELU ops with per-channel
    alphas, unlike BlazeFace's plain ReLU). flax's built-in PReLU is a single
    scalar, so this stores one alpha per channel like TFLite does."""

    features: int

    @nn.compact
    def __call__(self, x):
        alpha = self.param(
            "alpha", nn.initializers.constant(0.25), (self.features,)
        )
        return jnp.where(x >= 0, x, alpha * x)


class MPBlock(nn.Module):
    """MediaPipe landmark-net residual block: 3×3 depthwise + 1×1 pointwise,
    residual with max-pool (stride 2) and zero channel-pad, PReLU output.

    This is the block the public FaceMesh/iris TFLite graphs are built from
    (DEPTHWISE_CONV_2D → CONV_2D → ADD → PRELU op quadruple); BlazeBlock in
    models/blazeface.py is the same shape with ReLU (the BlazeFace paper's
    block). Channel counts/strides are per-model (models/facemesh.py).
    """

    out_features: int
    strides: int = 1
    kernel_size: int = 3

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
        return PReLU(self.out_features, name="act")(h + x)


class InvertedResidual(nn.Module):
    """geffnet InvertedResidual (MBConv, no SE in lite variants):
    pw-expand 1x1+bn+act → dw kxk(s)+bn+act → pw-project 1x1+bn (+residual).
    """

    out_features: int
    kernel_size: int = 3
    strides: int = 1
    expand_ratio: int = 6
    bn_eps: float = 1e-3

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        mid = in_features * self.expand_ratio
        h = nn.Conv(mid, (1, 1), use_bias=False, name="conv_pw")(x)
        h = FrozenBatchNorm(mid, eps=self.bn_eps, name="bn1")(h)
        h = relu6(h)
        h = nn.Conv(
            mid,
            (self.kernel_size, self.kernel_size),
            strides=(self.strides, self.strides),
            padding="SAME",
            feature_group_count=mid,
            use_bias=False,
            name="conv_dw",
        )(h)
        h = FrozenBatchNorm(mid, eps=self.bn_eps, name="bn2")(h)
        h = relu6(h)
        h = nn.Conv(self.out_features, (1, 1), use_bias=False, name="conv_pwl")(h)
        h = FrozenBatchNorm(self.out_features, eps=self.bn_eps, name="bn3")(h)
        if self.strides == 1 and in_features == self.out_features:
            h = h + x
        return h
