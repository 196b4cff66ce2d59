"""MiDaS v2.1 Large — ResNeXt-101 32x8d WSL encoder + v2.1 fusion decoder.

Behavioral equivalent of the torch.hub ``"MiDaS"`` model the reference can
load at depth_midas.py:10: its model-type dispatch (depth_midas.py:13-16)
special-cases only the two DPT names, so the hub-era ``"MiDaS"`` string —
MidasNet v2.1 Large: ResNeXt-101 32x8d (WSL-pretrained) backbone, 256-wide
feature-fusion decoder, non_negative head — is a valid selection that reaches
the ``small_transform`` branch. NHWC, inference-first.

Architecture (hub MidasNet, features=256):
  encoder  : torchvision-style ResNeXt-101 32x8d — 7x7/2 stem conv + BN +
             3x3/2 maxpool, bottleneck layers (3, 4, 23, 3) with grouped 3x3
             convs (groups=32, width = planes*8/64*32), taps after each layer
             (256/512/1024/2048 ch at strides 4/8/16/32)
  scratch  : layerX_rn 3x3 bias-free convs projecting every tap to 256 ch
  refinenet4..1 : v2.1 FeatureFusionBlock — residual conv units + skip add +
             2x bilinear (align_corners=True); unlike the *_custom blocks of
             MiDaS-small there is NO out-projection conv (channels stay 256)
  head     : conv3x3 256→128 → 2x bilinear (align_corners=False) →
             conv3x3 128→32 → ReLU → conv1x1 32→1 → ReLU

Unlike the TF-SAME geffnet encoder of MiDaS-small, every conv here uses
torch-style symmetric padding, and BN eps is the torch default 1e-5.

Upsampling uses the matmul-based resize (ops/resize.py) so every stage stays
on the MXU; XLA fuses the surrounding elementwise work into the convs.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from depth_estimation_tpu.models.layers import FrozenBatchNorm
from depth_estimation_tpu.models.midas_small import (
    ResidualConvUnit, UpsampleConv3x3, _upsample2x)
from depth_estimation_tpu.ops.pallas.grouped_conv import grouped_conv3x3_pallas

BN_EPS = 1e-5  # torchvision ResNet default (vs 1e-3 in the tf_ encoders)


class BlockDiagGroupedConv(nn.Module):
    """Grouped 3x3 conv computed as ONE dense conv with a block-diagonal kernel.

    XLA's grouped-conv lowering maps each ResNeXt 32x8d group (8 in / 8 out
    channels) to its own tiny matmul and the MXU runs at 0.04-0.22 TFLOP/s
    effective at layer1/layer2 shapes — a dense conv doing 32x the FLOPs at
    full MXU fill measures 8-28x FASTER (tools/grouped_conv_ab.py, real chip;
    BASELINE.md round 3). This module keeps the PARAM exactly as nn.Conv's
    grouped kernel (path ``<name>/kernel``, shape (3, 3, C/G, C) — converter,
    checkpoints, and goldens unchanged) and expands it to the equivalent
    (3, 3, C, C) block-diagonal kernel at trace time. The off-block entries
    are exact zeros, so the result is numerically identical to the grouped
    conv for finite inputs (0-contributions are exact in every precision);
    the expansion itself is a broadcast-multiply XLA fuses into the weight
    load (~2.4-9.4 MB/block at v2.1 shapes — sub-0.1 ms total vs ~13 ms saved).
    """

    width: int
    groups: int
    strides: Tuple[int, int] = (1, 1)

    @nn.compact
    def __call__(self, x):
        g = self.groups
        cg_in = self.width // g  # per-group input channels (kernel I dim)
        cg_out = self.width // g  # per-group output channels
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, cg_in, self.width),
            jnp.float32,
        )
        dtype = jnp.promote_types(x.dtype, kernel.dtype)
        # XLA feature_group_count semantics: output features split into G
        # contiguous blocks; block i reads input block i. Dense equivalent:
        # D[h, w, gi*cg+ci, go*cgo+co] = K[h, w, ci, go*cgo+co] iff gi == go.
        k = kernel.astype(dtype).reshape(3, 3, cg_in, g, cg_out)
        eye = jnp.eye(g, dtype=dtype)
        dense = eye[None, None, :, None, :, None] * k[:, :, None, :, :, :]
        dense = dense.reshape(3, 3, g * cg_in, g * cg_out)
        return jax.lax.conv_general_dilated(
            x.astype(dtype),
            dense,
            self.strides,
            [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class PallasGroupedConv(nn.Module):
    """Grouped 3x3 conv via the Pallas shifted-matmul kernel (stride 1 only).

    Fourth lowering option: ops/pallas/grouped_conv.py keeps the whole
    conv in VMEM — no HBM materialization of im2col patches (the 'batched'
    cost: layer3 moves 2.17 GB/frame, tools/v21_profile.py) and no streamed
    zero-padded dense kernels (the 'dense' cost at layer3). Param identical
    to nn.Conv's grouped kernel. Strided blocks fall back to the im2col
    batched matmul — only the first block of a layer is strided.

    ``precision`` pins the in-kernel dot precision (Mosaic ignores the
    ambient ``jax.default_matmul_precision``): None keeps the kernel's
    conservative dtype default (f32 -> 'highest' 6-pass), "high" gives the
    3-pass f32 mode that matches the rest of the frame program's ambient
    'high' matmuls (VERDICT r3 #3).
    """

    width: int
    groups: int
    strides: Tuple[int, int] = (1, 1)
    precision: str | None = None

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, self.width // self.groups, self.width),
            jnp.float32,
        )
        if self.strides != (1, 1):
            return _batched_matmul_grouped_conv(x, kernel, self.groups,
                                                self.strides)
        return grouped_conv3x3_pallas(
            x, kernel, self.groups,
            precision=self.precision,
            interpret=jax.default_backend() != "tpu",
        )


class BatchedMatmulGroupedConv(nn.Module):
    """Grouped 3x3 conv as an im2col batched matmul (group = batch dim).

    Third lowering option for the ResNeXt conv2s: extract 3x3 patches once,
    then one dot_general with the group as a batch dimension —
    (G, HW, 9·Cg) × (G, 9·Cg, Cg) — so no zero-padded dense kernel streams
    from HBM (the cost that sinks block-diagonal densification at layer3's
    23×37.7 MB, BASELINE.md round 3). Param identical to nn.Conv's grouped
    kernel, same as BlockDiagGroupedConv. Numerics: pure reassociation of
    the same products (im2col + matmul), parity-tested against the grouped
    path in tests/test_midas_v21.py.
    """

    width: int
    groups: int
    strides: Tuple[int, int] = (1, 1)

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, self.width // self.groups, self.width),
            jnp.float32,
        )
        return _batched_matmul_grouped_conv(x, kernel, self.groups,
                                            self.strides)


def _batched_matmul_grouped_conv(x, kernel, g, strides):
    """im2col + group-batched dot_general body shared by the two modules."""
    width = kernel.shape[-1]
    cg = width // g
    dtype = jnp.promote_types(x.dtype, kernel.dtype)
    b = x.shape[0]
    # (B, H', W', C*9) with channel dim ordered (C, KH, KW)
    p = jax.lax.conv_general_dilated_patches(
        x.astype(dtype), (3, 3), strides, [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    ho, wo = p.shape[1], p.shape[2]
    p = p.reshape(b * ho * wo, g, cg, 9)
    p = p.transpose(1, 0, 2, 3).reshape(g, b * ho * wo, cg * 9)
    # kernel (3,3,cg,width): output o = go*cg + co -> (G, cg*9, cg)
    wk = kernel.astype(dtype).reshape(3, 3, cg, g, cg)
    wk = wk.transpose(3, 2, 0, 1, 4).reshape(g, cg * 9, cg)
    y = jax.lax.dot_general(p, wk, (((2,), (1,)), ((0,), (0,))))
    return y.transpose(1, 0, 2).reshape(b, ho, wo, width)


@dataclasses.dataclass(frozen=True)
class MidasV21Config:
    """Full size matches hub MidasNet exactly; tests shrink every axis."""

    depths: Tuple[int, int, int, int] = (3, 4, 23, 3)
    planes: Tuple[int, int, int, int] = (64, 128, 256, 512)
    stem_features: int = 64
    groups: int = 32
    width_per_group: int = 8
    expansion: int = 4
    features: int = 256  # decoder width
    head_features: int = 128
    head_mid: int = 32
    non_negative: bool = True
    # Per-layer lowering of the grouped conv2s: "grouped" (XLA's native
    # lowering), "dense" (BlockDiagGroupedConv), "batched"
    # (BatchedMatmulGroupedConv), "pallas" (PallasGroupedConv),
    # "pallas_high" (PallasGroupedConv with 3-pass f32 in-kernel dots), or
    # "auto"
    # (trace-time dispatch on the activation dtype: bfloat16 -> pallas,
    # float32 -> batched — the measured-best lowering per mode; note
    # pallas_call has no VJP, so bf16 + auto is inference-only).
    # Defaults set by FULL-PROGRAM measurement on the real chip
    # (tools/grouped_conv_ab.py --variants, BASELINE.md): XLA's grouped
    # lowering runs the 8-channel groups at 0.04 TFLOP/s at layer1/2 (dense
    # wins 28x/8x); layer3's dense win evaporates in the full program
    # (23 x 37.7 MB dense kernels stream from HBM); the im2col batched
    # matmul avoids the zero streaming but still moves ~2 GB/frame of
    # patches — at bf16 the Pallas VMEM kernel removes that and wins 1.51x
    # (5.10 -> 3.38 ms), at f32 its 6-pass in-kernel dots give the win back
    # (6.94 -> 7.34 ms); layer4's grouped conv is latency-hidden.
    conv2_impl: Tuple[str, str, str, str] = ("dense", "dense", "auto", "grouped")

    def width(self, planes: int) -> int:
        """Grouped-conv width of a bottleneck (torchvision formula)."""
        return int(planes * self.width_per_group / 64) * self.groups


MIDAS_V21 = MidasV21Config()


class ResNeXtBottleneck(nn.Module):
    """torchvision Bottleneck with grouped 3x3 (stride on conv2, ResNet-B)."""

    width: int
    out_features: int
    strides: int = 1
    groups: int = 32
    downsample: bool = False
    conv2_impl: str = "grouped"

    @nn.compact
    def __call__(self, x):
        s = (self.strides, self.strides)
        if self.downsample:
            sc = nn.Conv(self.out_features, (1, 1), strides=s, use_bias=False,
                         name="downsample_conv")(x)
            sc = FrozenBatchNorm(self.out_features, eps=BN_EPS, name="downsample_bn")(sc)
        else:
            sc = x
        h = nn.Conv(self.width, (1, 1), use_bias=False, name="conv1")(x)
        h = nn.relu(FrozenBatchNorm(self.width, eps=BN_EPS, name="bn1")(h))
        if self.conv2_impl == "dense":
            h = BlockDiagGroupedConv(self.width, self.groups, strides=s,
                                     name="conv2")(h)
        elif self.conv2_impl == "batched":
            h = BatchedMatmulGroupedConv(self.width, self.groups, strides=s,
                                         name="conv2")(h)
        elif self.conv2_impl == "pallas":
            h = PallasGroupedConv(self.width, self.groups, strides=s,
                                  name="conv2")(h)
        elif self.conv2_impl == "pallas_high":
            # f32 Pallas with 3-pass in-kernel dots — same precision tier as
            # the frame program's ambient 'high' matmuls, half the MXU work
            # of the kernel's conservative 'highest' default
            h = PallasGroupedConv(self.width, self.groups, strides=s,
                                  precision="high", name="conv2")(h)
        elif self.conv2_impl == "auto":
            # Measured-best lowering per trace dtype (identical param tree,
            # so the choice is invisible to converters/checkpoints).
            if h.dtype == jnp.bfloat16 and s == (1, 1):
                h = PallasGroupedConv(self.width, self.groups, strides=s,
                                      name="conv2")(h)
            else:
                h = BatchedMatmulGroupedConv(self.width, self.groups,
                                             strides=s, name="conv2")(h)
        elif self.conv2_impl == "grouped":
            h = nn.Conv(self.width, (3, 3), strides=s, padding=((1, 1), (1, 1)),
                        feature_group_count=self.groups, use_bias=False,
                        name="conv2")(h)
        else:
            raise ValueError(f"unknown conv2_impl {self.conv2_impl!r}")
        h = nn.relu(FrozenBatchNorm(self.width, eps=BN_EPS, name="bn2")(h))
        h = nn.Conv(self.out_features, (1, 1), use_bias=False, name="conv3")(h)
        h = FrozenBatchNorm(self.out_features, eps=BN_EPS, name="bn3")(h)
        return nn.relu(h + sc)


class ResNeXt(nn.Module):
    """ResNeXt backbone exposing the four per-layer taps MidasNet consumes."""

    cfg: MidasV21Config = MIDAS_V21

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        x = nn.Conv(cfg.stem_features, (7, 7), strides=(2, 2),
                    padding=((3, 3), (3, 3)), use_bias=False, name="conv1")(x)
        x = nn.relu(FrozenBatchNorm(cfg.stem_features, eps=BN_EPS, name="bn1")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        feats = {}
        for li, (depth, planes) in enumerate(zip(cfg.depths, cfg.planes), start=1):
            out_c = planes * cfg.expansion
            width = cfg.width(planes)
            for bi in range(depth):
                stride = 2 if (li > 1 and bi == 0) else 1
                x = ResNeXtBottleneck(
                    width, out_c, strides=stride, groups=cfg.groups,
                    downsample=(bi == 0), conv2_impl=cfg.conv2_impl[li - 1],
                    name=f"layer{li}_block{bi}",
                )(x)
            feats[f"layer{li}"] = x
        return feats


class FeatureFusionBlockV21(nn.Module):
    """v2.1 FeatureFusionBlock: no out-projection, align_corners=True 2x up."""

    features: int

    @nn.compact
    def __call__(self, x, skip: Optional[jnp.ndarray] = None):
        h = x
        if skip is not None:
            h = h + ResidualConvUnit(self.features, name="resConfUnit1")(skip)
        h = ResidualConvUnit(self.features, name="resConfUnit2")(h)
        return _upsample2x(h, align_corners=True)


class MidasV21(nn.Module):
    cfg: MidasV21Config = MIDAS_V21

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, H, W, 3) normalized, H/W multiples of 32. → (B, H, W)."""
        cfg = self.cfg
        f = cfg.features
        feats = ResNeXt(cfg, name="pretrained")(x)

        rn = [
            nn.Conv(f, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    name=f"layer{i}_rn")(feats[f"layer{i}"])
            for i in (1, 2, 3, 4)
        ]

        p4 = FeatureFusionBlockV21(f, name="refinenet4")(rn[3])
        p3 = FeatureFusionBlockV21(f, name="refinenet3")(p4, rn[2])
        p2 = FeatureFusionBlockV21(f, name="refinenet2")(p3, rn[1])
        p1 = FeatureFusionBlockV21(f, name="refinenet1")(p2, rn[0])

        h = nn.Conv(cfg.head_features, (3, 3), padding=((1, 1), (1, 1)),
                    name="output_conv_0")(p1)
        h = UpsampleConv3x3(cfg.head_mid, align_corners=False,
                            name="output_conv_2")(h)
        h = nn.relu(h)
        h = nn.Conv(1, (1, 1), name="output_conv_4")(h)
        if cfg.non_negative:
            h = nn.relu(h)
        return h[..., 0]
