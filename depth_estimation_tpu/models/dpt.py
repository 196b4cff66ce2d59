"""DPT-Large / DPT-Hybrid monocular depth (MiDaS v3), NHWC Flax.

Behavioral equivalent of the torch.hub "DPT_Large" / "DPT_Hybrid" models
(reference loads by name at depth_midas.py:10; selection depth_midas.py:13).

Pipeline: ViT backbone with 4 hooks → per-hook readout-project (concat cls,
linear, GELU) → reassemble to spatial maps at strides 4/8/16/32 → 3×3
projection to 256ch → 4 feature-fusion blocks (residual conv units, ×2
bilinear align_corners=True upsample) → monocular head.

DPT-Large : ViT-L/16, hooks (5,11,17,23), reassemble channels (256,512,1024,1024)
DPT-Hybrid: R50+ViT-B/16 — hooks (0,1) are the ResNetV2 stage-1/2 feature
            maps, hooks (8,11) transformer blocks; channels (256,512,768,768)
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from depth_estimation_tpu.models.midas_small import FeatureFusionBlock, UpsampleConv3x3
from depth_estimation_tpu.models.resnetv2 import ResNetV2Stem
from depth_estimation_tpu.models.vit import ViT


@dataclasses.dataclass(frozen=True)
class DPTConfig:
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    hooks: Tuple[int, ...] = (5, 11, 17, 23)
    reassemble_channels: Tuple[int, ...] = (256, 512, 1024, 1024)
    features: int = 256
    hybrid: bool = False
    img_size: int = 384
    non_negative: bool = True
    # A/B on a real v5e: XLA's fused attention beats the Pallas flash kernel
    # at the 577-token ViT length — flash attention's memory savings buy
    # nothing this short. The Pallas kernel remains for long sequences.
    use_pallas: bool = False
    # Precision of the transformer matmuls (None -> ambient
    # default_matmul_precision, i.e. the estimator's gate-passing 'high').
    dot_precision: object = None
    # Precision of everything AFTER the ViT trunk (readout/reassemble/
    # fusion/head convs). None -> ambient. Split from dot_precision so the
    # accuracy-vs-speed frontier can be explored per-section
    # (tools/precision_bisect.py): the decoder's big fused convs run at
    # high spatial resolution and dominate 'high'-precision cost.
    decoder_precision: object = None
    # Per-block trunk precision overrides (length-``depth`` tuple, None
    # entries → dot_precision → ambient); the finer-grained lever the
    # per-block bisect drives (tools/precision_bisect.py --per-block).
    block_precisions: object = None
    # Optional NamedSharding for the trunk's token activations — sequence
    # parallelism over a mesh 'sp' axis (parallel/mesh.py::seq_sharding).
    act_sharding: object = None
    # Per-block rematerialisation of the ViT trunk for training memory
    # (models/vit.py ``remat``); inference-neutral, param tree unchanged.
    remat: bool = False


DPT_LARGE = DPTConfig()
DPT_HYBRID = DPTConfig(
    embed_dim=768,
    depth=12,
    num_heads=12,
    hooks=(0, 1, 8, 11),
    reassemble_channels=(256, 512, 768, 768),
    hybrid=True,
)


class Readout(nn.Module):
    """ProjectReadout: fold the cls token into every patch token."""

    dim: int

    @nn.compact
    def __call__(self, tokens):
        cls_tok, feat = tokens[:, :1], tokens[:, 1:]
        cat = jnp.concatenate([feat, jnp.broadcast_to(cls_tok, feat.shape)], axis=-1)
        return nn.gelu(nn.Dense(self.dim, name="project")(cat), approximate=False)


class DPT(nn.Module):
    cfg: DPTConfig = DPT_LARGE

    @nn.compact
    def __call__(self, x: jnp.ndarray, hooked=None, grid=None,
                 stem_layers=None) -> jnp.ndarray:
        """x: (B, H, W, 3) normalized, H/W multiples of 32. → (B, H, W).

        ``hooked``/``grid``: externally computed trunk hook activations +
        patch grid (e.g. from the pipeline-parallel trunk,
        parallel/pipeline.py::dpt_apply_pipelined) — the in-module ViT is
        skipped and only the decoder runs. For DPT-Hybrid, ``stem_layers``
        must carry the two externally computed ResNet stage features.
        Init always runs the full model so the param tree is identical
        either way.
        """
        cfg = self.cfg
        C = cfg.embed_dim

        # hook injection never short-circuits init: the full model must run
        # then so the param tree (incl. the ViT trunk) is complete
        if hooked is not None and not self.is_initializing():
            if cfg.hybrid and stem_layers is None:
                raise ValueError("hybrid hook injection needs stem_layers")
            gh, gw = grid
            layers = list(stem_layers) if cfg.hybrid else []
        elif cfg.hybrid:
            stem_feats, stage_outs = ResNetV2Stem(name="resnet_stem")(x)
            token_lists, (gh, gw) = ViT(
                embed_dim=C,
                depth=cfg.depth,
                num_heads=cfg.num_heads,
                img_size=cfg.img_size,
                hooks=tuple(h for h in cfg.hooks if h >= 2),
                use_pallas=cfg.use_pallas,
                dot_precision=cfg.dot_precision,
                block_precisions=cfg.block_precisions,
                remat=cfg.remat,
                name="vit",
            )(x, patches=nn.Conv(C, (1, 1), padding="VALID", name="patch_embed")(stem_feats))
            layers = [stage_outs[0], stage_outs[1]]  # stride 4 / 8 conv features
            hooked = token_lists
        else:
            hooked, (gh, gw) = ViT(
                embed_dim=C,
                depth=cfg.depth,
                num_heads=cfg.num_heads,
                img_size=cfg.img_size,
                hooks=cfg.hooks,
                use_pallas=cfg.use_pallas,
                dot_precision=cfg.dot_precision,
                block_precisions=cfg.block_precisions,
                act_sharding=cfg.act_sharding,
                remat=cfg.remat,
                name="vit",
            )(x)
            layers = []

        # Reassemble transformer hooks into spatial maps (and everything
        # below) optionally at its own matmul precision.
        import contextlib

        import jax

        dec_ctx = (
            jax.default_matmul_precision(cfg.decoder_precision)
            if cfg.decoder_precision is not None
            else contextlib.nullcontext()
        )
        with dec_ctx:
            return self._decode(x, hooked, layers, gh, gw)

    def _decode(self, x, hooked, layers, gh, gw):
        cfg = self.cfg
        C = cfg.embed_dim
        spatial = []
        for idx, tokens in enumerate(hooked):
            i = idx + len(layers)  # position in the 4-level pyramid
            rc = cfg.reassemble_channels[i]
            t = Readout(C, name=f"readout_{i}")(tokens)
            fm = t.reshape(t.shape[0], gh, gw, C)
            fm = nn.Conv(rc, (1, 1), padding="VALID", name=f"project_{i}")(fm)
            if i == 0:  # stride 16 → 4
                fm = nn.ConvTranspose(rc, (4, 4), strides=(4, 4), padding="VALID", name=f"resample_{i}")(fm)
            elif i == 1:  # stride 16 → 8
                fm = nn.ConvTranspose(rc, (2, 2), strides=(2, 2), padding="VALID", name=f"resample_{i}")(fm)
            elif i == 3:  # stride 16 → 32
                fm = nn.Conv(rc, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)), name=f"resample_{i}")(fm)
            spatial.append(fm)
        layers = layers + spatial

        f = cfg.features
        rn = [
            nn.Conv(f, (3, 3), padding=((1, 1), (1, 1)), use_bias=False, name=f"layer{i+1}_rn")(layers[i])
            for i in range(4)
        ]

        p4 = FeatureFusionBlock(f, align_corners=True, name="refinenet4")(rn[3])
        p3 = FeatureFusionBlock(f, align_corners=True, name="refinenet3")(p4, rn[2])
        p2 = FeatureFusionBlock(f, align_corners=True, name="refinenet2")(p3, rn[1])
        p1 = FeatureFusionBlock(f, align_corners=True, name="refinenet1")(p2, rn[0])

        h = nn.Conv(f // 2, (3, 3), padding=((1, 1), (1, 1)), name="output_conv_0")(p1)
        h = UpsampleConv3x3(32, align_corners=True, name="output_conv_2")(h)
        h = nn.relu(h)
        h = nn.Conv(1, (1, 1), padding="VALID", name="output_conv_4")(h)
        if cfg.non_negative:
            h = nn.relu(h)
        return h[..., 0]
