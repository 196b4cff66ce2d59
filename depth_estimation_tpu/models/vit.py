"""ViT backbone for DPT (vit_large_patch16_384 / vit_base-hybrid), NHWC Flax.

The DPT depth nets the reference loads by name ("DPT_Large"/"DPT_Hybrid",
depth_midas.py:13) are timm ViTs with activation hooks at 4 depths
(SURVEY.md N2). This module implements the transformer trunk with:

* patch embedding as a strided conv (16×16/16),
* learned cls token + position embedding with bilinear grid interpolation
  for non-384 inputs (DPT ``_resize_pos_embed`` semantics),
* pre-LN blocks (LN eps 1e-6, qkv-bias attention, GELU MLP),
* hook outputs returned for the requested block indices (token tensors,
  pre-final-norm — exactly what DPT's Reassemble stage consumes),
* attention through the Pallas flash kernel on TPU
  (ops/pallas/attention.py), XLA fallback elsewhere.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from depth_estimation_tpu.ops.pallas.attention import multi_head_attention
from depth_estimation_tpu.ops.resize import resize_bilinear


class Attention(nn.Module):
    dim: int
    num_heads: int
    use_pallas: bool = True
    dot_precision: object = None  # None -> ambient default_matmul_precision

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        H = self.num_heads
        D = C // H
        qkv = nn.Dense(3 * C, name="qkv", precision=self.dot_precision)(x)  # (B, N, 3C)
        qkv = qkv.reshape(B, N, 3, H, D).transpose(2, 0, 3, 1, 4)  # (3, B, H, N, D)
        q, k, v = qkv[0], qkv[1], qkv[2]
        out = multi_head_attention(q, k, v, use_pallas=self.use_pallas)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        return nn.Dense(C, name="proj", precision=self.dot_precision)(out)


class Mlp(nn.Module):
    dim: int
    hidden: int
    dot_precision: object = None

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, name="fc1", precision=self.dot_precision)(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim, name="fc2", precision=self.dot_precision)(x)
        return x


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: int = 4
    use_pallas: bool = True
    dot_precision: object = None

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        x = x + Attention(self.dim, self.num_heads, use_pallas=self.use_pallas,
                          dot_precision=self.dot_precision, name="attn")(h)
        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        x = x + Mlp(self.dim, self.dim * self.mlp_ratio, dot_precision=self.dot_precision, name="mlp")(h)
        return x


def resize_pos_embed(pos_embed: jnp.ndarray, grid_hw: Tuple[int, int], orig_grid: int) -> jnp.ndarray:
    """DPT `_resize_pos_embed`: bilinear-resample the grid part of the
    position embedding to the actual patch grid; cls entry passes through."""
    gh, gw = grid_hw
    cls_pe, grid_pe = pos_embed[:, :1], pos_embed[:, 1:]
    if (gh, gw) == (orig_grid, orig_grid):
        return pos_embed
    c = grid_pe.shape[-1]
    grid = grid_pe.reshape(1, orig_grid, orig_grid, c)
    grid = resize_bilinear(grid, (gh, gw), align_corners=False)
    return jnp.concatenate([cls_pe, grid.reshape(1, gh * gw, c)], axis=1)


class PatchEmbed(nn.Module):
    """Non-overlapping patch projection as an explicit reshape + matmul.

    Numerically the stride-P VALID conv timm uses, but XLA's TPU lowering of
    a 16x16/16 conv on a 3-channel input spends ~10x its flop floor on patch
    formatting (xprof: 0.46 ms of the 12.5 ms DPT-Large frame). Flattening
    the (P, P, C) patch explicitly and hitting the MXU with one
    (gh*gw, P*P*C) x (P*P*C, embed) matmul removes that. Param tree is
    byte-identical to ``nn.Conv(name="patch_embed")`` — kernel (P, P, C, E)
    + bias — so converters/checkpoints/goldens are untouched.
    """

    features: int
    patch: int

    @nn.compact
    def __call__(self, x):
        p = self.patch
        b, h, w, c = x.shape
        if h % p or w % p:
            raise ValueError(f"input {h}x{w} not a multiple of patch {p}")
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (p, p, c, self.features),
            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        gh, gw = h // p, w // p
        xp = x.reshape(b, gh, p, gw, p, c).transpose(0, 1, 3, 2, 4, 5)
        xp = xp.reshape(b, gh, gw, p * p * c)
        y = xp @ kernel.astype(xp.dtype).reshape(p * p * c, self.features)
        return y + bias.astype(y.dtype)


class ViT(nn.Module):
    """Transformer trunk; returns hooked token tensors (incl. cls)."""

    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    patch_size: int = 16
    img_size: int = 384  # pos-embed native grid = img_size // patch_size
    hooks: Tuple[int, ...] = (5, 11, 17, 23)
    use_pallas: bool = True
    dot_precision: object = None
    # Optional per-block dot-precision overrides: a length-``depth`` tuple;
    # None entries fall back to dot_precision (then ambient). Exists for the
    # per-block mixed-precision bisect (tools/precision_bisect.py
    # --per-block): which ViT blocks tolerate the TPU's fast single-pass
    # 'default' within the 1e-3 accuracy gate.
    block_precisions: object = None
    # Optional NamedSharding for the (B, N, C) token activations — sequence
    # parallelism (parallel/mesh.py::seq_sharding). Constraints are applied
    # on entry and after every block; GSPMD inserts the K/V all-gathers the
    # attention needs and keeps LayerNorm/MLP token-sharded.
    act_sharding: object = None
    # Per-block rematerialisation (nn.remat): backward recomputes each
    # block's activations from its input instead of storing them — the
    # real memory/FLOPs trade for training at bigger batches. Param tree
    # is unchanged.
    remat: bool = False

    def _constrain(self, tokens):
        if self.act_sharding is None:
            return tokens
        import jax

        return jax.lax.with_sharding_constraint(tokens, self.act_sharding)

    @nn.compact
    def __call__(self, x: jnp.ndarray, patches: Optional[jnp.ndarray] = None):
        """x: (B, H, W, 3) or pre-computed patch features via ``patches``
        (B, gh, gw, C) for the hybrid backbone."""
        if patches is None:
            patches = PatchEmbed(self.embed_dim, self.patch_size,
                                 name="patch_embed")(x)
        B, gh, gw, C = patches.shape
        tokens = patches.reshape(B, gh * gw, C)

        cls_token = self.param("cls_token", nn.initializers.zeros, (1, 1, self.embed_dim))
        pos_embed = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, (self.img_size // self.patch_size) ** 2 + 1, self.embed_dim),
        )
        tokens = jnp.concatenate([jnp.broadcast_to(cls_token, (B, 1, C)), tokens], axis=1)
        tokens = tokens + resize_pos_embed(pos_embed, (gh, gw), self.img_size // self.patch_size)
        tokens = self._constrain(tokens)

        block_cls = nn.remat(Block) if self.remat else Block
        hooked = {}
        for i in range(self.depth):
            prec = self.dot_precision
            if self.block_precisions is not None and self.block_precisions[i] is not None:
                prec = self.block_precisions[i]
            tokens = block_cls(self.embed_dim, self.num_heads, use_pallas=self.use_pallas,
                               dot_precision=prec, name=f"blocks_{i}")(tokens)
            tokens = self._constrain(tokens)
            if i in self.hooks:
                hooked[i] = tokens
        return [hooked[i] for i in self.hooks], (gh, gw)
