"""GPipe pipeline parallelism for the ViT trunk (SURVEY.md §2c extension).

The reference is strictly single-device (depth_midas.py:17); pipeline
parallelism is a new scale-out capability of this framework, expressed the
TPU way: the transformer blocks are split into ``pp`` stages laid out along
a mesh axis, microbatches flow stage-to-stage over ICI via
``jax.lax.ppermute`` inside a ``jax.shard_map``, and the whole schedule
(fill + steady-state + drain, the classic GPipe bubble) is a single
``lax.scan`` — one XLA program, differentiable end-to-end, so the same
machinery serves pipelined training.

Design notes
- Stage weights are the per-block param trees stacked on a leading
  ``(pp, depth // pp)`` axis and sharded ``P('pp')``: each device holds
  only its own stage's blocks, which is the entire memory point of PP.
- Within a stage the homogeneous blocks run under ``lax.scan`` over the
  stacked params (one compiled block body per stage, not per block).
- DPT consumes *hooked* intermediate activations (models/dpt.py): each
  stage captures its local hook outputs into a per-device buffer; the
  buffers come out of shard_map as a ``P('pp', ...)``-sharded array and are
  gathered lazily by the decoder (GSPMD inserts the collective).
- The pipeline composes with the ``dp`` axis (batch is embarrassingly
  parallel through the trunk). ``sp``/``tp`` axes are not used inside the
  pipelined trunk — compute is replicated across them; combine pp with dp,
  or use the non-pipelined trunk for tp/sp sharding (parallel/mesh.py).
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P


def stack_stage_params(params: dict, depth: int, pp: int):
    """Stack ``blocks_0 .. blocks_{depth-1}`` param subtrees into one tree
    with a leading ``(pp, depth // pp)`` axis (stage-major block order)."""
    if depth % pp:
        raise ValueError(f"depth={depth} not divisible by pp={pp}")
    blocks = [params[f"blocks_{i}"] for i in range(depth)]
    return jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs).reshape(pp, depth // pp, *xs[0].shape), *blocks
    )


def hook_table(hooks: Sequence[int], depth: int, pp: int) -> np.ndarray:
    """(pp, k_max) table of stage-local block indices for each hook.

    The shard_map runs one program on all stages, so every stage gathers
    the same number k_max of block outputs; stages owning fewer hooks are
    padded with index 0 — padded slots are simply never read during
    assembly (pipeline_blocks only indexes the real (stage, slot) pairs).
    This makes ragged distributions legal: DPT-Large's hooks (5,11,17,23)
    split evenly at pp ∈ {2, 4}, DPT-Hybrid's transformer hooks both land
    in the last stage at pp = 2 and ride the padding.
    """
    if depth % pp:
        raise ValueError(f"depth={depth} not divisible by pp={pp}")
    if not hooks:
        raise ValueError("need at least one hook")
    if any(h < 0 or h >= depth for h in hooks):
        raise ValueError(f"hooks {tuple(hooks)} out of range for depth={depth}")
    per_stage = depth // pp
    rows = [
        [h - s * per_stage for h in hooks if s * per_stage <= h < (s + 1) * per_stage]
        for s in range(pp)
    ]
    k_max = max(len(r) for r in rows)
    tbl = [r + [0] * (k_max - len(r)) for r in rows]
    return np.asarray(tbl, np.int32)


def pipeline_blocks(
    block_apply: Callable,
    stacked_params,
    tokens: jnp.ndarray,
    mesh: Mesh,
    hooks: Sequence[int],
    depth: int,
    microbatches: int,
) -> List[jnp.ndarray]:
    """Run ``depth`` transformer blocks as a GPipe pipeline over mesh axis
    ``pp``; return the hooked activations as a list of (B, N, C) arrays.

    ``block_apply(block_params, tokens) -> tokens`` is the single-block
    forward. ``tokens`` is (B, N, C) with B divisible by
    ``microbatches * mesh.shape['dp']``.
    """
    if "pp" not in mesh.shape or "dp" not in mesh.shape:
        raise ValueError(f"mesh needs 'dp' and 'pp' axes, got {mesh.axis_names}")
    pp = mesh.shape["pp"]
    M = microbatches
    B, N, C = tokens.shape
    if B % M:
        raise ValueError(f"batch {B} not divisible by microbatches={M}")
    b = B // M
    if b % mesh.shape["dp"]:
        raise ValueError(f"microbatch {b} not divisible by dp={mesh.shape['dp']}")
    tbl = hook_table(hooks, depth, pp)
    k = tbl.shape[1]
    per_stage = depth // pp
    # the pipeline's buffers vary over exactly (dp, pp); any sp/tp axes of
    # the mesh see replicated compute (see module docstring)
    axes = ("dp", "pp")

    def pipe(stacked, x_mb):
        stacked = jax.tree_util.tree_map(lambda a: a[0], stacked)  # local stage
        sid = jax.lax.axis_index("pp")
        loc_idx = jnp.asarray(tbl)[sid]
        b_loc = x_mb.shape[1]

        def stage(tok):
            def body(t, blk):
                out = block_apply(blk, t)
                return out, out

            final, ys = jax.lax.scan(body, tok, stacked)
            return final, jnp.take(ys, loc_idx, axis=0)  # (k, b, N, C)

        zeros = lambda shape: jax.lax.pcast(  # noqa: E731 — carry seeds must
            jnp.zeros(shape, tokens.dtype), axes, to="varying"
        )  # be marked device-varying or the scan carry types mismatch
        hooks_buf = zeros((M, k, b_loc, N, C))
        prev = zeros((b_loc, N, C))

        def tick(carry, t):
            prev, hbuf = carry
            # hand each stage's last output to the next stage; stage 0
            # receives garbage (zeros) and overwrites it with a fresh
            # microbatch below
            recv = jax.lax.ppermute(prev, "pp", [(i, i + 1) for i in range(pp - 1)])
            x_t = jax.lax.dynamic_index_in_dim(
                x_mb, jnp.clip(t, 0, M - 1), 0, keepdims=False
            )
            inp = jnp.where(sid == 0, x_t, recv)
            out, shooks = stage(inp)
            mb = t - sid  # microbatch index this stage works on at tick t
            active = (mb >= 0) & (mb < M)
            upd = jax.lax.dynamic_update_index_in_dim(
                hbuf, shooks, jnp.clip(mb, 0, M - 1), 0
            )
            hbuf = jnp.where(active, upd, hbuf)
            return (out, hbuf), None

        (_, hooks_buf), _ = jax.lax.scan(
            tick, (prev, hooks_buf), jnp.arange(M + pp - 1)
        )
        return hooks_buf[None]  # (1, M, k, b_loc, N, C)

    f = jax.shard_map(
        pipe,
        mesh=mesh,
        in_specs=(P("pp"), P(None, "dp")),
        out_specs=P("pp", None, None, "dp"),
    )
    out = f(stacked_params, tokens.reshape(M, b, N, C))  # (pp, M, k, b, N, C)

    hooked = []
    for h in hooks:  # same order ViT returns them (models/vit.py:132)
        s = h // per_stage
        k_loc = int(np.where(tbl[s] == h - s * per_stage)[0][0])
        hooked.append(out[s, :, k_loc].reshape(B, N, C))
    return hooked


def vit_apply_pipelined(
    vit_params: dict,
    x: Optional[jnp.ndarray],
    model,
    mesh: Mesh,
    microbatches: int,
    patches: Optional[jnp.ndarray] = None,
) -> Tuple[List[jnp.ndarray], Tuple[int, int]]:
    """Forward of a ``models.vit.ViT`` with the block trunk pipelined over
    the mesh's 'pp' axis. Mirrors ViT.__call__'s embed/cls/pos glue exactly
    (models/vit.py:103-132); parity is CI-tested
    (tests/test_parallel_pipeline.py). ``patches`` carries pre-computed
    patch features for the hybrid backbone (the ResNet stem runs outside
    the pipeline), exactly as ViT.__call__'s ``patches`` argument does."""
    import flax.linen as nn

    from depth_estimation_tpu.models.vit import Block, resize_pos_embed

    if patches is None:
        patch_conv = nn.Conv(
            model.embed_dim,
            (model.patch_size, model.patch_size),
            strides=(model.patch_size, model.patch_size),
            padding="VALID",
        )
        patches = patch_conv.apply({"params": vit_params["patch_embed"]}, x)
    B, gh, gw, C = patches.shape
    tokens = patches.reshape(B, gh * gw, C)
    cls_token = vit_params["cls_token"]
    pos_embed = vit_params["pos_embed"]
    tokens = jnp.concatenate([jnp.broadcast_to(cls_token, (B, 1, C)), tokens], axis=1)
    tokens = tokens + resize_pos_embed(
        pos_embed, (gh, gw), model.img_size // model.patch_size
    )

    block = Block(
        model.embed_dim,
        model.num_heads,
        use_pallas=model.use_pallas,
        dot_precision=model.dot_precision,
    )
    block_apply = lambda blk, tok: block.apply({"params": blk}, tok)  # noqa: E731
    stacked = stack_stage_params(vit_params, model.depth, mesh.shape["pp"])
    hooked = pipeline_blocks(
        block_apply, stacked, tokens, mesh, model.hooks, model.depth, microbatches
    )
    return hooked, (gh, gw)


def dpt_apply_pipelined(variables, x, cfg, mesh: Mesh, microbatches: int = 2):
    """Full DPT forward with the ViT trunk pipeline-parallel over 'pp'.

    ``variables`` is the standard DPT variable dict (models/dpt.py); the
    trunk runs through the GPipe schedule, the decoder (reassemble + fusion
    + head) consumes the pp-sharded hook buffers and runs GSPMD-replicated.
    For DPT-Hybrid the ResNetV2 stem and 1×1 patch projection run outside
    (replicated — they are a small fraction of the trunk) and their stage
    features re-enter the decoder via ``stem_layers``.
    """
    import flax.linen as nn

    from depth_estimation_tpu.models.dpt import DPT
    from depth_estimation_tpu.models.vit import ViT

    if cfg.hybrid:
        from depth_estimation_tpu.models.resnetv2 import ResNetV2Stem

        stem_feats, stage_outs = ResNetV2Stem().apply(
            {"params": variables["params"]["resnet_stem"]}, x
        )
        patches = nn.Conv(cfg.embed_dim, (1, 1), padding="VALID").apply(
            {"params": variables["params"]["patch_embed"]}, stem_feats
        )
        vit_hooks = tuple(h for h in cfg.hooks if h >= 2)
        stem_layers = (stage_outs[0], stage_outs[1])
    else:
        patches = None
        vit_hooks = cfg.hooks
        stem_layers = None
    vit = ViT(
        embed_dim=cfg.embed_dim,
        depth=cfg.depth,
        num_heads=cfg.num_heads,
        img_size=cfg.img_size,
        hooks=vit_hooks,
        use_pallas=cfg.use_pallas,
        dot_precision=cfg.dot_precision,
    )
    hooked, (gh, gw) = vit_apply_pipelined(
        variables["params"]["vit"], x, vit, mesh, microbatches, patches=patches
    )
    return DPT(cfg).apply(
        variables, x, hooked=hooked, grid=(gh, gw), stem_layers=stem_layers
    )
