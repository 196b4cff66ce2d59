#!/usr/bin/env python
"""Per-section profile of the DPT frame programs (trunk prefixes + decoder).

Same method as tools/v21_profile.py (which localized the v2.1 grouped-conv
gap): slope-time PREFIX programs of the trunk — for DPT-Large the ViT
stem..block5, ..block11, ..block17, ..block23; for DPT-Hybrid the ResNetV2
stem stage1/2/3 then ..vit block8 / block11 (XLA dead-code eliminates
everything past the consumed hook) — plus the full model, and print
per-section deltas next to each prefix's XLA cost-model bytes/flops. The
full-model minus trunk delta is the reassemble+fusion decoder. Run at
--dtype float32 (the gate-passing default, ambient 'high') and bfloat16 to
see where each mode's time sits vs its floor.

Usage: python tools/dpt_profile.py [--dtype float32|bfloat16] [--hw 384 384]
         [--model dpt_large|dpt_hybrid] [--peak-tflops 197] [--hbm-gbs 819]
"""

import argparse
import sys
import warnings

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    ap.add_argument("--hw", type=int, nargs=2, default=(384, 384))
    ap.add_argument("--model", default="dpt_large",
                    choices=["dpt_large", "dpt_hybrid"])
    ap.add_argument("--peak-tflops", type=float, default=197.0)
    ap.add_argument("--hbm-gbs", type=float, default=819.0)
    args = ap.parse_args()

    from depth_estimation_tpu.utils.platform import (
        apply_platform_env,
        enable_compilation_cache,
    )

    apply_platform_env()

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from depth_estimation_tpu.utils.benchmark import salted_loop, slope_time_ms

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        from depth_estimation_tpu.models.dpt import DPT, DPT_HYBRID, DPT_LARGE
        from depth_estimation_tpu.models.vit import ViT

    cfg = DPT_LARGE if args.model == "dpt_large" else DPT_HYBRID
    # the prefix programs below rebuild bare ViTs that do not thread these
    # config knobs; they are None/False for the shipped registry configs —
    # assert so the profiled program can never silently diverge from them
    assert cfg.block_precisions is None and not cfg.remat and \
        cfg.act_sharding is None, (
            "dpt_profile prefix programs ignore block_precisions/remat/"
            "act_sharding — unset them or thread them into the prefix ViTs")
    dtype = jnp.float32 if args.dtype == "float32" else jnp.bfloat16
    precision = "high" if args.dtype == "float32" else "default"
    passes = 3.0 if args.dtype == "float32" else 1.0
    print(f"backend: {jax.default_backend()}  dtype: {args.dtype}  "
          f"hw: {args.hw}  model: {args.model}")

    model = DPT(cfg)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, *args.hw, 3)).astype(np.float32)).astype(dtype)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    params = jax.tree.map(lambda a: a.astype(dtype), params)
    vit_params = {"params": params["params"]["vit"]}

    def timed(apply_fn, operands):
        def step(i, salt, p, xx):
            with jax.default_matmul_precision(precision):
                xi = xx + (salt + i.astype(jnp.float32)).astype(dtype) * 1e-6
                return apply_fn(p, xi).astype(jnp.float32)

        ms = slope_time_ms(salted_loop(step), operands, n1=8, n2=24)
        lowered = jax.jit(
            lambda p, xx: step(jnp.int32(0), jnp.float32(0.0), p, xx)
        ).lower(*operands)
        ca = lowered.compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return ms, float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))

    rows = []
    if cfg.hybrid:
        import flax.linen as nn

        from depth_estimation_tpu.models.resnetv2 import ResNetV2Stem

        class HybridTrunkPrefix(nn.Module):
            """ResNet stem + patch embed + first ``vit_depth`` ViT blocks,
            named to reuse the full DPT-Hybrid param tree verbatim."""

            stem_stages: int
            vit_depth: int = 0

            @nn.compact
            def __call__(self, xx):
                stem = ResNetV2Stem(depths=(3, 4, 9)[: self.stem_stages],
                                    name="resnet_stem")
                stem_feats, _ = stem(xx)
                if not self.vit_depth:
                    return stem_feats.mean()
                toks, _ = ViT(
                    embed_dim=cfg.embed_dim, depth=self.vit_depth,
                    num_heads=cfg.num_heads, img_size=cfg.img_size,
                    hooks=(self.vit_depth - 1,), use_pallas=cfg.use_pallas,
                    dot_precision=cfg.dot_precision, name="vit",
                )(xx, patches=nn.Conv(cfg.embed_dim, (1, 1), padding="VALID",
                                      name="patch_embed")(stem_feats))
                return toks[0].mean()

        prefixes = [("stem stage1", 1, 0), ("stem stage2", 2, 0),
                    ("stem stage3", 3, 0)]
        prefixes += [(f"..vit block{h}", 3, h + 1) for h in cfg.hooks if h >= 2]
        for name, stages, vdepth in prefixes:
            mod = HybridTrunkPrefix(stem_stages=stages, vit_depth=vdepth)
            ms, fl, by = timed(
                lambda p, xx, mod=mod: mod.apply(p, xx), (params, x))
            rows.append((name, ms, fl, by))
    else:
        for hook in cfg.hooks:
            # Depth-(hook+1) trunk: blocks_{i>hook} params in the tree are
            # simply unused; block naming is depth-independent so the prefix
            # program is exactly the full trunk's first hook+1 blocks.
            enc = ViT(embed_dim=cfg.embed_dim, depth=hook + 1,
                      num_heads=cfg.num_heads, img_size=cfg.img_size,
                      hooks=(hook,), use_pallas=cfg.use_pallas,
                      dot_precision=cfg.dot_precision)
            ms, fl, by = timed(
                lambda p, xx, enc=enc: enc.apply(p, xx)[0][0].mean(),
                (vit_params, x),
            )
            rows.append((f"stem..block{hook}", ms, fl, by))
    ms, fl, by = timed(lambda p, xx: model.apply(p, xx).mean(), (params, x))
    rows.append(("full model", ms, fl, by))

    print(f"\n{'prefix':16s} {'meas ms':>8s} {'Δ ms':>7s} "
          f"{'GF':>7s} {'GB':>7s} {'SoL ms':>7s} {'meas/SoL':>8s}")
    prev = (0.0, 0.0, 0.0)
    for name, ms, fl, by in rows:
        d_ms, d_fl, d_by = ms - prev[0], fl - prev[1], by - prev[2]
        sol = max(d_fl / (args.peak_tflops * 1e12 / passes),
                  d_by / (args.hbm_gbs * 1e9)) * 1e3
        print(f"{name:16s} {ms:8.2f} {d_ms:7.2f} {d_fl / 1e9:7.1f} "
              f"{d_by / 1e9:7.2f} {sol:7.2f} {d_ms / max(sol, 1e-9):8.1f}x")
        prev = (ms, fl, by)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
