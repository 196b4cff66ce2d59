#!/usr/bin/env python
"""Mixed-precision bisect for DPT-Large / DPT-Hybrid on the real chip.

Measures, for each (trunk, decoder) matmul-precision combination:
  * max abs-rel error vs the full-scale torch oracle (the accuracy gate
    metric, threshold 1e-3), and
  * on-chip ms/frame of the bare 384×384 forward via the salted
    fori_loop slope method (see bench.py docstring — per-dispatch tunnel
    latency cancels; identical-computation memoization is salted away).

The ambient precision (--ambient, default 'high' for DPT-Large, 'highest'
for DPT-Hybrid — each model's shipped registry f32_precision) covers every
section NOT overridden: for Hybrid that is exactly the ResNetV2 stem +
patch embed, so ``--model dpt_hybrid --configs high:high`` measures the
round-3 verdict's untried section mix — stem 'highest', ViT trunk and
decoder 'high' (the stem is the section that needs 'highest': it
accumulates 2.8e-3 at 'high', VERDICT r2/r3). Run on the TPU (default
backend). Results feed BASELINE.md and the registry default.

Usage: python tools/precision_bisect.py [--model dpt_large|dpt_hybrid]
         [--ambient high|highest] [--configs high:high default:default ...]
"""

import argparse
import sys
import time
import warnings

import numpy as np

sys.path.insert(0, ".")


def base_cfg(model_name):
    from depth_estimation_tpu.models.dpt import DPT_HYBRID, DPT_LARGE

    return DPT_HYBRID if model_name == "dpt_hybrid" else DPT_LARGE


def build(trunk, decoder, base):
    import dataclasses

    from depth_estimation_tpu.models.dpt import DPT

    cfg = dataclasses.replace(
        base,
        dot_precision=None if trunk == "ambient" else trunk,
        decoder_precision=None if decoder == "ambient" else decoder,
    )
    return DPT(cfg)


def oracle_and_params(base):
    """Full-scale random hub-named weights + torch oracle output (CPU)."""
    import torch

    from depth_estimation_tpu.utils.convert import convert_dpt
    from tests.oracles import dpt_torch as oracle

    sd = oracle.make_random_state_dict(base, seed=5)
    params = {"params": convert_dpt({k: v.numpy() for k, v in sd.items()}, base)}
    x = np.random.default_rng(0).standard_normal((1, 384, 384, 3)).astype(np.float32) * 0.5
    fwd = oracle.forward_hybrid if base.hybrid else oracle.forward
    ref = fwd(sd, torch.from_numpy(x.transpose(0, 3, 1, 2)), base).numpy()
    return params, x, ref


def measure(model, params, x, ref, ambient="high", n1=8, n2=24, repeats=2,
            time_it=True):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def fwd(p, x):
        with jax.default_matmul_precision(ambient):
            return model.apply(p, x)

    out = np.asarray(fwd(params, x))
    err = float(np.abs(out - ref).max() / (np.abs(ref).max() + 1e-8))
    if not time_it:
        return err, None

    def make_loop(n):
        @jax.jit
        def loop(p, img, salt):
            with jax.default_matmul_precision(ambient):
                def body(i, acc):
                    xx = img + (i.astype(jnp.float32) + salt) * 1e-6
                    return acc + model.apply(p, xx).mean()

                return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

        return loop

    img = jnp.asarray(x)
    salt = [0]

    def timed(loop):
        salt[0] += 1
        t0 = time.perf_counter()
        float(loop(params, img, jnp.float32(salt[0])))
        return time.perf_counter() - t0

    mins = {}
    for n in (n1, n2):
        loop = make_loop(n)
        timed(loop)  # compile + warm
        mins[n] = min(timed(loop) for _ in range(repeats))
    ms = max((mins[n2] - mins[n1]) / (n2 - n1), 1e-6) * 1e3
    return err, ms


def build_per_block(block_precs):
    import dataclasses

    from depth_estimation_tpu.models.dpt import DPT, DPT_LARGE

    return DPT(dataclasses.replace(DPT_LARGE, block_precisions=tuple(block_precs)))


def per_block_bisect(params, x, ref, threshold, mode="suffix", depth=24):
    """Binary-search the largest k such that k ViT blocks at the TPU's fast
    single-pass 'default' precision (rest at ambient 'high') still pass the
    accuracy gate. mode='prefix' defaults the FIRST k blocks (errors get the
    whole remaining trunk to amplify), 'suffix' the LAST k. Gate checks are
    one forward each (no slope timing); only the winner gets timed."""

    def precs(k):
        if mode == "prefix":
            return ["default"] * k + [None] * (depth - k)
        return [None] * (depth - k) + ["default"] * k

    def err_of(k):
        e, _ = measure(build_per_block(precs(k)), params, x, ref, time_it=False)
        print(f"  {mode} k={k:2d}: err {e:.2e} "
              f"({'PASS' if e < threshold else 'FAIL'})", flush=True)
        return e

    # trunk-all-default is the known section-level failure; confirm and
    # establish the bracket
    if err_of(depth) < threshold:
        return depth
    lo, hi = 0, depth  # invariant: lo passes (k=0 == all-'high'), hi fails
    while hi - lo > 1:
        mid = (lo + hi) // 2
        if err_of(mid) < threshold:
            lo = mid
        else:
            hi = mid
    return lo


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--per-block", action="store_true",
                    help="per-ViT-block bisect (VERDICT r2 #5) instead of "
                         "the section-level configs")
    ap.add_argument(
        "--configs",
        nargs="*",
        default=[
            "ambient:ambient",      # all-'high' baseline
            "default:default",      # all bf16-1pass (known gate fail)
            "default:ambient",      # fast trunk, 'high' decoder
            "ambient:default",      # 'high' trunk, fast decoder
        ],
    )
    ap.add_argument("--threshold", type=float, default=1e-3)
    ap.add_argument("--model", default="dpt_large",
                    choices=["dpt_large", "dpt_hybrid"])
    ap.add_argument("--ambient", default=None, choices=["high", "highest"],
                    help="ambient matmul precision for non-overridden "
                         "sections (default: the model's shipped registry "
                         "f32_precision — 'high' for DPT-Large, 'highest' "
                         "for DPT-Hybrid, whose stem needs it)")
    args = ap.parse_args()
    if args.ambient is None:
        args.ambient = "highest" if args.model == "dpt_hybrid" else "high"

    import jax

    print(f"backend: {jax.default_backend()}  model: {args.model}  "
          f"ambient: {args.ambient}")
    base = base_cfg(args.model)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        params, x, ref = oracle_and_params(base)

    if args.per_block:
        if args.model != "dpt_large":
            raise SystemExit("--per-block supports dpt_large only (the "
                             "per-block tables are ViT-L/24-specific)")
        base_err, base_ms = measure(build_per_block([None] * 24), params, x, ref)
        print(f"baseline all-'high': err {base_err:.2e}, {base_ms:.2f} ms/frame")
        results = {}
        for mode in ("suffix", "prefix"):
            print(f"bisecting {mode}-defaulted blocks:")
            results[mode] = per_block_bisect(params, x, ref, args.threshold, mode)
        best_mode = max(results, key=results.get)
        k = results[best_mode]
        print(f"max gate-passing: suffix k={results['suffix']}, "
              f"prefix k={results['prefix']}")
        if k == 0:
            print("NEGATIVE: no single block tolerates 'default' within the "
                  "gate; 'high' everywhere stays the default")
            return 0
        precs = (["default"] * k + [None] * (24 - k)) if best_mode == "prefix" \
            else ([None] * (24 - k) + ["default"] * k)
        err, ms = measure(build_per_block(precs), params, x, ref)
        print(f"BEST per-block config: {best_mode} k={k} -> err {err:.2e}, "
              f"{ms:.2f} ms/frame (vs {base_ms:.2f} all-'high')")
        return 0

    rows = []
    for spec in args.configs:
        trunk, decoder = spec.split(":")
        model = build(trunk, decoder, base)
        err, ms = measure(model, params, x, ref, ambient=args.ambient)
        status = "PASS" if err < args.threshold else "FAIL"
        rows.append((spec, err, ms, status))
        print(f"trunk={trunk:8s} decoder={decoder:8s} -> err {err:.2e} ({status}), {ms:.2f} ms/frame", flush=True)

    passing = [r for r in rows if r[3] == "PASS"]
    if passing:
        best = min(passing, key=lambda r: r[2])
        print(f"BEST gate-passing: {best[0]} at {best[2]:.2f} ms (err {best[1]:.2e})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
