#!/usr/bin/env python
"""Per-section profile of the MiDaS v2.1 frame program (encoder prefixes).

The grouped-conv densification (models/midas_v21.py, BASELINE.md round 3)
took the full forward 23.0 → 6.3 ms, but the XLA cost model's byte count
puts the program's memory speed-of-light well below that — and the grouped
episode proved the roofline claim must be checked per op class, not
assumed. This tool localizes the remaining gap: it slope-times the encoder
PREFIX programs (stem→layer1, →layer2, →layer3, →layer4 — XLA dead-code
eliminates everything past the consumed tap) plus the full model, prints
per-section deltas next to each prefix's cost-model bytes/flops, and shows
which section sits furthest off its own floor.

Usage: python tools/v21_profile.py [--dtype float32|bfloat16] [--hw 256 256]
         [--conv2-impl dense dense batched grouped]
         [--peak-tflops 197] [--hbm-gbs 819]
"""

import argparse
import dataclasses
import sys
import warnings

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    ap.add_argument("--hw", type=int, nargs=2, default=(256, 256),
                    help="network input H W (the 256 bucket is what the "
                         "shipped small_transform feeds at 256x256 source)")
    ap.add_argument("--conv2-impl", nargs=4, default=None,
                    metavar=("L1", "L2", "L3", "L4"),
                    help="override the shipped per-layer conv2 lowering")
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
        from depth_estimation_tpu.models.midas_v21 import (
            MIDAS_V21,
            MidasV21,
            ResNeXt,
        )

    cfg = MIDAS_V21
    if args.conv2_impl:
        cfg = dataclasses.replace(cfg, conv2_impl=tuple(args.conv2_impl))
    dtype = jnp.float32 if args.dtype == "float32" else jnp.bfloat16
    precision = "high" if args.dtype == "float32" else "default"
    passes = 3.0 if args.dtype == "float32" else 1.0
    print(f"backend: {jax.default_backend()}  dtype: {args.dtype}  "
          f"hw: {args.hw}  conv2_impl: {cfg.conv2_impl}")

    model = MidasV21(cfg)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, *args.hw, 3)).astype(np.float32)).astype(dtype)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    params = jax.tree.map(lambda a: a.astype(dtype), params)
    enc = ResNeXt(cfg)
    enc_params = {"params": params["params"]["pretrained"]}

    def timed(apply_fn, operands):
        def step(i, salt, p, xx):
            with jax.default_matmul_precision(precision):
                xi = xx + (salt + i.astype(jnp.float32)).astype(dtype) * 1e-6
                return apply_fn(p, xi).astype(jnp.float32)

        ms = slope_time_ms(salted_loop(step), operands, n1=8, n2=24)
        # cost model of the section program alone (jitted outside the loop)
        lowered = jax.jit(
            lambda p, xx: step(jnp.int32(0), jnp.float32(0.0), p, xx)
        ).lower(*operands)
        ca = lowered.compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return ms, float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))

    rows = []
    for tap in ("layer1", "layer2", "layer3", "layer4"):
        ms, fl, by = timed(
            lambda p, xx, tap=tap: enc.apply(p, xx)[tap].mean(),
            (enc_params, x),
        )
        rows.append((f"stem..{tap}", ms, fl, by))
    ms, fl, by = timed(lambda p, xx: model.apply(p, xx).mean(), (params, x))
    rows.append(("full model", ms, fl, by))

    print(f"\n{'prefix':14s} {'meas ms':>8s} {'Δ ms':>7s} "
          f"{'GF':>7s} {'GB':>7s} {'SoL ms':>7s} {'meas/SoL':>8s}")
    prev = (0.0, 0.0, 0.0)
    for name, ms, fl, by in rows:
        d_ms, d_fl, d_by = ms - prev[0], fl - prev[1], by - prev[2]
        sol = max(d_fl / (args.peak_tflops * 1e12 / passes),
                  d_by / (args.hbm_gbs * 1e9)) * 1e3
        print(f"{name:14s} {ms:8.2f} {d_ms:7.2f} {d_fl / 1e9:7.1f} "
              f"{d_by / 1e9:7.2f} {sol:7.2f} {d_ms / max(sol, 1e-9):8.1f}x")
        prev = (ms, fl, by)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
