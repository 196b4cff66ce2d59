#!/usr/bin/env python
"""A/B: XLA's grouped-conv lowering at MiDaS v2.1 (ResNeXt 32x8d) shapes.

The v2.1 encoder's 3x3 conv2s contract only width/32 = 8 channels per group
(models/midas_v21.py) — a poor MXU fill in the contracting dimension if XLA
maps each group to its own matmul. This tool measures, on the current
backend, each layer's grouped conv against a dense conv of the same tensor
shape (groups=1 — 32x the FLOPs at perfect fill: if grouped measures CLOSE
TO OR ABOVE dense, XLA's grouped lowering is wasting the MXU and a custom
mapping would pay; if grouped sits well below dense/32-adjusted bounds, the
shipped model is fine). Context row: the full shipped "MiDaS" frame program.

Timing: salted fori_loop slope method (utils/benchmark.py — the only
trustworthy method through the tunneled chip).

Usage: python tools/grouped_conv_ab.py [--dtype float32|bfloat16]
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

# (layer, H=W at the 256-bucket input, width, groups) of full MidasV21
V21_CONV2_SHAPES = [
    ("layer1", 64, 256, 32),
    ("layer2", 32, 512, 32),
    ("layer3", 16, 1024, 32),
    ("layer4", 8, 2048, 32),
]


def conv_ms(hw, width, groups, dtype, precision):
    """Slope-timed ms of one 3x3 conv (B=1, NHWC) with the given grouping."""
    import jax
    import jax.numpy as jnp

    from depth_estimation_tpu.utils.benchmark import salted_loop, slope_time_ms

    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, hw, hw, width)).astype(np.float32)).astype(dtype)
    w = jnp.asarray(np.random.default_rng(1).standard_normal(
        (3, 3, width // groups, width)).astype(np.float32) * 0.05).astype(dtype)

    def step(i, salt, x, w):
        with jax.default_matmul_precision(precision):
            xi = x + (salt + i.astype(jnp.float32)).astype(dtype) * 1e-6
            y = jax.lax.conv_general_dilated(
                xi, w, (1, 1), "SAME",
                feature_group_count=groups,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return y.mean().astype(jnp.float32)

    return slope_time_ms(salted_loop(step), (x, w), n1=16, n2=48)


def model_variants_ms(dtype_name, only=None):
    """Full-scale MidasV21 forward (256², slope method) per conv2 policy —
    the FULL-PROGRAM numbers the shipped conv2_impl default is set by
    (the single-conv rows above overstate layer3: a loop-invariant dense
    kernel stays VMEM-resident there, but 23 distinct 37.7 MB kernels
    stream from HBM in the real model)."""
    import dataclasses
    import warnings

    import jax
    import jax.numpy as jnp

    from depth_estimation_tpu.utils.benchmark import salted_loop, slope_time_ms

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        from depth_estimation_tpu.models.midas_v21 import MIDAS_V21, MidasV21

    dtype = jnp.float32 if dtype_name == "float32" else jnp.bfloat16
    precision = "high" if dtype_name == "float32" else "default"
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 256, 256, 3)).astype(np.float32)).astype(dtype)
    variants = [
        ("grouped", ("grouped",) * 4),
        ("dense12", ("dense", "dense", "grouped", "grouped")),
        ("dense123", ("dense", "dense", "dense", "grouped")),
        ("dense12+batched3", ("dense", "dense", "batched", "grouped")),
        ("dense12+batched34", ("dense", "dense", "batched", "batched")),
        ("dense12+pallas3", ("dense", "dense", "pallas", "grouped")),
        ("dense12+pallasH3", ("dense", "dense", "pallas_high", "grouped")),
        ("dense12+pallas34", ("dense", "dense", "pallas", "pallas")),
        ("pallas123", ("pallas", "pallas", "pallas", "grouped")),
        ("pallas1234", ("pallas", "pallas", "pallas", "pallas")),
        ("dense1+pallas23", ("dense", "pallas", "pallas", "grouped")),
    ]
    if only:
        keep = set(only.split(","))
        unknown = keep - {n for n, _ in variants}
        if unknown:
            raise SystemExit(f"unknown --only policies: {sorted(unknown)}")
        variants = [(n, dc) for n, dc in variants if n in keep]
    params = None
    for name, dc in variants:
        m = MidasV21(dataclasses.replace(MIDAS_V21, conv2_impl=dc))
        if params is None:
            params = jax.jit(m.init)(jax.random.PRNGKey(0), x)
            params = jax.tree.map(lambda a: a.astype(dtype), params)

        def step(i, salt, p, xx, m=m):
            with jax.default_matmul_precision(precision):
                xi = xx + (salt + i.astype(jnp.float32)).astype(dtype) * 1e-6
                return m.apply(p, xi).mean().astype(jnp.float32)

        ms = slope_time_ms(salted_loop(step), (params, x), n1=8, n2=24)
        print(f"model forward [{name}]: {ms:.2f} ms")


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    ap.add_argument("--variants", action="store_true",
                    help="also time the full model per conv2 densification "
                         "policy (grouped / dense12 / dense123)")
    ap.add_argument("--only", default=None,
                    help="comma-separated policy names to restrict --variants "
                         "to (compiles are minutes each through the tunnel)")
    args = ap.parse_args()

    from depth_estimation_tpu.utils.platform import (
        apply_platform_env,
        enable_compilation_cache,
    )

    apply_platform_env()

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    dtype = jnp.float32 if args.dtype == "float32" else jnp.bfloat16
    precision = "high" if args.dtype == "float32" else "default"
    print(f"backend: {jax.default_backend()}  dtype: {args.dtype}")

    if args.variants and args.only:
        # Restricted re-measurement run: skip the (already-recorded)
        # single-conv rows and frame-program context — compiles are minutes
        # each through the tunnel.
        model_variants_ms(args.dtype, only=args.only)
        return 0

    total_grouped = total_dense = 0.0
    for name, hw, width, groups in V21_CONV2_SHAPES:
        g = conv_ms(hw, width, groups, dtype, precision)
        d = conv_ms(hw, width, 1, dtype, precision)
        total_grouped += g
        total_dense += d
        flops_g = 2 * hw * hw * 9 * (width // groups) * width
        print(f"{name}: {hw}x{hw}x{width} g={groups}: grouped {g:.3f} ms, "
              f"dense {d:.3f} ms (32x flops) — grouped runs at "
              f"{flops_g / (g * 1e9):.2f} TFLOP/s effective")
    print(f"sum over one conv2 per layer: grouped {total_grouped:.3f} ms, "
          f"dense {total_dense:.3f} ms")

    if args.variants:
        model_variants_ms(args.dtype, only=args.only)

    # context: the full shipped frame program (33 bottlenecks -> ~33 conv2s)
    import warnings

    from depth_estimation_tpu.utils.benchmark import onchip_frame_ms

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        from depth_estimation_tpu.estimator import DepthEstimator

        est = DepthEstimator("MiDaS", verbose=False, dtype=args.dtype)
    img = np.random.default_rng(2).integers(0, 256, (256, 256, 3), np.uint8)
    ms = onchip_frame_ms(est, img)
    print(f"full MiDaS v2.1 frame program (256x256 source): {ms:.2f} ms/frame")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
