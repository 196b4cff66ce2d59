#!/usr/bin/env python
"""A/B: Pallas fused preprocess/upsample kernels vs the XLA matmul-resize
path inside the REAL frame program (VERDICT r1 weak #3).

Times the full DPT-Large per-frame pipeline (uint8 BGR 480×640 → depth
480×640) with the salted fori_loop slope method, in two variants:

  xla    — resize2d front + back (what estimator._make_frame_fn ships)
  pallas — pallas_preprocess front + pallas_resize2d back

and also isolates the two stages by timing preprocess-only loops. Numbers
feed BASELINE.md and decide the estimator default (use_pallas_resize).

Usage: python tools/pallas_ab.py [--height 480 --width 640]
"""

import argparse
import sys
import warnings

import numpy as np

sys.path.insert(0, ".")


def make_variant(est, in_hw, variant):
    import jax
    import jax.numpy as jnp

    from depth_estimation_tpu.ops.pallas.resize import pallas_preprocess, pallas_resize2d
    from depth_estimation_tpu.ops.preprocess import compute_resize_shape
    from depth_estimation_tpu.ops.resize import resize2d

    cfg = est.preprocess_cfg
    net_hw = compute_resize_shape(*in_hw, cfg)
    mean = jnp.asarray(cfg.mean, jnp.float32)
    std = jnp.asarray(cfg.std, jnp.float32)
    model, dtype = est.model, est.dtype
    precision = est.matmul_precision
    mean_t = tuple(float(m) for m in cfg.mean)
    std_t = tuple(float(s) for s in cfg.std)

    def frame(params, img_u8):
        with jax.default_matmul_precision(precision):
            if variant == "pallas":
                x = pallas_preprocess(img_u8, net_hw, mean_t, std_t).astype(dtype)
                pred = model.apply(params, x).astype(jnp.float32)
                return pallas_resize2d(pred[0], in_hw)
            x = img_u8[..., ::-1].astype(jnp.float32) / 255.0
            x = resize2d(x, net_hw, method="cubic", align_corners=False)
            x = ((x - mean) / std).astype(dtype)
            pred = model.apply(params, x[None]).astype(jnp.float32)
            return resize2d(pred[0], in_hw, method="cubic", align_corners=False)

    return frame


def make_pre_only(est, in_hw, variant):
    import jax
    import jax.numpy as jnp

    from depth_estimation_tpu.ops.pallas.resize import pallas_preprocess
    from depth_estimation_tpu.ops.preprocess import compute_resize_shape
    from depth_estimation_tpu.ops.resize import resize2d

    cfg = est.preprocess_cfg
    net_hw = compute_resize_shape(*in_hw, cfg)
    mean = jnp.asarray(cfg.mean, jnp.float32)
    std = jnp.asarray(cfg.std, jnp.float32)
    mean_t = tuple(float(m) for m in cfg.mean)
    std_t = tuple(float(s) for s in cfg.std)

    def pre(img_u8):
        if variant == "pallas":
            return pallas_preprocess(img_u8, net_hw, mean_t, std_t)
        x = img_u8[..., ::-1].astype(jnp.float32) / 255.0
        x = resize2d(x, net_hw, method="cubic", align_corners=False)
        return (x - mean) / std

    return pre


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--model-type", default="DPT_Large")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    print(f"backend: {jax.default_backend()}")

    from depth_estimation_tpu.estimator import DepthEstimator
    from depth_estimation_tpu.runtime.video import SyntheticSource

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        est = DepthEstimator(args.model_type, verbose=False)
    img = jnp.asarray(SyntheticSource(1, args.height, args.width).read()[1])
    in_hw = (args.height, args.width)

    # numeric agreement first
    outs = {}
    for variant in ("xla", "pallas"):
        fn = jax.jit(make_variant(est, in_hw, variant))
        outs[variant] = np.asarray(fn(est.params, img))
    diff = np.abs(outs["xla"] - outs["pallas"]).max() / (np.abs(outs["xla"]).max() + 1e-8)
    print(f"full-frame xla-vs-pallas max abs-rel: {diff:.2e}")

    from depth_estimation_tpu.utils.benchmark import perturb_u8, salted_loop, slope_time_ms

    for variant in ("xla", "pallas"):
        frame = make_variant(est, in_hw, variant)

        def step(i, salt, params, img, frame=frame):
            return frame(params, perturb_u8(img, i, salt)).mean()

        ms = slope_time_ms(salted_loop(step), (est.params, img))
        print(f"full frame [{variant:6s}]: {ms:.3f} ms/frame", flush=True)

    for variant in ("xla", "pallas"):
        pre = make_pre_only(est, in_hw, variant)

        def step(i, salt, img, pre=pre):
            return pre(perturb_u8(img, i, salt)).mean()

        ms = slope_time_ms(salted_loop(step), (img,), n1=32, n2=96)
        print(f"preprocess only [{variant:6s}]: {ms:.4f} ms", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
