#!/usr/bin/env python
"""A/B: K fused-pipeline streams — per-stream dispatches vs ONE batched
dispatch with BOTH cond branches computed (VERDICT r2 weak #3).

ROADMAP r2 declared fused-detection batching a non-goal because ``lax.cond``
executes both branches under ``vmap``; this measures that claim instead of
asserting it:

  A. per-stream — K independent single-frame fused programs per tick
     (the shipped FusedVidStream path, one dispatch per stream). On-chip
     cost = K x single-frame ms; wall cost through a tunneled chip adds
     ~100 ms PER DISPATCH AND PER FETCH, K of each per tick.
  B. batched — ``vmap`` of the same fused program over a (K, H, W, 3)
     batch: one dispatch per tick, with the mesh AND pose branches both
     computed for every stream (vmap turns cond into select).

Measures on-chip ms/frame for both via the salted slope method, plus the
client-observed wall per tick (dispatch+fetch) for the tunnel-dominated
comparison. Detection threshold ~0: every frame takes the mesh branch, so
B's "wasted" pose branch is maximal — the honest worst case for B.

Usage: python tools/fused_multistream_ab.py [--model MiDaS_small]
         [--hw 480 640] [--k 4 8] [--frames 8]
"""

import argparse
import sys
import time
import warnings

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="MiDaS_small")
    ap.add_argument("--hw", type=int, nargs=2, default=(480, 640))
    ap.add_argument("--k", type=int, nargs="*", default=(4, 8))
    ap.add_argument("--frames", type=int, default=8,
                    help="ticks for the wall-clock e2e comparison")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from depth_estimation_tpu.detect.person_detector import PersonDetector
    from depth_estimation_tpu.estimator import DepthEstimator
    from depth_estimation_tpu.geometry.face import FaceDet
    from depth_estimation_tpu.runtime.fused import make_fused_iris_frame_fn
    from depth_estimation_tpu.utils.benchmark import (
        perturb_u8,
        salted_loop,
        slope_time_ms,
    )

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        est = DepthEstimator(args.model, verbose=False)
        det = PersonDetector(FaceDet(20, [505, 504, 675, 501]),
                             minDetectionCon=1e-4, params={}, seed=0)

    hw = tuple(args.hw)
    rng = np.random.default_rng(0)
    zero_pts = jnp.zeros((2, 2), jnp.int32)
    fn = make_fused_iris_frame_fn(est, det, hw, include_pose=True,
                                  emit_depth_map=False)
    pack = (est.params, det._face_det_params, det._mesh_params,
            det._pose_params)

    def out_scalar(out):
        return (out["vis_u8"].sum().astype(jnp.float32) * 1e-6
                + out["iris_sample"].sum()
                + out["mesh"].sum().astype(jnp.float32) * 1e-3)

    # A on-chip: single-frame fused program
    img1 = jnp.asarray(rng.integers(0, 256, (*hw, 3), np.uint8))

    def step_a(i, salt, dp, fp, mp, pp, im):
        return out_scalar(fn(dp, fp, mp, pp, perturb_u8(im, i, salt), zero_pts))

    ms_a = slope_time_ms(salted_loop(step_a), (*pack, img1))
    print(f"model={args.model} hw={hw}")
    print(f"A per-stream on-chip: {ms_a:.2f} ms/frame "
          f"(x K dispatches + K fetches per tick)")

    for K in args.k:
        imgs = jnp.asarray(rng.integers(0, 256, (K, *hw, 3), np.uint8))
        pts_b = jnp.zeros((K, 2, 2), jnp.int32)
        batch_fn = jax.jit(jax.vmap(fn, in_axes=(None, None, None, None, 0, 0)))

        def step_b(i, salt, dp, fp, mp, pp, ims):
            return out_scalar(
                batch_fn(dp, fp, mp, pp, perturb_u8(ims, i, salt), pts_b)
            )

        ms_b_tick = slope_time_ms(salted_loop(step_b), (*pack, imgs),
                                  n1=4, n2=12)

        # client wall: one tick = serve one frame for each of K streams
        frames_a = [np.asarray(perturb_u8(img1, jnp.int32(t), jnp.float32(99)))
                    for t in range(args.frames)]
        fetch = jax.device_get
        fetch(fn(*pack, frames_a[0], zero_pts))  # warm A
        t0 = time.perf_counter()
        for f in frames_a:
            outs = [fn(*pack, f, zero_pts) for _ in range(K)]
            for o in outs:
                fetch(o)
        wall_a = (time.perf_counter() - t0) / args.frames * 1e3

        fetch(batch_fn(*pack, imgs, pts_b))  # warm B
        batches = [np.asarray(perturb_u8(imgs, jnp.int32(t), jnp.float32(7)))
                   for t in range(args.frames)]
        t0 = time.perf_counter()
        for bimgs in batches:
            fetch(batch_fn(*pack, bimgs, pts_b))
        wall_b = (time.perf_counter() - t0) / args.frames * 1e3

        print(f"K={K}: on-chip A {K * ms_a:7.2f} ms/tick ({ms_a:.2f}/frame)  "
              f"B {ms_b_tick:7.2f} ms/tick ({ms_b_tick / K:.2f}/frame)  "
              f"on-chip speedup {K * ms_a / ms_b_tick:4.2f}x | "
              f"client wall A {wall_a:7.1f} ms/tick  B {wall_b:7.1f} ms/tick "
              f"speedup {wall_a / wall_b:4.2f}x")


if __name__ == "__main__":
    raise SystemExit(main())
