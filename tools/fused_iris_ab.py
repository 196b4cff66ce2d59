"""A/B: staged iris path (2 dispatches) vs single-dispatch fused program.

Measures, on the real chip with the slope method (utils/benchmark.py):

  A. staged  — make_fused_frame_fn (depth + BlazeFace) + the separate
               FaceMesh dispatch (_mesh_fn on a 192 crop), summed. The
               staged path also pays a mid-frame host sync (fetch valid/box,
               slice the crop) that this sum does NOT count — so A is a
               lower bound on the staged path's real cost.
  B. fused   — make_fused_iris_frame_fn: the whole iris path in ONE XLA
               program (crop on device, lax.cond mesh branch).

Detection threshold is ~0 so the mesh branch runs every frame (worst case).

Usage: python tools/fused_iris_ab.py [--model DPT_Large] [--hw 480 640]
"""

import argparse
import sys
import warnings

import numpy as np

sys.path.insert(0, ".")  # run from the repo root


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="DPT_Large")
    ap.add_argument("--hw", type=int, nargs=2, default=(480, 640))
    args = ap.parse_args()

    import jax.numpy as jnp

    from depth_estimation_tpu.estimator import DepthEstimator
    from depth_estimation_tpu.detect.person_detector import PersonDetector
    from depth_estimation_tpu.geometry.face import FaceDet
    from depth_estimation_tpu.runtime.fused import (
        make_fused_frame_fn,
        make_fused_iris_frame_fn,
    )
    from depth_estimation_tpu.utils.benchmark import (
        perturb_u8,
        salted_loop,
        slope_time_ms,
    )

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        est = DepthEstimator(args.model, verbose=False)
        det = PersonDetector(
            FaceDet(20, [505, 504, 675, 501]),
            minDetectionCon=1e-4,
            params={},
            seed=0,
        )

    hw = tuple(args.hw)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 256, (*hw, 3), np.uint8))
    crop = jnp.asarray(rng.integers(0, 256, (160, 160, 3), np.uint8))

    # A1: depth + detect program
    ab = make_fused_frame_fn(est, det, hw)

    def step_a1(i, salt, dp, fp, img):
        d, b, s, v = ab(dp, fp, perturb_u8(img, i, salt))
        return d.mean() + b.mean() + s.mean() + v.sum().astype(jnp.float32)

    ms_a1 = slope_time_ms(
        salted_loop(step_a1), (est.params, det._face_det_params, img)
    )

    # A2: the staged mesh dispatch (host would slice a crop; we time the
    # jitted program it feeds)
    mesh_fn = det._mesh_fn

    def step_a2(i, salt, mp, crop):
        lm, score = mesh_fn(mp, perturb_u8(crop, i, salt))
        return lm.mean() + score

    ms_a2 = slope_time_ms(salted_loop(step_a2), (det._mesh_params, crop))

    # B: single-dispatch fused iris program
    fb = make_fused_iris_frame_fn(est, det, hw)
    zero_pts = jnp.zeros((2, 2), jnp.int32)

    def step_b(i, salt, dp, fp, mp, img):
        out = fb(dp, fp, mp, perturb_u8(img, i, salt), zero_pts)
        return (
            out["depth"].mean()
            + out["boxes"].mean()
            + out["mesh"].sum().astype(jnp.float32)
            + out["mesh_score"]
            + out["l_radius"]
            + out["r_radius"]
        )

    ms_b = slope_time_ms(
        salted_loop(step_b),
        (est.params, det._face_det_params, det._mesh_params, img),
    )

    print(f"model={args.model} hw={hw}")
    print(f"A staged : depth+detect {ms_a1:.2f} ms + mesh {ms_a2:.2f} ms = {ms_a1 + ms_a2:.2f} ms/frame (+ mid-frame host sync, uncounted)")
    print(f"B fused  : {ms_b:.2f} ms/frame (single dispatch, mesh branch always taken)")
    print(f"delta    : {ms_a1 + ms_a2 - ms_b:+.2f} ms/frame")


if __name__ == "__main__":
    main()
