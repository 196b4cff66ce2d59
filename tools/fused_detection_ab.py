#!/usr/bin/env python
"""On-chip A/B: staged vs single-dispatch detection-only frame program.

A (staged, as depth_by_detection --staged): BlazeFace detect program +
FaceMesh crop program as separate dispatches (the tier-1 hit path; a
tier-2 frame re-dispatches BlazeFace, which this A/B does NOT charge A
for), plus the mid-frame host round-trip the slope method cannot count.
B (fused): runtime/fused.py::make_fused_detection_frame_fn — one program.

Methodology identical to tools/fused_iris_ab.py (salted slope timing; see
bench.py docstring for why salting is mandatory on this tunnel).

Usage: python tools/fused_detection_ab.py [--hw 480 640]
"""

import argparse
import sys
import warnings

import numpy as np

sys.path.insert(0, ".")  # run from the repo root


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, nargs=2, default=(480, 640))
    args = ap.parse_args()

    import jax.numpy as jnp

    from depth_estimation_tpu.detect.face_detector import FaceDetector
    from depth_estimation_tpu.runtime.fused import make_fused_detection_frame_fn
    from depth_estimation_tpu.utils.benchmark import (
        perturb_u8,
        salted_loop,
        slope_time_ms,
    )

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        det = FaceDetector(minDetectionCon=1e-4)
    impl = det._impl

    hw = tuple(args.hw)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 256, (*hw, 3), np.uint8))
    crop = jnp.asarray(rng.integers(0, 256, (160, 160, 3), np.uint8))

    # A1: BlazeFace detect program
    det_fn = impl._detect_fn(hw, "face")

    def step_a1(i, salt, fp, img):
        b, s, v = det_fn(fp, perturb_u8(img, i, salt))
        return b.mean() + s.mean() + v.sum().astype(jnp.float32)

    ms_a1 = slope_time_ms(salted_loop(step_a1), (impl._face_det_params, img))

    # A2: FaceMesh crop program (the tier-1 second dispatch)
    mesh_fn = impl._mesh_fn

    def step_a2(i, salt, mp, crop):
        lm, score = mesh_fn(mp, perturb_u8(crop, i, salt))
        return lm.mean() + score

    ms_a2 = slope_time_ms(salted_loop(step_a2), (impl._mesh_params, crop))

    # B: single-dispatch 3-tier program
    fb = make_fused_detection_frame_fn(det, hw)

    def step_b(i, salt, fp, mp, pp, img):
        b, s, v, mesh, plm, pscore = fb(fp, mp, pp, perturb_u8(img, i, salt))
        return (
            b.mean()
            + s.mean()
            + v.sum().astype(jnp.float32)
            + mesh.sum().astype(jnp.float32)
            + plm.mean()
            + pscore
        )

    ms_b = slope_time_ms(
        salted_loop(step_b),
        (impl._face_det_params, impl._mesh_params, impl._pose_params, img),
    )

    print(f"hw={hw}")
    print(
        f"A staged : detect {ms_a1:.2f} ms + mesh {ms_a2:.2f} ms = "
        f"{ms_a1 + ms_a2:.2f} ms/frame (+ mid-frame host sync, uncounted)"
    )
    print(f"B fused  : {ms_b:.2f} ms/frame (single dispatch, tier-1 branch)")
    print(f"delta    : {ms_a1 + ms_a2 - ms_b:+.2f} ms/frame")


if __name__ == "__main__":
    main()
