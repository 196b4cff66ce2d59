#!/usr/bin/env python
"""TPU smoke test: compile + run every Pallas kernel and the three model
forwards on the real chip, checking numerics against the XLA paths.

Usage: python tools/tpu_smoke.py   (requires a TPU backend)
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from depth_estimation_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()
    assert jax.default_backend() == "tpu", f"need TPU, got {jax.default_backend()}"
    rng = np.random.default_rng(0)
    ok = True

    # Pallas fused preprocess vs XLA
    from depth_estimation_tpu.config import DPT_PREPROCESS
    from depth_estimation_tpu.ops.pallas.resize import pallas_preprocess, pallas_resize2d
    from depth_estimation_tpu.ops.preprocess import compute_resize_shape, preprocess
    from depth_estimation_tpu.ops.resize import resize2d

    img = rng.integers(0, 256, (480, 640, 3), np.uint8)
    out_hw = compute_resize_shape(480, 640, DPT_PREPROCESS)
    t0 = time.time()
    got = np.asarray(pallas_preprocess(img, out_hw, DPT_PREPROCESS.mean, DPT_PREPROCESS.std))
    ref = np.asarray(preprocess(img, DPT_PREPROCESS))
    d = np.abs(got - ref).max()
    print(f"pallas_preprocess: compile+run {time.time()-t0:.1f}s maxdiff {d:.2e}")
    ok &= d < 1e-3

    depth = rng.random((384, 512)).astype(np.float32)
    got = np.asarray(pallas_resize2d(depth, (480, 640)))
    ref = np.asarray(resize2d(depth, (480, 640), method="cubic", align_corners=False))
    d = np.abs(got - ref).max()
    print(f"pallas_resize2d: maxdiff {d:.2e}")
    ok &= d < 1e-3

    # Pallas flash attention vs XLA
    from depth_estimation_tpu.ops.pallas.attention import _attention_xla, multi_head_attention

    q, k, v = (rng.standard_normal((1, 16, 577, 64)).astype(np.float32) for _ in range(3))
    got = np.asarray(multi_head_attention(q, k, v, use_pallas=True))
    ref = np.asarray(_attention_xla(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), 64 ** -0.5))
    d = np.abs(got - ref).max()
    print(f"pallas flash attention: maxdiff vs XLA-on-TPU {d:.2e} (XLA uses bf16 passes)")
    ok &= d < 5e-2

    # model forwards compile + run
    import warnings

    from depth_estimation_tpu.estimator import DepthEstimator

    for name in ("MiDaS_small", "MiDaS", "DPT_Large", "DPT_Hybrid"):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            est = DepthEstimator(name, verbose=False)
        t0 = time.time()
        out = est.predict(img)
        print(f"{name}: predict {img.shape} -> {out.shape} in {time.time()-t0:.1f}s (incl compile)")
        ok &= out.shape == (480, 640)

    # the full single-dispatch frame program (depth + BlazeFace + lax.cond
    # FaceMesh-iris / BlazePose-fallback) — the streaming default
    from depth_estimation_tpu.detect.person_detector import PersonDetector
    from depth_estimation_tpu.geometry.face import FaceDet
    from depth_estimation_tpu.runtime.fused import FusedFrameRunner

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        est = DepthEstimator("MiDaS_small", verbose=False)
        det = PersonDetector(FaceDet(20, [505, 504, 675, 501]))
    runner = FusedFrameRunner(est, det)
    t0 = time.time()
    out = runner(img)
    n = len(out)
    print(f"fused iris+pose program: {n} outputs, depth {np.asarray(out['depth']).shape}, "
          f"vis_u8 {np.asarray(out['vis_u8']).dtype} in {time.time()-t0:.1f}s (incl compile)")
    ok &= np.asarray(out["depth"]).shape == (480, 640)
    ok &= np.asarray(out["vis_u8"]).dtype == np.uint8
    ok &= "pose_lm" in out and "iris_sample" in out

    # detection-only 3-tier program (depth_by_detection's default path)
    from depth_estimation_tpu.detect.face_detector import FaceDetector
    from depth_estimation_tpu.runtime.fused import FusedDetectionRunner

    t0 = time.time()
    dout = FusedDetectionRunner(FaceDetector())(img)
    print(f"fused detection program: {len(dout)} outputs, mesh "
          f"{np.asarray(dout[3]).shape} in {time.time()-t0:.1f}s (incl compile)")
    ok &= len(dout) == 6 and np.asarray(dout[3]).shape == (478, 2)

    # AOT deployment artifact on the TPU platform: export, reload, run
    from depth_estimation_tpu.utils.export import (
        export_frame_program,
        load_frame_program,
    )

    small = rng.integers(0, 256, (64, 96, 3), np.uint8)
    blob = export_frame_program(est, (64, 96))
    reloaded = load_frame_program(blob)
    d = np.abs(np.asarray(reloaded(est.params, small)) - est.predict(small)).max()
    print(f"stablehlo export round-trip (tpu): {len(blob)} bytes, maxdiff {d:.2e}")
    # the reloaded module recompiles through the Exported wrapper; allow
    # fusion-order noise rather than demanding bitwise equality of two
    # separately compiled executables
    ok &= d < 1e-3

    print("SMOKE", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
