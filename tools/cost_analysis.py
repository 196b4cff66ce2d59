#!/usr/bin/env python
"""Speed-of-light analysis of the shipped frame programs (XLA cost model).

For each (model, dtype) this compiles the exact streaming frame program
(uint8 in → u8 depth out) and prints the XLA cost model's FLOPs and HBM
bytes-accessed next to the hardware roofline:

* compute bound  = flops / peak_matmul  (f32 'high' = 3 bf16 passes → peak/3)
* memory bound   = bytes / HBM bandwidth

The larger bound is the speed-of-light floor for that program. Measured
on-chip times (bench.py slope method) sitting at or below the memory bound
mean the program is HBM-BANDWIDTH-bound and XLA's fusion is already beating
the per-instruction byte count — kernel-level compute tuning cannot help;
only byte reduction can (which is what the bf16 speed mode does, and what
the gate forbids beyond it: BASELINE.md records that weight-only bf16
storage fails the 1e-3 gate at 2.2e-2).

Peaks default to TPU v5e (197 TFLOP/s bf16, 819 GB/s HBM); override for
other parts.

Usage: python tools/cost_analysis.py [--models DPT_Large MiDaS_small]
         [--dtypes float32 bfloat16] [--hw 384 384]
         [--peak-tflops 197] [--hbm-gbs 819]
"""

import argparse
import sys
import warnings

import numpy as np

sys.path.insert(0, ".")


def analyze(model_type, dtype, hw, peak_tflops, hbm_gbs):
    from depth_estimation_tpu.estimator import DepthEstimator

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        est = DepthEstimator(model_type, verbose=False, dtype=dtype)
    img = np.zeros((*hw, 3), np.uint8)
    fn = est.frame_fn(hw, output="u8")
    ca = fn.lower(est.params, img).compile().cost_analysis()
    if isinstance(ca, list):  # older jax returns a per-device list
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    bytes_acc = float(ca.get("bytes accessed", 0.0))
    # f32 runs matmuls at the registry 'high' precision = 3 bf16 MXU passes
    passes = 3.0 if dtype == "float32" else 1.0
    t_compute = flops / (peak_tflops * 1e12 / passes) * 1e3
    t_memory = bytes_acc / (hbm_gbs * 1e9) * 1e3
    bound = "memory" if t_memory >= t_compute else "compute"
    print(
        f"{model_type:12s} {dtype:8s} {hw[0]}x{hw[1]}: "
        f"flops {flops / 1e9:7.1f} G  bytes {bytes_acc / 1e9:6.2f} GB  | "
        f"SoL compute {t_compute:6.2f} ms  memory {t_memory:6.2f} ms  "
        f"-> {bound}-bound floor {max(t_compute, t_memory):.2f} ms"
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", nargs="*",
                    default=["DPT_Large", "DPT_Hybrid", "MiDaS_small", "MiDaS"])
    ap.add_argument("--dtypes", nargs="*", default=["float32", "bfloat16"])
    ap.add_argument("--hw", type=int, nargs=2, default=(384, 384))
    ap.add_argument("--peak-tflops", type=float, default=197.0,
                    help="peak bf16 matmul TFLOP/s (v5e: 197)")
    ap.add_argument("--hbm-gbs", type=float, default=819.0,
                    help="HBM bandwidth GB/s (v5e: 819)")
    args = ap.parse_args()

    from depth_estimation_tpu.utils.platform import apply_platform_env
    apply_platform_env()  # honor DEPTH_TPU_PLATFORM=cpu before backend init
    for model in args.models:
        for dtype in args.dtypes:
            analyze(model, dtype, tuple(args.hw), args.peak_tflops, args.hbm_gbs)


if __name__ == "__main__":
    main()
