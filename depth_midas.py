"""Depth-only video pipeline — entry point mirroring the reference's
depth_midas.py (public surface: DepthEstimator, VidStream, __main__ block).

Reference behavior (depth_midas.py:89-101): pick a model type, open a video,
write raw-cast depth frames to an MJPG .avi. All compute now runs as fused
XLA programs on TPU; decode/encode overlap device compute.

Usage:
    python depth_midas.py [--model-type DPT_Large] [--src VIDEO|synthetic:NxHxW]
                          [--output out.avi]
"""

import argparse

from depth_estimation_tpu.utils.platform import (
    apply_platform_env,
    enable_compilation_cache,
)

apply_platform_env()
enable_compilation_cache()

from depth_estimation_tpu.estimator import DepthEstimator  # noqa: F401  (public surface)
from depth_estimation_tpu.runtime.stream import VidStream  # noqa: F401


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--model-type",
        default="DPT_Large",  # reference default (depth_midas.py:91)
        choices=["DPT_Large", "DPT_Hybrid", "MiDaS_small", "MiDaS"],
    )
    parser.add_argument("--src", default="synthetic:30x480x640", help="video path, camera index, or synthetic:<n>x<H>x<W>")
    parser.add_argument("--output", default="midas_output.avi")
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--start-frame", type=int, default=0, help="resume from frame N")
    parser.add_argument("--microbatch", type=int, default=1,
                        help="frames per device dispatch (K>1 amortizes the "
                        "per-dispatch/per-fetch round trip K ways; identical "
                        "output, ~K frames more latency — for file→file runs)")
    parser.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    parser.add_argument("--trace", nargs="?", const="./jax_trace", default=None,
                        metavar="DIR",
                        help="capture a jax.profiler xplane device trace of "
                        "the run (view with xprof/TensorBoard)")
    args = parser.parse_args(argv)

    midas = DepthEstimator(args.model_type, dtype=args.dtype)
    video_stream = VidStream(midas, args.src, args.output, verbose=not args.quiet,
                             start_frame=args.start_frame, microbatch=args.microbatch)
    from depth_estimation_tpu.runtime.tracing import maybe_trace

    with maybe_trace(args.trace is not None, args.trace) as tdir:
        video_stream.update()
    if tdir:
        print(f"Trace written to {tdir}")
    summary = video_stream.timer.summary()
    if "depth" in summary:
        s = summary["depth"]
        print(f"depth: {s['frames']} frames, p50 {s['p50_ms']:.1f} ms, median {s['fps_median_wall']:.1f} FPS")


if __name__ == "__main__":
    main()
