"""Fused iris/pose + depth pipeline — entry point mirroring the reference's
midas_mediapipe.py (public surface: VidStream with (estimator, detector,
face, src, output), __main__ block).

Reference behavior (midas_mediapipe.py:163-187): calibrate a FaceDet from
credit-card endpoints, build a depth estimator + person detector, stream a
video with per-frame iris detection, depth, metric-distance fusion and a
side-by-side annotated output.

Usage:
    python midas_mediapipe.py [--model-type DPT_Large] [--src ...] [--output out.avi]
"""

import argparse

from depth_estimation_tpu.utils.platform import (
    apply_platform_env,
    enable_compilation_cache,
)

apply_platform_env()
enable_compilation_cache()

import numpy as np

from depth_estimation_tpu.detect.person_detector import PersonDetector  # noqa: F401
from depth_estimation_tpu.estimator import DepthEstimator  # noqa: F401
from depth_estimation_tpu.geometry.face import FaceDet  # noqa: F401
from depth_estimation_tpu.runtime.stream import FusedVidStream as VidStream  # noqa: F401


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--model-type",
        default="DPT_Large",  # reference default (midas_mediapipe.py:165)
        choices=["DPT_Large", "DPT_Hybrid", "MiDaS_small", "MiDaS"],
    )
    parser.add_argument("--src", default="synthetic:30x480x640")
    parser.add_argument("--output", default="midas_output.avi")
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--start-frame", type=int, default=0, help="resume from frame N")
    parser.add_argument("--no-fused", action="store_true",
                        help="run depth and detection as separate dispatches")
    parser.add_argument("--microbatch", type=int, default=1,
                        help="frames per fused dispatch (K>1 amortizes the "
                        "per-dispatch/per-fetch round trip K ways; for "
                        "file→file runs — docs/PARITY.md #13)")
    parser.add_argument("--trace", nargs="?", const="./jax_trace", default=None,
                        metavar="DIR",
                        help="capture a jax.profiler xplane device trace of "
                        "the run (view with xprof/TensorBoard)")
    args = parser.parse_args(argv)

    # raw coordinates for card from test data (midas_mediapipe.py:174)
    CARD = np.array([505, 504, 675, 501])
    d_2_obj = 20  # distance to credit card, inches (:177)
    face = FaceDet(d_2_obj, CARD)

    estimator = DepthEstimator(args.model_type)
    detector = PersonDetector(face)
    video_stream = VidStream(estimator, detector, face, args.src, args.output,
                             verbose=not args.quiet, fused=not args.no_fused,
                             start_frame=args.start_frame,
                             microbatch=args.microbatch)
    from depth_estimation_tpu.runtime.tracing import maybe_trace

    with maybe_trace(args.trace is not None, args.trace) as tdir:
        video_stream.stream()
    if tdir:
        print(f"Trace written to {tdir}")


if __name__ == "__main__":
    main()
