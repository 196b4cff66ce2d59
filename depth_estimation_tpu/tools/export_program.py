"""Console entry: export a frame program as a StableHLO deployment artifact.

See utils/export.py for the design; `depth-export --model-type DPT_Large
--hw 480 640 --out dpt.shlo` after install, or
`python -m depth_estimation_tpu.tools.export_program`.
"""

from __future__ import annotations

import argparse
import pathlib

from depth_estimation_tpu.utils.platform import apply_platform_env


def main(argv=None):
    apply_platform_env()  # honor DEPTH_TPU_PLATFORM=cpu before backend init
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--model-type", default="DPT_Large",
                    choices=("MiDaS_small", "MiDaS", "DPT_Large", "DPT_Hybrid"))
    ap.add_argument("--hw", type=int, nargs=2, default=(480, 640),
                    metavar=("H", "W"))
    ap.add_argument("--out", required=True)
    ap.add_argument("--batched", action="store_true")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--fused", action="store_true",
                    help="export the config-4 FUSED program (depth + "
                    "detection + FaceMesh/iris + BlazePose fallback + "
                    "postprocess + sampling) instead of depth-only")
    ap.add_argument("--platforms", nargs="+", default=None,
                    help="lowering targets, e.g.: tpu cpu (default: current backend)")
    args = ap.parse_args(argv)
    if args.batch != 1 and not args.batched:
        ap.error("--batch requires --batched (a single-frame artifact has no batch axis)")
    if args.fused and args.batched:
        ap.error("--fused exports the single-frame fused program")

    from depth_estimation_tpu.estimator import DepthEstimator
    from depth_estimation_tpu.utils.export import export_frame_program

    est = DepthEstimator(args.model_type)
    if args.fused:
        from depth_estimation_tpu.detect.person_detector import PersonDetector
        from depth_estimation_tpu.geometry.face import FaceDet
        from depth_estimation_tpu.utils.export import export_fused_program

        det = PersonDetector(FaceDet(20, [505, 504, 675, 501]))
        blob = export_fused_program(
            est, det, tuple(args.hw), platforms=args.platforms,
        )
    else:
        blob = export_frame_program(
            est, tuple(args.hw), platforms=args.platforms,
            batched=args.batched, batch=args.batch,
        )
    out = pathlib.Path(args.out)
    out.write_bytes(blob)
    shape = (f"({args.batch}, {args.hw[0]}, {args.hw[1]}, 3)" if args.batched
             else f"({args.hw[0]}, {args.hw[1]}, 3)")
    kind = "fused " if args.fused else ""
    print(f"exported {kind}{args.model_type} {shape} -> {out} ({len(blob)} bytes)")


if __name__ == "__main__":
    main()
