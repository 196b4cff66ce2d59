#!/usr/bin/env python
"""Export a frame program as a serialized StableHLO deployment artifact.

Usage:
  python tools/export_program.py --model-type DPT_Large --hw 480 640 --out dpt.shlo
  python tools/export_program.py --model-type MiDaS_small --hw 384 384 \
      --batched --batch 8 --platforms tpu cpu --out midas_b8.shlo

The artifact reloads with utils/export.py::load_frame_program — no model
code needed on the serving side, weights passed at call time.
"""

import argparse
import pathlib
import sys

sys.path.insert(0, ".")  # run from the repo root

from depth_estimation_tpu.utils.platform import apply_platform_env

apply_platform_env()  # honor DEPTH_TPU_PLATFORM=cpu before backend init


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--model-type", default="DPT_Large",
                    choices=("MiDaS_small", "DPT_Large", "DPT_Hybrid"))
    ap.add_argument("--hw", type=int, nargs=2, default=(480, 640),
                    metavar=("H", "W"))
    ap.add_argument("--out", required=True)
    ap.add_argument("--batched", action="store_true")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--platforms", nargs="+", default=None,
                    help="lowering targets, e.g.: tpu cpu (default: current backend)")
    args = ap.parse_args()

    from depth_estimation_tpu.estimator import DepthEstimator
    from depth_estimation_tpu.utils.export import export_frame_program

    est = DepthEstimator(args.model_type)
    blob = export_frame_program(
        est, tuple(args.hw), platforms=args.platforms,
        batched=args.batched, batch=args.batch,
    )
    out = pathlib.Path(args.out)
    out.write_bytes(blob)
    shape = (f"({args.batch}, {args.hw[0]}, {args.hw[1]}, 3)" if args.batched
             else f"({args.hw[0]}, {args.hw[1]}, 3)")
    print(f"exported {args.model_type} {shape} -> {out} ({len(blob)} bytes)")


if __name__ == "__main__":
    main()
