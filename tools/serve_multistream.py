#!/usr/bin/env python
"""Serve K video feeds through one batched device dispatch per tick.

Production-serving demo of runtime/multistream.py::MultiStream — the
multi-camera extension of the reference's single hardcoded-video loop
(depth_midas.py:95-98). All sources must share one resolution.

Usage:
  python tools/serve_multistream.py --src a.mp4 --src b.mp4 [--output a.avi --output b.avi]
  python tools/serve_multistream.py --src synthetic:30x480x640 --src synthetic:45x480x640
"""

import argparse
import sys

sys.path.insert(0, ".")  # run from the repo root

from depth_estimation_tpu.utils.platform import apply_platform_env

apply_platform_env()  # honor DEPTH_TPU_PLATFORM=cpu before backend init


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--src", action="append", required=True,
                    help="video path / synthetic:<n>x<H>x<W>; repeat per stream")
    ap.add_argument("--output", action="append", default=None,
                    help="output path per stream (optional; repeat to match --src)")
    ap.add_argument("--model-type", default="MiDaS_small",
                    choices=("MiDaS_small", "DPT_Large", "DPT_Hybrid"))
    ap.add_argument("--quiet", action="store_true")
    args = ap.parse_args()

    from depth_estimation_tpu import DepthEstimator, MultiStream

    est = DepthEstimator(args.model_type)
    ms = MultiStream(est, args.src, args.output, verbose=not args.quiet)
    ms.run()


if __name__ == "__main__":
    main()
