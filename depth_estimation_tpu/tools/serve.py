"""Console entry: serve K video feeds via one batched dispatch per tick.

See runtime/multistream.py for the design; `depth-serve --src a.mp4 --src
b.mp4` after install, or `python -m depth_estimation_tpu.tools.serve`.
"""

from __future__ import annotations

import argparse

from depth_estimation_tpu.utils.platform import apply_platform_env


def main(argv=None):
    apply_platform_env()  # honor DEPTH_TPU_PLATFORM=cpu before backend init
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--src", action="append", required=True,
                    help="video path / synthetic:<n>x<H>x<W>; repeat per stream")
    ap.add_argument("--output", action="append", default=None,
                    help="output path per stream (optional; repeat to match --src)")
    ap.add_argument("--model-type", default="MiDaS_small",
                    choices=("MiDaS_small", "DPT_Large", "DPT_Hybrid"))
    ap.add_argument("--quiet", action="store_true")
    ap.add_argument("--microbatch", type=int, default=1,
                    help="frames per stream per tick (M>1 amortizes the "
                    "per-tick dispatch/fetch round trip M ways; identical "
                    "outputs, ~M frames more latency — for file→file runs)")
    args = ap.parse_args(argv)

    from depth_estimation_tpu import DepthEstimator, MultiStream

    est = DepthEstimator(args.model_type)
    MultiStream(est, args.src, args.output, verbose=not args.quiet,
                microbatch=args.microbatch).run()


if __name__ == "__main__":
    main()
