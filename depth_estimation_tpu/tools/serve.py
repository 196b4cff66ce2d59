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
    ap.add_argument("--online", action="store_true",
                    help="serve via the online dynamic batcher "
                    "(runtime/server.py DepthServer): each stream becomes "
                    "an independent client thread submitting frames as "
                    "requests; demonstrates/validates request coalescing")
    ap.add_argument("--max-batch", type=int, default=8,
                    help="--online: requests coalesced per dispatch")
    ap.add_argument("--max-delay-ms", type=float, default=5.0,
                    help="--online: straggler wait before a partial batch")
    args = ap.parse_args(argv)

    from depth_estimation_tpu import DepthEstimator, MultiStream

    est = DepthEstimator(args.model_type)
    if args.online:
        return _serve_online(est, args)
    MultiStream(est, args.src, args.output, verbose=not args.quiet,
                microbatch=args.microbatch).run()


def _serve_online(est, args) -> None:
    """One client thread per --src submitting frames to a shared
    DepthServer; outputs written per stream in order."""
    import threading

    import numpy as np

    from depth_estimation_tpu.ops.postprocess import merge_gray3
    from depth_estimation_tpu.runtime.server import DepthServer
    from depth_estimation_tpu.runtime.video import open_sink, open_source

    outputs = args.output or [None] * len(args.src)
    if len(outputs) != len(args.src):
        raise SystemExit(f"{len(args.src)} --src but {len(outputs)} --output")
    sources = [open_source(s) for s in args.src]
    hw = {(int(v.height), int(v.width)) for v in sources}
    if len(hw) != 1:
        raise SystemExit("--online serves one resolution per server; run "
                         f"one per class (got {sorted(hw)})")
    (h, w), = hw
    sinks = [open_sink(o, (w, h), fps=20) for o in outputs]
    counts = [0] * len(sources)
    with DepthServer(est, (h, w), max_batch=args.max_batch,
                     max_delay_ms=args.max_delay_ms) as srv:

        def client(i):
            futs = []
            while True:
                ok, frame = sources[i].read()
                if not ok:
                    break
                futs.append(srv.submit(frame))
            for f in futs:  # write in order
                sinks[i].write(merge_gray3(np.asarray(f.result())))
                counts[i] += 1

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(len(sources))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    for v in sources:
        v.release()
    for s in sinks:
        s.release()
    if not args.quiet:
        print(f"Sucessfully read {sum(counts)} frames over "
              f"{len(sources)} streams.")
        print(f"Online: {srv.frames_served} requests in "
              f"{srv.batches_dispatched} dispatches "
              f"(max_batch {args.max_batch})")


if __name__ == "__main__":
    main()
