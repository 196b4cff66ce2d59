"""Multi-stream batched serving: K concurrent videos, ONE dispatch per tick.

Production extension of the single-source ``VidStream`` (reference scope:
one hardcoded video, depth_midas.py:95-98): a server ingesting K camera
feeds batches one frame from each into a single (K, H, W, 3) device
dispatch per tick, riding the measured batch throughput gains (BASELINE.md:
MiDaS-small 819 → 1146 imgs/s at batch 8; DPT-Large flat — the chip
saturates at batch 1-2).

TPU-first design points:
* the batch is PADDED to a constant K after streams hit EOF — one compiled
  executable for the whole run, no shape churn (XLA recompiles on any
  batch-size change);
* decode runs on per-stream prefetch threads; the device batch for tick t
  computes while tick t-1's results are demuxed/encoded (same 1-deep
  software pipeline as VidStream);
* output semantics per stream are exactly VidStream's: raw uint8 cast
  (wraparound preserved) → gray→3ch → sink;
* ``microbatch=M`` reads M frames per stream per tick — a (K·M, …) batch
  per dispatch with ONE K·M-frame u8 fetch, amortizing the per-tick
  round trip M ways on top of the K-way stream batching (BASELINE.md
  round 3: the fetch RPC dominates client-observed serving throughput
  on remote-attached chips).
"""

from __future__ import annotations

import time
from typing import List, Optional, Sequence

import numpy as np

from depth_estimation_tpu.ops.postprocess import merge_gray3
from depth_estimation_tpu.runtime.timing import StageTimer
from depth_estimation_tpu.runtime.video import (
    PrefetchSource,
    ResilientSource,
    needs_prefetch,
    open_sink,
    open_source,
)


class MultiStream:
    """Run K depth-only streams through one batched frame program.

    ``sources``: list of source specs (paths / 'synthetic:NxHxW' /
    FrameSource instances); all must share one resolution (one executable).
    ``outputs``: matching list of sink specs (None → NullSink each).
    """

    def __init__(self, estimator, sources: Sequence, outputs: Optional[Sequence] = None,
                 prefetch: bool = True, verbose: bool = True, retries: int = 2,
                 microbatch: int = 1):
        """microbatch: frames read per stream per tick (≥1). M>1 dispatches
        a (K·M, H, W, 3) batch and fetches K·M u8 frames in ONE value fetch
        — amortizing the per-tick dispatch/fetch round trip M ways on top of
        the K-way stream batching (file→file serving mode; adds ~M frames
        of latency per stream; per-stream outputs and order unchanged)."""
        if outputs is None:
            outputs = [None] * len(sources)
        if len(outputs) != len(sources):
            raise ValueError(f"{len(sources)} sources but {len(outputs)} outputs")
        if not sources:
            raise ValueError("MultiStream needs at least one source")
        self.estimator = estimator
        self.videos: List = []
        for src in sources:
            v = ResilientSource(open_source(src), retries=retries)
            if prefetch and needs_prefetch(v.inner):
                v = PrefetchSource(v)
            self.videos.append(v)
        hw = {(int(v.height), int(v.width)) for v in self.videos}
        if len(hw) != 1:
            raise ValueError(
                f"all sources must share one resolution for the batched "
                f"program, got {sorted(hw)}"
            )
        (self.h, self.w), = hw
        self.writers = [open_sink(o, (self.w, self.h), fps=20) for o in outputs]
        self.alive = [True] * len(self.videos)
        self.counts = [0] * len(self.videos)
        self.microbatch = max(1, int(microbatch))
        self.verbose = verbose
        self.timer = StageTimer()

    def run(self) -> None:
        """Tick until every stream hits EOF; one device dispatch per tick."""
        est = self.estimator
        # the faithful wraparound u8 cast happens ON DEVICE (estimator
        # output='u8'): the per-tick fetch is K u8 frames, 4× fewer D2H
        # bytes than the f32 maps; stand-ins without the batched-u8 path
        # fall back to f32 + host cast in _demux
        try:
            fn = est._batched_fn((self.h, self.w), output="u8")
        except TypeError:  # estimator stand-in with the old signature
            fn = est._batched_fn((self.h, self.w))
        K = len(self.videos)
        M = self.microbatch
        pending = None  # (device_preds, valid counts, t0, cpu_d) one tick in flight
        tick = 0
        while any(self.alive):
            # fresh buffer per tick: the in-flight tick's async H2D transfer
            # may still be reading the previous tick's host memory
            batch = np.zeros((K * M, self.h, self.w, 3), np.uint8)
            valid = []  # frames read per stream this tick (0..M)
            for i, v in enumerate(self.videos):
                m = 0
                if self.alive[i]:
                    while m < M:
                        ok, frame = v.read()
                        if not ok:
                            self.alive[i] = False
                            break
                        batch[i * M + m] = frame
                        m += 1
                    self.counts[i] += m
                # dead/short slots stay zero/padded — constant batch shape
                # (one executable); the padded results are never written
                if 0 < m < M:
                    batch[i * M + m:(i + 1) * M] = batch[i * M + m - 1]
                valid.append(m)
            if not any(valid):
                break
            c0 = time.process_time()
            t0 = time.perf_counter()
            preds = fn(est.params, batch)
            cpu_d = time.process_time() - c0
            if pending is not None:
                self._demux(*pending)
            pending = (preds, valid, t0, cpu_d)
            tick += 1
            if self.verbose:
                live = sum(1 for m in valid if m)
                print(f"Tick: {tick} ({live}/{K} live)")
        if pending is not None:
            self._demux(*pending)
        for v in self.videos:
            v.release()
        for w in self.writers:
            w.release()
        if self.verbose:
            total = sum(self.counts)
            print(f"Sucessfully read {total} frames over {K} streams.")
            if self.timer.performance.get("depth"):
                print(
                    f"Depth: {self.timer.fps('depth')} "
                    f"(batched ticks; x{K * M} frames/tick)"
                )

    def _demux(self, device_preds, valid, t0, cpu_d) -> None:
        c0 = time.process_time()
        preds = np.asarray(device_preds)  # ONE value fetch for all K·M frames
        # per-TICK completion span, dispatch→value-ready, clamped against
        # the previous tick's completion (runtime/timing.py) — the end-of-
        # run 'Depth:' print states real tick throughput, not dispatch rate
        self.timer.record_completion(
            "depth", t0, cpu_d + time.process_time() - c0
        )
        if preds.dtype != np.uint8:  # f32 fallback path: cast on host
            preds = preds.astype(np.uint8)
        M = self.microbatch
        for i, m in enumerate(valid):
            for j in range(m):
                self.writers[i].write(merge_gray3(preds[i * M + j]))
