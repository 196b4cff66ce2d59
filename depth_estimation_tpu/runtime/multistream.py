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
    """Run K depth-only streams through batched frame programs.

    ``sources``: list of source specs (paths / 'synthetic:NxHxW' /
    FrameSource instances); ``outputs``: matching list of sink specs
    (None → NullSink each).

    Mixed resolutions are served by BUCKETING: XLA executables have static
    shapes, so streams are grouped by (H, W) and each bucket batches into
    its own compiled program — one dispatch per bucket per tick (the
    minimum possible), with every bucket's tick outputs fetched in ONE
    ``jax.device_get``. A uniform-resolution fleet is simply one bucket."""

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
        self.res = [(int(v.height), int(v.width)) for v in self.videos]
        # bucket stream indices by resolution (insertion-ordered)
        self.buckets: dict = {}
        for i, hw in enumerate(self.res):
            self.buckets.setdefault(hw, []).append(i)
        # single-bucket convenience attrs (back-compat for uniform fleets)
        (self.h, self.w) = self.res[0]
        self.writers = [
            open_sink(o, (w, h), fps=20)
            for o, (h, w) in zip(outputs, self.res)
        ]
        self.alive = [True] * len(self.videos)
        self.counts = [0] * len(self.videos)
        self.microbatch = max(1, int(microbatch))
        self.verbose = verbose
        self.timer = StageTimer()

    def run(self) -> None:
        """Tick until every stream hits EOF; one device dispatch per
        resolution bucket per tick."""
        est = self.estimator

        # the faithful wraparound u8 cast happens ON DEVICE (estimator
        # output='u8'): the per-tick fetch is u8 frames, 4× fewer D2H
        # bytes than the f32 maps; stand-ins without the batched-u8 path
        # fall back to f32 + host cast in _demux
        def batched_fn(hw):
            try:
                return est._batched_fn(hw, output="u8")
            except TypeError:  # estimator stand-in with the old signature
                return est._batched_fn(hw)

        fns = {hw: batched_fn(hw) for hw in self.buckets}
        K = len(self.videos)
        M = self.microbatch
        pending = None  # one tick in flight: list of per-bucket entries
        tick = 0
        while any(self.alive):
            # phase 1 — HOST decode into fresh per-tick buffers (fresh: the
            # in-flight tick's async H2D transfer may still be reading the
            # previous tick's memory)
            staged = []  # (hw, stream idxs, host batch, valid counts)
            for hw, idxs in self.buckets.items():
                batch = np.zeros((len(idxs) * M, *hw, 3), np.uint8)
                valid = []  # frames read per bucket slot this tick (0..M)
                for slot, i in enumerate(idxs):
                    v = self.videos[i]
                    m = 0
                    if self.alive[i]:
                        while m < M:
                            ok, frame = v.read()
                            if not ok:
                                self.alive[i] = False
                                break
                            batch[slot * M + m] = frame
                            m += 1
                        self.counts[i] += m
                    # dead/short slots stay zero/padded — constant batch
                    # shape (one executable per bucket); padded results are
                    # never written
                    if 0 < m < M:
                        batch[slot * M + m:(slot + 1) * M] = batch[slot * M + m - 1]
                    valid.append(m)
                if any(valid):
                    staged.append((hw, idxs, batch, valid))
            if not staged:
                break
            # phase 2 — dispatch every bucket; t0 marks DISPATCH so the
            # depth completion span excludes host decode time
            c0 = time.process_time()
            t0 = time.perf_counter()
            entries = [(idxs, fns[hw](est.params, batch), valid)
                       for hw, idxs, batch, valid in staged]
            cpu_d = time.process_time() - c0
            if pending is not None:
                self._demux(*pending)
            pending = (entries, t0, cpu_d)
            tick += 1
            if self.verbose:
                live = sum(1 for a in self.alive if a)
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
                per_tick = (f"x{K * M} frames/tick" if len(self.buckets) == 1
                            else f"{len(self.buckets)} resolution buckets, "
                                 f"up to x{K * M} frames/tick")
                print(f"Depth: {self.timer.fps('depth')} "
                      f"(batched ticks; {per_tick})")

    def _demux(self, entries, t0, cpu_d) -> None:
        import jax

        c0 = time.process_time()
        # ONE value fetch for ALL buckets' frames this tick
        fetched = jax.device_get([preds for _, preds, _ in entries])
        # per-TICK completion span, dispatch→value-ready, clamped against
        # the previous tick's completion (runtime/timing.py) — the end-of-
        # run 'Depth:' print states real tick throughput, not dispatch rate
        self.timer.record_completion(
            "depth", t0, cpu_d + time.process_time() - c0
        )
        M = self.microbatch
        for (idxs, _, valid), preds in zip(entries, fetched):
            preds = np.asarray(preds)
            if preds.dtype != np.uint8:  # f32 fallback path: cast on host
                preds = preds.astype(np.uint8)
            for slot, m in enumerate(valid):
                for j in range(m):
                    self.writers[idxs[slot]].write(
                        merge_gray3(preds[slot * M + j])
                    )
