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
  (wraparound preserved) → gray→3ch → sink.
"""

from __future__ import annotations

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
                 prefetch: bool = True, verbose: bool = True, retries: int = 2):
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
        batch = np.zeros((K, self.h, self.w, 3), np.uint8)
        pending = None  # (device_preds, mask) one tick in flight
        tick = 0
        while any(self.alive):
            mask = []
            for i, v in enumerate(self.videos):
                if not self.alive[i]:
                    mask.append(False)
                    continue
                ok, frame = v.read()
                if not ok:
                    self.alive[i] = False
                    mask.append(False)
                    continue
                batch[i] = frame
                self.counts[i] += 1
                mask.append(True)
            if not any(mask):
                break
            # dead slots keep their last frame — constant batch shape, the
            # masked results are simply never written
            with self.timer.stage("depth"):
                preds = fn(est.params, batch)
            if pending is not None:
                self._demux(*pending)
            pending = (preds, mask)
            tick += 1
            if self.verbose:
                print(f"Tick: {tick} ({sum(mask)}/{K} live)")
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
                    f"(batched ticks; x{K} frames/tick)"
                )

    def _demux(self, device_preds, mask) -> None:
        preds = np.asarray(device_preds)
        if preds.dtype != np.uint8:  # f32 fallback path: cast on host
            preds = preds.astype(np.uint8)
        for i, live in enumerate(mask):
            if live:
                self.writers[i].write(merge_gray3(preds[i]))
