"""Online serving: dynamic batching of concurrent depth requests.

MultiStream (runtime/multistream.py) serves a FIXED fleet of video feeds;
this module serves the other production shape — independent clients
submitting single frames at unpredictable times. The standard accelerator
answer is DYNAMIC BATCHING, tuned for how TPUs actually execute:

* requests queue on the host; a dispatcher thread drains up to
  ``max_batch`` of them, PADS the batch to exactly ``max_batch`` by
  repeating the last frame, and runs ONE batched program — one static
  shape, ONE compiled executable for the server's lifetime (XLA
  recompiles on any shape change, so variable-size batches would be
  poison);
* a partial batch dispatches after ``max_delay_ms`` — the classic
  latency/throughput knob (batch table in BASELINE.md: MiDaS-small
  819 → 1146 imgs/s from batch 1 → 8; measured 2.4× aggregate req/s
  through the tunneled chip at max_batch 8);
* results come back as futures; each request's outputs are fetched from
  the ONE per-batch device transfer (u8 bytes + scalars only — the same
  transfer discipline as the streaming loops).

Three surfaces: :class:`DepthServer` (depth-only, u8 map per request) and
:class:`FusedDepthServer` (the whole config-4 fused program per request —
depth + BlazeFace + FaceMesh/iris + BlazePose fallback + postprocess +
sampling, via ``jax.vmap`` of the fused frame program; stateless, so the
body-fallback sampling points are zeros) share the dispatcher core;
:class:`BucketedDepthServer` routes mixed-resolution requests to
per-(H, W) DepthServers (bounded by ``max_buckets``).

No sockets here by design: transport is deployment-specific, and this
queue + futures API is the part a gRPC/HTTP front end would wrap.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from typing import Optional, Tuple

import numpy as np


class _DynamicBatcher:
    """Queue + futures + padded static-shape dispatch loop; subclasses
    implement ``_dispatch(frames) -> list of per-request results``."""

    def __init__(self, hw: Tuple[int, int], max_batch: int,
                 max_delay_ms: float):
        self.hw = (int(hw[0]), int(hw[1]))
        self.max_batch = max(1, int(max_batch))
        self.max_delay_s = max(0.0, float(max_delay_ms)) / 1e3
        self._q: queue.Queue = queue.Queue()
        self._lock = threading.Lock()
        self._closed = False
        self.batches_dispatched = 0
        self.frames_served = 0
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # -- client side ---------------------------------------------------------

    def submit(self, frame_u8: np.ndarray) -> Future:
        """Enqueue one (H, W, 3) uint8 frame; thread-safe."""
        frame_u8 = np.asarray(frame_u8)
        if frame_u8.shape != (*self.hw, 3) or frame_u8.dtype != np.uint8:
            raise ValueError(
                f"expected {(*self.hw, 3)} uint8, got "
                f"{frame_u8.shape} {frame_u8.dtype}"
            )
        fut: Future = Future()
        # the lock makes closed-check + enqueue atomic vs close(): without
        # it a submit could land BEHIND the shutdown sentinel and strand
        # its future in a queue no thread reads
        with self._lock:
            if self._closed:
                raise RuntimeError("server is closed")
            # copy: the client may reuse its buffer while the request waits
            self._q.put((frame_u8.copy(), fut))
        return fut

    def close(self) -> None:
        """Stop the dispatcher after serving everything already queued
        (the shutdown sentinel enters the FIFO behind them)."""
        with self._lock:
            if self._closed:
                return
            self._closed = True
            self._q.put(None)  # wake the dispatcher
        self._thread.join()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- dispatcher ----------------------------------------------------------

    def _dispatch(self, frames):  # pragma: no cover - abstract
        raise NotImplementedError

    def _collect(self) -> Optional[list]:
        """Block for the first request, then drain up to max_batch-1 more,
        waiting at most max_delay_s for stragglers."""
        first = self._q.get()
        if first is None:
            return None
        reqs = [first]
        t_end = time.perf_counter() + self.max_delay_s
        while len(reqs) < self.max_batch:
            timeout = t_end - time.perf_counter()
            try:
                item = self._q.get(timeout=max(0.0, timeout))
            except queue.Empty:
                break
            if item is None:
                self._q.put(None)  # re-signal shutdown after this batch
                break
            reqs.append(item)
        return reqs

    def _loop(self) -> None:
        while True:
            reqs = self._collect()
            if reqs is None:
                break
            # claim each future; a client may have cancelled while queued —
            # resolving a CANCELLED future raises InvalidStateError and
            # would kill this thread (hanging every other request)
            reqs = [(f, fut) for f, fut in reqs
                    if fut.set_running_or_notify_cancel()]
            if not reqs:
                continue
            try:
                results = self._dispatch([f for f, _ in reqs])
            except Exception as e:  # surface failures on every waiter
                for _, fut in reqs:
                    fut.set_exception(e)
                continue
            self.batches_dispatched += 1
            self.frames_served += len(reqs)
            for res, (_, fut) in zip(results, reqs):
                fut.set_result(res)
        # shutdown: fail anything still queued
        while True:
            try:
                item = self._q.get_nowait()
            except queue.Empty:
                break
            if item is not None and item[1].set_running_or_notify_cancel():
                item[1].set_exception(RuntimeError("server closed"))

    def _pad(self, frames) -> np.ndarray:
        """Pad to the ONE compiled batch shape; padded rows discarded."""
        return np.stack(frames + [frames[-1]] * (self.max_batch - len(frames)))


class DepthServer(_DynamicBatcher):
    """Dynamic-batching depth service over one estimator.

    All frames must share one resolution (``hw``) — one static-shape
    executable; run one server per resolution class (cf. MultiStream's
    per-(H, W) bucketing).

    Usage::

        srv = DepthServer(est, (480, 640), max_batch=8, max_delay_ms=5)
        fut = srv.submit(frame_u8)        # thread-safe, returns a Future
        depth_u8 = fut.result()
        srv.close()
    """

    def __init__(self, estimator, hw: Tuple[int, int], max_batch: int = 8,
                 max_delay_ms: float = 5.0, output: str = "u8"):
        import inspect

        self.estimator = estimator
        hw = (int(hw[0]), int(hw[1]))
        # signature check, not try/except TypeError: a TypeError raised
        # INSIDE a modern _batched_fn must not silently downgrade to f32
        params = inspect.signature(estimator._batched_fn).parameters
        if "output" in params:
            self._fn = estimator._batched_fn(hw, output=output)
        else:  # estimator stand-in with the old signature
            self._fn = estimator._batched_fn(hw)
        super().__init__(hw, max_batch, max_delay_ms)

    def submit(self, frame_u8: np.ndarray) -> Future:
        """Enqueue one (H, W, 3) uint8 frame; resolves to its (H, W)
        depth output (u8 by default — the device-postprocessed cast)."""
        return super().submit(frame_u8)

    def _dispatch(self, frames):
        preds = np.asarray(self._fn(self.estimator.params, self._pad(frames)))
        # copy: preds[i] is a view pinning the whole padded batch in host
        # memory for as long as the client keeps it
        return [preds[i].copy() for i in range(len(frames))]


class FusedDepthServer(_DynamicBatcher):
    """Dynamic-batching service for the config-4 FUSED pipeline: each
    request resolves to the fused program's full output dict (mesh, iris
    circles, pose fallback, device-postprocessed ``vis_u8``, depth
    samples — runtime/fused.py::make_fused_iris_frame_fn's contract).

    Stateless by design — requests are independent frames, so the
    body-fallback sampling points (a per-STREAM memory in the reference
    loop) are zeros; ``fallback_sample`` is only meaningful for stateful
    stream clients, which use FusedVidStream instead. Batching runs both
    ``lax.cond`` branches per frame under vmap (PARITY #13), and the saved
    (K-1) round trips dominate exactly as measured for the micro-batched
    stream path (BASELINE.md)."""

    def __init__(self, estimator, detector, hw: Tuple[int, int],
                 max_batch: int = 8, max_delay_ms: float = 5.0):
        import jax

        from depth_estimation_tpu.runtime.fused import FusedFrameRunner

        # capability check on the DETECTOR (FusedVidStream's criterion,
        # stream.py) — runner.mesh is just a constructor flag and would
        # pass for any object, deferring the failure to the first dispatch
        if not (hasattr(detector, "_face_det_params")
                and hasattr(detector, "_mesh_params")
                and hasattr(detector, "_pose_params")):
            raise ValueError(
                "FusedDepthServer needs a fused-capable PersonDetector "
                "(with _face_det_params/_mesh_params/_pose_params)"
            )
        self._jax = jax
        self._runner = FusedFrameRunner(estimator, detector,
                                        emit_depth_map=False)
        super().__init__(hw, max_batch, max_delay_ms)

    def submit(self, frame_u8: np.ndarray) -> Future:
        """Enqueue one (H, W, 3) uint8 frame; resolves to the fused output
        dict for that frame."""
        return super().submit(frame_u8)

    def _dispatch(self, frames):
        out = self._jax.device_get(self._runner.batched(self._pad(frames)))
        return [{k: np.array(v[i]) for k, v in out.items()}
                for i in range(len(frames))]


class BucketedDepthServer:
    """Route mixed-resolution requests to per-(H, W) DepthServers — the
    online mirror of MultiStream's resolution bucketing (one static-shape
    executable per bucket).

    Buckets are created lazily on first sight of a resolution (first
    request pays that bucket's compile); call :meth:`warm` up front for
    the resolutions you expect to avoid mid-serving compile stalls."""

    def __init__(self, estimator, max_batch: int = 8,
                 max_delay_ms: float = 5.0, output: str = "u8",
                 max_buckets: int = 8):
        """``max_buckets`` bounds the lazily-created servers: each bucket
        costs a dispatcher thread + a compiled executable for the process
        lifetime, so an unconstrained resolution mix (or an adversarial
        front end walking resolutions) must be rejected, not absorbed."""
        self.estimator = estimator
        self.max_batch = max_batch
        self.max_delay_ms = max_delay_ms
        self.output = output
        self.max_buckets = max(1, int(max_buckets))
        self._servers: dict = {}
        self._lock = threading.Lock()
        self._closed = False

    def _server_for(self, hw: Tuple[int, int]) -> DepthServer:
        with self._lock:
            if self._closed:
                raise RuntimeError("server is closed")
            srv = self._servers.get(hw)
            if srv is None:
                if len(self._servers) >= self.max_buckets:
                    raise ValueError(
                        f"resolution {hw} would exceed max_buckets="
                        f"{self.max_buckets} (existing: "
                        f"{sorted(self._servers)})"
                    )
                srv = self._servers[hw] = DepthServer(
                    self.estimator, hw, max_batch=self.max_batch,
                    max_delay_ms=self.max_delay_ms, output=self.output,
                )
            return srv

    def warm(self, hw: Tuple[int, int]) -> None:
        """Pre-create (and pre-compile, via a zero frame) one bucket."""
        srv = self._server_for((int(hw[0]), int(hw[1])))
        srv.submit(np.zeros((*srv.hw, 3), np.uint8)).result()

    def submit(self, frame_u8: np.ndarray) -> Future:
        """Enqueue one (H, W, 3) uint8 frame of ANY resolution."""
        frame_u8 = np.asarray(frame_u8)
        if frame_u8.ndim != 3 or frame_u8.shape[-1] != 3 \
                or frame_u8.dtype != np.uint8:
            raise ValueError(
                f"expected (H, W, 3) uint8, got {frame_u8.shape} "
                f"{frame_u8.dtype}"
            )
        return self._server_for(frame_u8.shape[:2]).submit(frame_u8)

    def close(self) -> None:
        with self._lock:
            if self._closed:
                return
            self._closed = True
            servers = list(self._servers.values())
        for srv in servers:
            srv.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    @property
    def stats(self) -> dict:
        """Per-bucket (batches_dispatched, frames_served); snapshot taken
        under the lock — a concurrent first-seen submit may be inserting a
        bucket while a monitor iterates."""
        with self._lock:
            items = list(self._servers.items())
        return {hw: (s.batches_dispatched, s.frames_served)
                for hw, s in items}
