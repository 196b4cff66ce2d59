"""Streaming video orchestrators (L3): VidStream depth-only and fused.

Behavioral equivalents of the reference's two ``VidStream`` classes:

* ``VidStream`` — depth-only loop (reference: depth_midas.py:38-85): read
  frame → predict → raw uint8 cast (wraparound) → gray→3ch → MJPG write.
* ``FusedVidStream`` — iris/pose + depth fusion loop (reference:
  midas_mediapipe.py:11-159): per-frame detection reset, findIris, depth,
  depth-at-iris sampling, rel→abs, iris or body-pose distance path, HUD
  messages, side-by-side output, per-stage timing with end-of-run FPS report.

TPU-first changes (SURVEY.md §3.5, VERDICT r2 #1):

* decode runs on a background thread (PrefetchSource);
* the ENTIRE per-frame device pipeline — preprocess, network, bicubic
  upsample, output postprocess (the reference's uint8 wraparound cast /
  ``*5 + 10`` contrast, depth_midas.py:81-85 + midas_mediapipe.py:141-150)
  and the iris/fallback depth sampling (face.py:91-116) — is ONE jitted
  XLA program per frame, so only uint8 bytes and a few scalars cross D2H
  (≥4× fewer bytes than fetching the f32 map);
* all of a frame's outputs come back in ONE ``jax.device_get`` (each fetch
  is its own round trip — ~100 ms through a tunneled chip);
* the loop keeps ``pipeline_depth`` frames in flight (default 2) so host
  decode/HUD/encode overlaps device compute and transfer. Per-frame
  semantics are identical at any depth except the body-fallback sampling
  points, which lag one extra frame per depth step (docs/PARITY.md).

Stage timing is truthful under async dispatch: the ``depth`` stage records
dispatch→value-ready WALL spans via StageTimer.record_completion, clamped
against the previous completion so overlapping in-flight spans measure the
inter-completion interval — the reference-format FPS report states real
frame completion throughput at any pipeline_depth (runtime/timing.py).
"""

from __future__ import annotations

import time
from collections import deque
from statistics import median

import numpy as np

from depth_estimation_tpu.ops.postprocess import merge_gray3, to_video_frame
from depth_estimation_tpu.runtime.timing import StageTimer
from depth_estimation_tpu.runtime.video import (
    NullSink,
    PrefetchSource,
    ResilientSource,
    needs_prefetch,
    open_sink,
    open_source,
)


class VidStream:
    """Depth-only stream (reference: depth_midas.py:38-85)."""

    def __init__(self, estimator, src=None, output=None, prefetch: bool = True,
                 verbose: bool = True, start_frame: int = 0, retries: int = 2,
                 pipeline_depth: int = 2, microbatch: int = 1):
        """start_frame: skip the first N frames before processing —
        deterministic resume of an interrupted stream (SURVEY.md §5).
        retries: decode-failure retry budget per frame (ResilientSource).
        pipeline_depth: frames/batches in flight on device before the oldest
        is fetched/written (≥1; 1 = fully synchronous).
        microbatch: frames per device dispatch (≥1). K>1 reads K frames,
        runs ONE batched program and fetches K u8 frames in ONE value fetch —
        amortizing the per-dispatch/per-fetch round trip K ways (the
        dominant e2e cost on remote-attached chips; BASELINE.md round 3).
        Output frames and their order are identical to K=1; the tradeoff is
        ~K frames of added latency, so it suits file→file transcoding, not
        interactive use."""
        self.estimator = estimator
        self.video = ResilientSource(open_source(src), retries=retries)
        if prefetch and needs_prefetch(self.video.inner):
            self.video = PrefetchSource(self.video)
        self.start_frame = int(start_frame)
        self.pipeline_depth = max(1, int(pipeline_depth))
        self.microbatch = max(1, int(microbatch))
        self.FPS = 1 / 30  # reference constant, unused for pacing (depth_midas.py:45)
        self.FPS_MS = int(self.FPS * 1000)
        self.w = int(self.video.width)
        self.h = int(self.video.height)
        self.writer = open_sink(output, (self.w, self.h), fps=20)
        self.status = None
        self.frame = None
        self.cnt = 0
        self.verbose = verbose
        self.timer = StageTimer()
        from depth_estimation_tpu.runtime.logging_utils import JsonLogger

        self.log = JsonLogger()

    def update(self):
        """Run the loop to EOF (reference semantics incl. prints)."""
        for _ in range(self.start_frame):  # deterministic resume
            ok, _f = self.video.read()
            if not ok:
                break
            self.cnt += 1
        if self.microbatch > 1:
            self._update_microbatched()
        else:
            self._update_per_frame()
        dropped = getattr(self.video, "frames_dropped", 0)
        if dropped and self.verbose:
            print(f"Dropped {dropped} undecodable frames.")
        self.video.release()
        self.writer.release()
        if self.log.enabled:
            self.log.log("stream_end", frames=self.cnt, frames_dropped=dropped,
                         **self.timer.summary())
            self.log.close()

    def _update_per_frame(self):
        inflight = deque()  # (device u8 array, t_dispatch, cpu_dispatch)
        while True:
            if not self.video.is_opened():
                print("Error opening file.")
                print(f"Sucessfully read {self.cnt} out of {self.video.frame_count} frames.")
                break
            self.status, self.frame = self.video.read()
            if not self.status:
                break
            self.cnt += 1
            if self.verbose:
                print(f"Frame: {self.cnt}")
            c0 = time.process_time()
            t0 = time.perf_counter()
            arr = self._predict_u8(self.frame)
            inflight.append((arr, t0, time.process_time() - c0))
            if len(inflight) >= self.pipeline_depth:
                self._complete_one(inflight)
        while inflight:
            self._complete_one(inflight)

    def _update_microbatched(self):
        """K-frames-per-dispatch loop: one batched program, one K-frame u8
        fetch per tick (identical outputs/order to the per-frame loop; the
        per-frame 'depth' spans record the amortized batch wall, so the FPS
        report still states per-frame completion throughput)."""
        K = self.microbatch
        est = self.estimator
        try:
            fn = est._batched_fn((self.h, self.w), output="u8")
        except TypeError:  # estimator stand-in with the old signature
            fn = est._batched_fn((self.h, self.w))
        inflight = deque()  # (device (K,H,W) u8, n_valid, t_dispatch, cpu_dispatch)
        eof = False
        while not eof:
            if not self.video.is_opened():
                print("Error opening file.")
                print(f"Sucessfully read {self.cnt} out of {self.video.frame_count} frames.")
                break
            # fresh buffer per tick: the dispatched program may still be
            # reading the previous tick's host memory
            batch = np.empty((K, self.h, self.w, 3), np.uint8)
            m = 0
            while m < K:
                self.status, frame = self.video.read()
                if not self.status:
                    eof = True
                    break
                self.frame = frame
                batch[m] = frame
                m += 1
                self.cnt += 1
                if self.verbose:
                    print(f"Frame: {self.cnt}")
            if m == 0:
                break
            if m < K:  # tail tick: pad with the last decoded frame (one
                batch[m:] = batch[m - 1]  # compiled shape; padding discarded)
            c0 = time.process_time()
            t0 = time.perf_counter()
            arr = fn(est.params, batch)
            inflight.append((arr, m, t0, time.process_time() - c0))
            if len(inflight) >= self.pipeline_depth:
                self._complete_batch(inflight)
        while inflight:
            self._complete_batch(inflight)

    def _complete_batch(self, inflight):
        """Fetch + write the oldest in-flight micro-batch (ONE value fetch
        for its K frames); record K amortized per-frame depth spans."""
        arr, m, t0, cpu_d = inflight.popleft()
        c0 = time.process_time()
        preds = np.asarray(arr)  # the value fetch — one round trip for K frames
        self.timer.record_completion(
            "depth", t0, cpu_d + time.process_time() - c0, frames=m
        )
        for i in range(m):
            self._write_gray(preds[i])

    def _predict_u8(self, frame):
        """Dispatch the u8-output frame program (postprocess cast on device);
        estimator stand-ins without the u8 path fall back to the f32 program
        with a host cast at completion."""
        fn = getattr(self.estimator, "predict_device_u8", None)
        if fn is not None:
            return fn(frame)
        return self.estimator.predict_device(frame)

    def _complete_one(self, inflight):
        """Fetch + write the oldest in-flight frame; the depth stage records
        the dispatch→value-ready wall span (truthful completion time)."""
        arr, t0, cpu_d = inflight.popleft()
        c0 = time.process_time()
        gray = np.asarray(arr)  # the value fetch — the only real sync point
        self.timer.record_completion(
            "depth", t0, cpu_d + time.process_time() - c0
        )
        self._write_gray(gray)

    def _write_gray(self, gray):
        """uint8 cast (wraparound preserved) + gray→3ch (depth_midas.py:81-85).
        The cast already happened on device for the u8 path; host-cast
        otherwise."""
        if gray.dtype != np.uint8:
            gray = gray.astype(np.uint8)
        self.writer.write(merge_gray3(gray))

    # reference alias
    def write_output(self):
        self._write_gray(np.asarray(self._predict_u8(self.frame)))


class FusedVidStream:
    """Fused iris/pose + depth stream (reference: midas_mediapipe.py:11-159)."""

    def __init__(self, estimator, detector, face, src=None, output=None,
                 verbose: bool = True, fused: bool = True, start_frame: int = 0,
                 retries: int = 2, pipeline_depth: int = 2, microbatch: int = 1):
        """fused=True computes depth + face detection + FaceMesh/iris +
        BlazePose fallback + output postprocess + depth sampling in ONE XLA
        dispatch per frame (runtime/fused.py), fetched with ONE device_get.
        retries: decode-failure retry budget per frame (ResilientSource).
        pipeline_depth: fused-mode frames in flight before the oldest is
        fetched (1 = synchronous, exact reference ordering; the default 2
        overlaps host work with device compute — see docs/PARITY.md for the
        one-frame-staler body-fallback sampling points this implies).
        microbatch: frames per device dispatch (fused mode only). K>1 vmaps
        the fused program over K frames — one dispatch + one fetch per K
        frames (docs/PARITY.md #13; body-fallback points are up to
        K·pipeline_depth frames stale)."""
        self.detector = detector
        self.estimator = estimator
        self.face = face
        self.video = ResilientSource(open_source(src), retries=retries)
        if needs_prefetch(self.video.inner):
            self.video = PrefetchSource(self.video)
        self.start_frame = int(start_frame)
        self.pipeline_depth = max(1, int(pipeline_depth))
        self.microbatch = max(1, int(microbatch))
        self._fused_runner = None
        self._fused_pose = None  # device pose landmarks for the current frame
        # device-side depth sampling implements the faithful get_depth
        # quirks; a faithful=False FaceDet keeps host sampling (and thus the
        # f32 map in the fetch)
        self._device_samples = bool(getattr(face, "faithful", True))
        if fused and hasattr(detector, "_face_det"):
            from depth_estimation_tpu.runtime.fused import FusedFrameRunner

            self._fused_runner = FusedFrameRunner(
                estimator, detector, emit_depth_map=not self._device_samples
            )
        if self.microbatch > 1 and (
            self._fused_runner is None or not self._fused_runner.mesh
        ):
            raise ValueError("microbatch>1 requires the fused (mesh) pipeline")
        self.FPS = 1 / 30
        self.FPS_MS = int(self.FPS * 1000)
        self.w = int(self.video.width)
        self.h = int(self.video.height)
        # reference writer is (w, h//2): two half-size frames side by side
        # (midas_mediapipe.py:27)
        self.writer = open_sink(output, (self.w, self.h // 2), fps=20)
        self.status = False
        self.cnt = 0
        self.timer = StageTimer()
        self.performance = self.timer.performance  # reference-compatible dict
        self.verbose = verbose
        from depth_estimation_tpu.runtime.logging_utils import JsonLogger

        self.log = JsonLogger()

    def stream(self):
        for _ in range(self.start_frame):  # deterministic resume
            ok, _f = self.video.read()
            if not ok:
                break
            self.cnt += 1
        if self.microbatch > 1:
            return self._stream_microbatched()
        inflight = deque()  # (frame, n, out handles, had_pts, t_dispatch, cpu_dispatch)
        while True:
            if not self.video.is_opened():
                while inflight:
                    self._process_fused(inflight.popleft())
                print("Error opening file.")
                print(f"Sucessfully read {self.cnt} out of {self.video.frame_count} frames.")
                break
            self.status, self.frame = self.video.read()
            if not self.status:
                while inflight:  # drain before the report covers all frames
                    self._process_fused(inflight.popleft())
                # end-of-stream report (midas_mediapipe.py:118-122); in fused
                # mode 'iris' has no separate stage (it rides the single
                # dispatch) so only stages with data print — docs/PARITY.md
                print("Performance stats in FPS:")
                for stage in ("iris", "body", "depth"):
                    if self.performance[stage]:
                        print(f"{stage.capitalize()}: {1 // median(self.performance[stage])}")
                break
            self.cnt += 1
            if self.verbose:
                print(f"Frame: {self.cnt}")

            if self._fused_runner is not None and self._fused_runner.mesh:
                # single dispatch: depth + detect + mesh/iris (+ pose
                # fallback) + postprocess + depth sampling
                pts = self.face.head_pts
                had_pts = pts is not None
                pts_arr = None
                if had_pts:
                    pts_arr = np.asarray(
                        [[int(pts[0][0]), int(pts[0][1])],
                         [int(pts[1][0]), int(pts[1][1])]], np.int32)
                c0 = time.process_time()
                t0 = time.perf_counter()
                out = self._fused_runner(self.frame, fallback_pts=pts_arr)
                cpu_d = time.process_time() - c0
                inflight.append((self.frame, self.cnt, out, had_pts, t0, cpu_d))
                if len(inflight) >= self.pipeline_depth:
                    self._process_fused(inflight.popleft())
                continue

            # staged path (fused=False, or depth+detect-only runner)
            self.face.mesh = None  # per-frame detection reset (:51)
            self._fused_pose = None
            if self._fused_runner is not None:
                with self.timer.stage("depth"):
                    depth_dev, boxes, scores, valid = self._fused_runner(self.frame)
                    depth_frame = np.asarray(depth_dev)
                with self.timer.stage("iris"):
                    self.detector.findIris(self.frame, detection=(boxes, scores, valid))
            else:
                with self.timer.stage("depth"):
                    depth_dev = self.estimator.predict_device(self.frame)
                    depth_frame = np.asarray(depth_dev)
                with self.timer.stage("iris"):
                    self.detector.findIris(self.frame)

            # sampling falls back to stored body head points when no mesh;
            # on the very first frames neither may exist yet (the reference
            # would crash on a face-less first frame, face.py:112)
            if self.face.mesh is not None or self.face.head_pts is not None:
                self.face.get_depth(depth_frame)
                self.face.rel2abs()
            self._log_frame()
            self._route_frame(self.to_video_frame(depth_frame))
        dropped = getattr(self.video, "frames_dropped", 0)
        if dropped and self.verbose:
            print(f"Dropped {dropped} undecodable frames.")
        if self.log.enabled:
            self.log.log("stream_end", frames=self.cnt, frames_dropped=dropped,
                         **self.timer.summary())
            self.log.close()
        self.video.release()
        self.writer.release()

    # -- fused-mode micro-batched loop (docs/PARITY.md #13) ------------------

    def _stream_microbatched(self):
        """K frames per vmapped fused dispatch, one device_get per tick;
        the per-frame host half runs at demux in frame order."""
        K = self.microbatch
        inflight = deque()  # (frames list, first_n, out handles, had_pts, t0, cpu_d)
        eof = open_error = False
        while not eof:
            if not self.video.is_opened():
                while inflight:
                    self._process_fused_batch(inflight.popleft())
                print("Error opening file.")
                print(f"Sucessfully read {self.cnt} out of {self.video.frame_count} frames.")
                open_error = True
                break
            frames = []
            while len(frames) < K:
                self.status, frame = self.video.read()
                if not self.status:
                    eof = True
                    break
                frames.append(frame)
                self.cnt += 1
                if self.verbose:
                    print(f"Frame: {self.cnt}")
            if frames:
                # tail tick pads with the last decoded frame (one compiled
                # shape); padded results are never demuxed
                batch = np.stack(frames + [frames[-1]] * (K - len(frames)))
                pts = self.face.head_pts
                had_pts = pts is not None
                pts_arr = np.zeros((K, 2, 2), np.int32)
                if had_pts:
                    pts_arr[:] = [[int(pts[0][0]), int(pts[0][1])],
                                  [int(pts[1][0]), int(pts[1][1])]]
                c0 = time.process_time()
                t0 = time.perf_counter()
                out = self._fused_runner.batched(batch, fallback_pts=pts_arr)
                first_n = self.cnt - len(frames) + 1
                inflight.append(
                    (frames, first_n, out, had_pts, t0,
                     time.process_time() - c0))
                if len(inflight) >= self.pipeline_depth:
                    self._process_fused_batch(inflight.popleft())
        while inflight:
            self._process_fused_batch(inflight.popleft())
        if not open_error:
            # end-of-stream report (midas_mediapipe.py:118-122)
            print("Performance stats in FPS:")
            for stage in ("iris", "body", "depth"):
                if self.performance[stage]:
                    print(f"{stage.capitalize()}: {1 // median(self.performance[stage])}")
        dropped = getattr(self.video, "frames_dropped", 0)
        if dropped and self.verbose:
            print(f"Dropped {dropped} undecodable frames.")
        if self.log.enabled:
            self.log.log("stream_end", frames=self.cnt, frames_dropped=dropped,
                         **self.timer.summary())
            self.log.close()
        self.video.release()
        self.writer.release()

    def _process_fused_batch(self, entry):
        """Fetch a tick's K-frame outputs in one device_get, then run the
        per-frame host half for each valid frame in order; the depth stage
        records K amortized completion spans."""
        import jax

        frames, first_n, out, had_pts, t0, cpu_d = entry
        c0 = time.process_time()
        out = jax.device_get(out)  # ONE round trip for the whole tick
        self.timer.record_completion(
            "depth", t0, cpu_d + time.process_time() - c0, frames=len(frames)
        )
        for j, frame in enumerate(frames):
            self._host_frame(frame, {k: v[j] for k, v in out.items()},
                             had_pts, first_n + j)

    # -- fused-mode frame completion ----------------------------------------

    def _process_fused(self, entry):
        """Fetch ALL of a dispatched frame's outputs in one device_get, then
        run the host half: face-state fill, depth-sample recording, HUD and
        output routing. Called in dispatch order."""
        import jax

        frame, n, out, had_pts, t0, cpu_d = entry
        c0 = time.process_time()
        out = jax.device_get(out)  # ONE round trip for every output
        self.timer.record_completion(
            "depth", t0, cpu_d + time.process_time() - c0
        )
        self._host_frame(frame, out, had_pts, n)

    def _host_frame(self, frame, out, had_pts, n):
        """Host half for ONE frame's fetched outputs: face-state fill,
        depth-sample recording, HUD and output routing. ``n`` is the
        1-based number of THIS frame (self.cnt has already advanced past
        it while it was in flight)."""
        self.frame = frame
        self.face.mesh = None  # per-frame detection reset (:51)
        found = bool(out["valid"][0])
        self.detector.set_fused_mesh(
            frame, out["mesh"], out["mesh_score"], out["l_center"],
            out["l_radius"], out["r_center"], out["r_radius"], found=found,
        )
        self._fused_pose = None
        if not found and "pose_lm" in out:
            self._fused_pose = (out["pose_lm"], out["pose_score"])

        # depth sampling — device-computed scalars in the faithful mode;
        # reference order: sample before the iris/body path choice
        # (midas_mediapipe.py:62)
        if self._device_samples:
            if found:
                self.face.record_depth(float(out["iris_sample"]))
                self.face.rel2abs()
            elif had_pts:
                self.face.record_depth(float(out["fallback_sample"]))
                self.face.rel2abs()
            elif self.face.head_pts is not None and "ears_sample" in out:
                # pipelined transition frame: head points appeared only
                # after this frame was dispatched — sample at the frame's
                # own device-computed ear pixels (docs/PARITY.md)
                self.face.record_depth(float(out["ears_sample"]))
                self.face.rel2abs()
        else:
            if self.face.mesh is not None or self.face.head_pts is not None:
                self.face.get_depth(out["depth"])
                self.face.rel2abs()
        self._log_frame(n)
        # output frame: postprocessed on device (vis_u8), host just merges
        self._route_frame(merge_gray3(out["vis_u8"]))

    def _log_frame(self, n=None):
        if self.log.enabled:
            self.log.log(
                "frame",
                n=self.cnt if n is None else n,
                ri_depth=float(self.face.ri_depth),
                abs_depth=float(self.face.abs_depth),
                face_found=self.face.mesh is not None,
            )

    def _route_frame(self, vis):
        """Degenerate-iris guard + iris/body path choice on the current
        face state; ``vis`` is the ready 3-channel u8 depth visualization."""
        if self.face.mesh is not None and not (self.face.l_iris["radius"] or 0) > 0:
            # degenerate iris fit — route through the body-pose fallback
            # instead of dividing by a zero diameter
            self.face.mesh = None
        if self.face.mesh is not None:
            self._iris_path(vis)
        else:
            self._body_path(vis)

    # -- iris path (midas_mediapipe.py:64-94) -------------------------------

    def _iris_path(self, vis):
        self.detector.visualize(self.frame)
        l_diameter = self.face.l_iris["radius"] * 2
        self.face.s2c_dist(self.face.w_iris, l_diameter)
        x1, y1 = self.face.mesh[self.detector.HEAD[0]]
        x2, y2 = self.face.mesh[self.detector.HEAD[1]]
        self.face.get_headw((x1, y1), (x2, y2))
        messages = [
            f"S2C Distance (ft) - iris: {str(self.face.s2c_d)}",
            f"Head width (in): {str(round((self.face.head_w / 10) / 2.54, 2))}",
            f"head_w_mm: {str(self.face.head_w)}",
            f"focal length: {round(self.face.f, 2)}",
        ]
        self.write_messages(messages, self.frame)
        self.write_messages(self._depth_messages(), vis)
        self.write_output(vis)

    # -- body fallback path (midas_mediapipe.py:95-117) ----------------------

    def _body_path(self, vis):
        self.face.rel2abs()
        self._put_text(self.frame, "Face not detected. Using body pose estimates.", (70, 50), (255, 0, 0))
        with self.timer.stage("body"):
            if self._fused_pose is not None:
                # BlazePose already ran in the fused dispatch (cond branch)
                self.frame, head_pts = self.detector.body_from_fused(
                    self.frame, *self._fused_pose
                )
            else:
                self.frame, head_pts = self.detector.findBody(self.frame)
        # get_headw scales by the iris radius (face.py:88) — only available
        # once a face has been seen at least once; the reference crashes on a
        # never-detected face here, we skip the measurement instead
        if head_pts and len(head_pts) >= 2 and (self.face.l_iris["radius"] or 0) > 0:
            self.face.get_headw(head_pts[0], head_pts[1])
            self.face.s2c_dist(median(self.face.head_measurements), self.face.head_w)
            self._put_text(self.frame, f"S2C dist (ft): {self.face.s2c_d}", (50, 150), (0, 255, 0))
        self.write_messages(self._depth_messages(), vis)
        self.write_output(vis)

    def _depth_messages(self):
        msgs = [
            f"Relative Inverse Depth: {round(float(self.face.ri_depth), 2)}",
            f"Absolute Depth: {round(float(self.face.abs_depth), 2)}",
        ]
        if self.face.s2c_ds and self.face.abs_depths:
            msgs.append(f"RMSE: {round(self.face.rmse(), 2)}")
            msgs.append(f"MAE: {round(self.face.mae(), 2)}")
        return msgs

    # -- rendering helpers (host-side HUD, reference C8) ---------------------

    def _put_text(self, img, text, org, color):
        try:
            import cv2

            cv2.putText(img, text, org, cv2.FONT_HERSHEY_SIMPLEX, 1, color, 2, cv2.LINE_AA)
        except ImportError:
            pass

    def detect_points(self, img):
        """API-parity with the reference's (dead) helper
        (midas_mediapipe.py:136-139): iris first, body on miss."""
        self.detector.findIris(img)
        if self.face.mesh is None:
            self.detector.findBody(img)

    def write_messages(self, messages, img):
        for idx, m in enumerate(messages):
            self._put_text(img, m, (50, 50 + idx * 50), (0, 255, 0))

    def to_video_frame(self, img):
        """uint8 cast + *=5 contrast + +=10 brightness with wraparound
        (midas_mediapipe.py:141-150). The fused path computes this on device
        (ops/postprocess.py::to_video_frame_u8_jax); this host version
        serves the staged path and API parity."""
        return to_video_frame(img, faithful=True)

    def side_by_side(self, img1, img2):
        import cv2

        f1 = cv2.resize(img1, (self.w // 2, self.h // 2))
        f2 = cv2.resize(img2, (self.w // 2, self.h // 2))
        return np.hstack((f1, f2))

    def write_output(self, depth_frame):
        self.writer.write(self.side_by_side(self.frame, depth_frame))
