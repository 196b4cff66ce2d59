"""Streaming video orchestrators (L3): VidStream depth-only and fused.

Behavioral equivalents of the reference's two ``VidStream`` classes:

* ``VidStream`` — depth-only loop (reference: depth_midas.py:38-85): read
  frame → predict → raw uint8 cast (wraparound) → gray→3ch → MJPG write.
* ``FusedVidStream`` — iris/pose + depth fusion loop (reference:
  midas_mediapipe.py:11-159): per-frame detection reset, findIris, depth,
  depth-at-iris sampling, rel→abs, iris or body-pose distance path, HUD
  messages, side-by-side output, per-stage timing with end-of-run FPS report.

TPU-first changes (SURVEY.md §3.5): decode runs on a background thread
(PrefetchSource), the depth network is one fused XLA program per frame
(estimator.frame_fn), and the loop is software-pipelined one frame deep so
host decode/encode overlaps device compute — the reference runs all stages
sequentially on one thread.
"""

from __future__ import annotations

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
                 verbose: bool = True, start_frame: int = 0, retries: int = 2):
        """start_frame: skip the first N frames before processing —
        deterministic resume of an interrupted stream (SURVEY.md §5).
        retries: decode-failure retry budget per frame (ResilientSource)."""
        self.estimator = estimator
        self.video = ResilientSource(open_source(src), retries=retries)
        if prefetch and needs_prefetch(self.video.inner):
            self.video = PrefetchSource(self.video)
        self.start_frame = int(start_frame)
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
        pending = None  # one-frame software pipeline: device result in flight
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
            with self.timer.stage("depth"):
                arr = self.estimator.predict_device(self.frame)
            if pending is not None:
                self._write(pending)
            pending = arr
        if pending is not None:
            self._write(pending)
        dropped = getattr(self.video, "frames_dropped", 0)
        if dropped and self.verbose:
            print(f"Dropped {dropped} undecodable frames.")
        self.video.release()
        self.writer.release()
        if self.log.enabled:
            self.log.log("stream_end", frames=self.cnt, frames_dropped=dropped,
                         **self.timer.summary())
            self.log.close()

    def _write(self, device_pred):
        """uint8 cast (wraparound preserved) + gray→3ch (depth_midas.py:81-85)."""
        prediction = np.asarray(device_pred)
        self.writer.write(merge_gray3(prediction.astype(np.uint8)))

    # reference alias
    def write_output(self):
        self._write(self.estimator.predict_device(self.frame))


class FusedVidStream:
    """Fused iris/pose + depth stream (reference: midas_mediapipe.py:11-159)."""

    def __init__(self, estimator, detector, face, src=None, output=None,
                 verbose: bool = True, fused: bool = True, start_frame: int = 0,
                 retries: int = 2):
        """fused=True computes depth + face detection + FaceMesh/iris in ONE
        XLA dispatch per frame (runtime/fused.py — the landmark branch is a
        lax.cond taken on detection hits); only the BlazePose fallback is a
        separate dispatch, on miss frames.
        retries: decode-failure retry budget per frame (ResilientSource)."""
        self.detector = detector
        self.estimator = estimator
        self.face = face
        self.video = ResilientSource(open_source(src), retries=retries)
        if needs_prefetch(self.video.inner):
            self.video = PrefetchSource(self.video)
        self.start_frame = int(start_frame)
        self._fused_runner = None
        self._fused_pose = None  # device pose landmarks for the current frame
        if fused and hasattr(detector, "_face_det"):
            from depth_estimation_tpu.runtime.fused import FusedFrameRunner

            self._fused_runner = FusedFrameRunner(estimator, detector)
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
        while True:
            if not self.video.is_opened():
                print("Error opening file.")
                print(f"Sucessfully read {self.cnt} out of {self.video.frame_count} frames.")
                break
            self.status, self.frame = self.video.read()
            if not self.status:
                # end-of-stream report (midas_mediapipe.py:118-122)
                print("Performance stats in FPS:")
                for stage in ("iris", "body", "depth"):
                    if self.performance[stage]:
                        print(f"{stage.capitalize()}: {1 // median(self.performance[stage])}")
                break
            self.cnt += 1
            if self.verbose:
                print(f"Frame: {self.cnt}")

            self.face.mesh = None  # per-frame detection reset (:51)
            if self._fused_runner is not None:
                # one dispatch: depth + detection (+ mesh/iris when the
                # runner compiles the full iris program)
                with self.timer.stage("depth"):
                    out = self._fused_runner(self.frame)
                self._fused_pose = None
                with self.timer.stage("iris"):
                    if len(out) == 4:
                        depth_dev, boxes, scores, valid = out
                        self.detector.findIris(self.frame, detection=(boxes, scores, valid))
                    else:
                        (depth_dev, boxes, scores, valid, mesh, mscore,
                         l_c, l_r, r_c, r_r) = out[:10]
                        found = bool(np.asarray(valid)[0])
                        self.detector.set_fused_mesh(
                            self.frame, mesh, mscore, l_c, l_r, r_c, r_r,
                            found=found,
                        )
                        if len(out) == 12 and not found:
                            # pose fallback already computed on device
                            self._fused_pose = (out[10], out[11])
            else:
                with self.timer.stage("depth"):
                    depth_dev = self.estimator.predict_device(self.frame)
                with self.timer.stage("iris"):
                    self.detector.findIris(self.frame)
            depth_frame = np.asarray(depth_dev)

            # sampling falls back to stored body head points when no mesh;
            # on the very first frames neither may exist yet (the reference
            # would crash on a face-less first frame, face.py:112)
            if self.face.mesh is not None or self.face.head_pts is not None:
                self.face.get_depth(depth_frame)
                self.face.rel2abs()
            if self.log.enabled:
                self.log.log(
                    "frame",
                    n=self.cnt,
                    ri_depth=float(self.face.ri_depth),
                    abs_depth=float(self.face.abs_depth),
                    face_found=self.face.mesh is not None,
                )
            if self.face.mesh is not None and not (self.face.l_iris["radius"] or 0) > 0:
                # degenerate iris fit — route through the body-pose fallback
                # instead of dividing by a zero diameter
                self.face.mesh = None
            if self.face.mesh is not None:
                self._iris_path(depth_frame)
            else:
                self._body_path(depth_frame)
        dropped = getattr(self.video, "frames_dropped", 0)
        if dropped and self.verbose:
            print(f"Dropped {dropped} undecodable frames.")
        if self.log.enabled:
            self.log.log("stream_end", frames=self.cnt, frames_dropped=dropped,
                         **self.timer.summary())
            self.log.close()
        self.video.release()
        self.writer.release()

    # -- iris path (midas_mediapipe.py:64-94) -------------------------------

    def _iris_path(self, depth_frame):
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
        vis = self.to_video_frame(depth_frame)
        self.write_messages(self._depth_messages(), vis)
        self.write_output(vis)

    # -- body fallback path (midas_mediapipe.py:95-117) ----------------------

    def _body_path(self, depth_frame):
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
        vis = self.to_video_frame(depth_frame)
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
        (midas_mediapipe.py:141-150)."""
        return to_video_frame(img, faithful=True)

    def side_by_side(self, img1, img2):
        import cv2

        f1 = cv2.resize(img1, (self.w // 2, self.h // 2))
        f2 = cv2.resize(img2, (self.w // 2, self.h // 2))
        return np.hstack((f1, f2))

    def write_output(self, depth_frame):
        self.writer.write(self.side_by_side(self.frame, depth_frame))
