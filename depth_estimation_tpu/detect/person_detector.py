"""PersonDetector — reference detectors.py API on the TPU detector stack.

Mirrors ``PersonDetector`` (reference: detectors.py:6-124): landmark index
tables, ``findIris(img)`` filling ``face.mesh`` / ``face.l_iris`` /
``face.r_iris``, ``findBody(img) -> (img, head_pts)``, ``visualize(img)``.

Where the reference rebuilds the MediaPipe C++ graph every frame (the
``with FaceMesh(...)`` per call, detectors.py:48 — flagged in SURVEY.md §3.5
as a major per-frame cost), this implementation jit-compiles each stage once
and reuses it: BlazeFace detect → crop → FaceMesh landmarks, and BlazePose
for the body path. Detection+decode+NMS run as one XLA program per stage.

Weights: random-init by default (deterministic seed) — the full pipeline
runs end-to-end without MediaPipe; converted TFLite weights can be supplied
via the ``params`` argument for production accuracy.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from depth_estimation_tpu.config import (
    BODY_HEAD,
    CARD,
    HEAD,
    LEFT_EYE,
    LEFT_IRIS,
    RIGHT_EYE,
    RIGHT_IRIS,
)
from depth_estimation_tpu.detect.anchors import (
    BLAZEFACE_FRONT,
    BLAZEPOSE_DETECTOR,
    build_anchors,
    decode_boxes,
    decode_scores,
    weighted_nms,
)
from depth_estimation_tpu.detect.circle import min_enclosing_circle
from depth_estimation_tpu.models.blazeface import BlazeFace
from depth_estimation_tpu.models.blazepose import BlazePose, BlazePoseDetector
from depth_estimation_tpu.models.facemesh import FaceMeshWithIris
from depth_estimation_tpu.ops.resize import resize2d


def _init(model, shape, seed):
    return jax.jit(model.init)(jax.random.PRNGKey(seed), np.zeros(shape, np.float32))


def _wrap(p):
    """Converted TFLite trees are bare param dicts; apply() wants the
    {'params': ...} collection wrapper. An empty/None tree stays falsy so
    callers' ``_wrap(...) or _init(...)`` random-init fallback still fires."""
    if not p or "params" in p:
        return p or None
    return {"params": p}


class PersonDetector:
    """Find a single person's face mesh / iris / body pose.

    :param face: FaceDet state object mutated by findIris (as in the
        reference, detectors.py:62-64)
    :param minDetectionCon: detection confidence threshold (detectors.py:12)
    """

    def __init__(self, face, minDetectionCon: float = 0.2, params: Optional[Dict] = None, seed: int = 0):
        # face mesh indices (reference: detectors.py:17-26)
        self.LEFT_EYE = list(LEFT_EYE)
        self.RIGHT_EYE = list(RIGHT_EYE)
        self.LEFT_IRIS = list(LEFT_IRIS)
        self.RIGHT_IRIS = list(RIGHT_IRIS)
        self.HEAD = list(HEAD)
        self.BODY_HEAD = list(BODY_HEAD)
        self.CARD = list(CARD)

        self.minDetectionCon = minDetectionCon
        self.results = None
        self.w: Optional[int] = None
        self.h: Optional[int] = None
        self.body_mesh = None
        self.face = face

        if params is None:
            # auto-load any converted TFLite weights from the cache dir
            # (detect/weights.py); {} → deterministic random init
            from depth_estimation_tpu.detect.weights import load_detector_params

            params = load_detector_params()
        self._face_det = BlazeFace()
        self._face_det_params = _wrap(params.get("blazeface")) or _init(self._face_det, (1, 128, 128, 3), seed)
        self._mesh = FaceMeshWithIris()
        self._mesh_params = _wrap(params.get("facemesh")) or _init(self._mesh, (1, 192, 192, 3), seed + 1)
        self._pose_det = BlazePoseDetector()
        self._pose_det_params = _wrap(params.get("blazepose_detector")) or _init(self._pose_det, (1, 224, 224, 3), seed + 2)
        self._pose = BlazePose()
        self._pose_params = _wrap(params.get("blazepose")) or _init(self._pose, (1, 256, 256, 3), seed + 3)

        # host numpy, not jax.Arrays: device-array consts captured by the
        # jitted stages stall lowering with one D2H tunnel RPC each (see
        # estimator._make_frame_fn note)
        self._face_anchors = build_anchors(BLAZEFACE_FRONT)
        self._pose_anchors = build_anchors(BLAZEPOSE_DETECTOR)
        self._detect_jit = {}

    # -- jitted stages ------------------------------------------------------

    def _detect_fn(self, in_hw: Tuple[int, int], kind: str):
        key = (kind, in_hw)
        fn = self._detect_jit.get(key)
        if fn is not None:
            return fn
        if kind == "face":
            model, anchors, size, thresh = self._face_det, self._face_anchors, 128, self.minDetectionCon
        else:
            model, anchors, size, thresh = self._pose_det, self._pose_anchors, 224, 0.5

        @jax.jit
        def fn(params, img_u8):
            # detectors consume RGB (the reference converts before MediaPipe,
            # detectors.py:47); frames arrive BGR
            x = img_u8[..., ::-1].astype(jnp.float32) / 127.5 - 1.0
            x = resize2d(x, (size, size), method="linear", align_corners=False)
            raw_boxes, raw_scores = model.apply(params, x[None])
            boxes = decode_boxes(raw_boxes[0], anchors, float(size))
            scores = decode_scores(raw_scores[0])
            return weighted_nms(boxes, scores, iou_threshold=0.3, score_threshold=thresh)

        self._detect_jit[key] = fn
        return fn

    @functools.cached_property
    def _mesh_fn(self):
        model = self._mesh

        @jax.jit
        def fn(params, crop_u8):
            x = crop_u8.astype(jnp.float32) / 255.0
            x = resize2d(x, (192, 192), method="linear", align_corners=False)
            lm, score = model.apply(params, x[None])
            return lm[0], score[0]

        return fn

    @functools.cached_property
    def _pose_fn(self):
        model = self._pose

        @jax.jit
        def fn(params, crop_u8):
            x = crop_u8.astype(jnp.float32) / 255.0
            x = resize2d(x, (256, 256), method="linear", align_corners=False)
            lm, score = model.apply(params, x[None])
            return lm[0], score[0]

        return fn

    # -- helpers ------------------------------------------------------------

    def _best_face_box(self, img, detection=None) -> Optional[Tuple[int, int, int, int]]:
        """Pixel (x0, y0, x1, y1) with margin, from a fresh detection or a
        precomputed (boxes, scores, valid) triple (fused pipeline)."""
        h, w = img.shape[:2]
        if detection is None:
            fn = self._detect_fn((h, w), "face")
            detection = fn(self._face_det_params, img)
        boxes, scores, valid = detection
        if not bool(np.asarray(valid)[0]):
            return None
        ymin, xmin, ymax, xmax = np.asarray(boxes)[0, :4]
        # margin like the MediaPipe face-crop (25%)
        bw, bh = xmax - xmin, ymax - ymin
        x0 = int(np.clip((xmin - 0.25 * bw) * w, 0, w - 2))
        x1 = int(np.clip((xmax + 0.25 * bw) * w, x0 + 1, w))
        y0 = int(np.clip((ymin - 0.25 * bh) * h, 0, h - 2))
        y1 = int(np.clip((ymax + 0.25 * bh) * h, y0 + 1, h))
        return x0, y0, x1, y1

    # -- public API (reference-compatible) ----------------------------------

    def findIris(self, img: np.ndarray, detection=None) -> None:
        """Detect the irises of a single person (reference: detectors.py:42-64).

        On success writes ``face.mesh`` (478×2 int pixel coords) and the two
        iris circles; on miss leaves ``face.mesh`` untouched (the stream
        resets it to None per frame, midas_mediapipe.py:51).

        ``detection``: optional precomputed (boxes, scores, valid) from the
        fused single-dispatch frame program (runtime/fused.py).
        """
        self.h, self.w = img.shape[:2]
        box = self._best_face_box(img, detection)
        if box is None:
            self.results = None
            return
        x0, y0, x1, y1 = box
        crop = np.ascontiguousarray(img[y0:y1, x0:x1, ::-1])  # BGR→RGB
        lm, score = self._mesh_fn(self._mesh_params, crop)
        lm = np.asarray(lm)
        self.results = {"landmarks": lm, "score": float(score)}
        sx = (x1 - x0) / 192.0
        sy = (y1 - y0) / 192.0
        mesh = np.stack([x0 + lm[:, 0] * sx, y0 + lm[:, 1] * sy], axis=-1).astype(int)
        self.face.mesh = mesh
        self.face.l_iris["center"], self.face.l_iris["radius"] = min_enclosing_circle(mesh[self.LEFT_IRIS])
        self.face.r_iris["center"], self.face.r_iris["radius"] = min_enclosing_circle(mesh[self.RIGHT_IRIS])

    def set_fused_mesh(self, img: np.ndarray, mesh, score, l_center, l_radius,
                       r_center, r_radius, found: bool) -> None:
        """Fill the face state from the single-dispatch fused iris program
        (runtime/fused.py::make_fused_iris_frame_fn) — the landmark net, the
        frame-pixel mapping and both iris circle fits already ran on device;
        this is pure host bookkeeping.

        ``mesh`` is (478, 2) int32 frame pixels (unlike findIris's internal
        192-crop ``results`` cache, the fused program returns frame space
        directly). On ``found=False`` leaves ``face.mesh`` untouched, like
        findIris on a detection miss.
        """
        self.h, self.w = img.shape[:2]
        if not found:
            self.results = None
            return
        mesh = np.asarray(mesh)
        self.results = {"landmarks": mesh, "score": float(score)}
        self.face.mesh = mesh
        l_c = np.asarray(l_center, dtype=np.float64)
        r_c = np.asarray(r_center, dtype=np.float64)
        self.face.l_iris["center"], self.face.l_iris["radius"] = (float(l_c[0]), float(l_c[1])), float(l_radius)
        self.face.r_iris["center"], self.face.r_iris["radius"] = (float(r_c[0]), float(r_c[1])), float(r_radius)

    def findBody(self, img: np.ndarray):
        """Detect body pose; returns (img, head_pts) with head_pts = ear
        landmarks 7, 8 in pixels (reference: detectors.py:67-106)."""
        lm, score = self._pose_fn(self._pose_params, np.ascontiguousarray(img[..., ::-1]))
        return self.body_from_fused(img, lm, score)

    def body_from_fused(self, img: np.ndarray, lm, score):
        """findBody's host half on already-computed pose landmarks — either
        from findBody's own dispatch above or from the fused single-dispatch
        program's pose branch (runtime/fused.py): scale the 256-crop
        landmarks to frame pixels, draw the ear points, return
        (img, head_pts)."""
        h, w = img.shape[:2]
        self.h, self.w = self.h or h, self.w or w
        lm = np.asarray(lm)
        # landmark x/y are in 256-crop units; map to full frame
        xs = lm[:, 0] * (w / 256.0)
        ys = lm[:, 1] * (h / 256.0)
        head_pts = []
        for idx in self.BODY_HEAD:
            center = np.array([int(xs[idx]), int(ys[idx])])
            head_pts.append(center)
            self._draw_point(img, center, str(idx))
        self.results = {"landmarks": lm, "score": float(score)}
        return img, head_pts

    def visualize(self, img: np.ndarray) -> None:
        """Draw eye polylines, iris circles, head lines and the calibration
        card dots (reference: detectors.py:108-124)."""
        try:
            import cv2
        except ImportError:
            self.frame = img
            return
        mesh = self.face.mesh
        cv2.polylines(img, [mesh[self.LEFT_EYE]], True, (0, 255, 0), 1, cv2.LINE_AA)
        cv2.polylines(img, [mesh[self.RIGHT_EYE]], True, (0, 255, 0), 1, cv2.LINE_AA)
        center_left = np.array(self.face.l_iris["center"], dtype=np.int32)
        center_right = np.array(self.face.r_iris["center"], dtype=np.int32)
        cv2.circle(img, center_left, int(self.face.l_iris["radius"]), (255, 0, 255), 2, cv2.LINE_AA)
        cv2.circle(img, center_right, int(self.face.r_iris["radius"]), (255, 0, 255), 2, cv2.LINE_AA)
        cv2.line(img, mesh[self.HEAD[0]], mesh[self.HEAD[1]], (0, 255, 0), 1, cv2.LINE_AA)
        cv2.line(img, mesh[self.HEAD[2]], mesh[self.HEAD[3]], (0, 255, 0), 1, cv2.LINE_AA)
        cv2.circle(img, (505, 504), 1, (255, 0, 255), 2, cv2.LINE_AA)
        cv2.circle(img, (675, 501), 1, (255, 0, 255), 2, cv2.LINE_AA)
        self.frame = img

    def _draw_point(self, img, center, label):
        try:
            import cv2

            cv2.circle(img, tuple(int(v) for v in center), 2, (255, 0, 255), 2, cv2.LINE_AA)
            cv2.putText(img, label, (int(center[0]), int(center[1]) - 20),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.5, (0, 255, 0), 1, cv2.LINE_AA)
        except ImportError:
            pass
