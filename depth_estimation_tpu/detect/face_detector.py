"""FaceDetector — reference depth_by_detection.py API on the TPU stack.

Mirrors ``FaceDetector`` (reference: depth_by_detection.py:12-124):
``findFaces(img, draw) -> (img, bboxs)`` with MediaPipe-style bbox dicts,
``findIris(img) -> mesh_points | None`` and ``findBody(img) -> (img,
head_pts)``. Shares the jitted detector stages with PersonDetector.

Faithful-behavior note: the reference's FaceDetector.findIris computes
``imgRGB`` but then feeds the *BGR* image to the mesh model
(depth_by_detection.py:67-75). ``faithful=True`` (default) reproduces that.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from depth_estimation_tpu.detect.person_detector import PersonDetector


class FaceDetector:
    def __init__(self, minDetectionCon: float = 0.2, params: Optional[Dict] = None,
                 seed: int = 0, faithful: bool = True):
        class _NullFace:  # standalone use: no FaceDet to mutate
            mesh = None
            l_iris = {"center": None, "radius": None}
            r_iris = {"center": None, "radius": None}

        self._impl = PersonDetector(_NullFace(), minDetectionCon, params=params, seed=seed)
        self.minDetectionCon = minDetectionCon
        self.faithful = faithful
        self.results = None
        self.w: Optional[int] = None
        self.h: Optional[int] = None

    def findFaces(self, img: np.ndarray, draw: bool = True, detection=None):
        """Face bboxes with id/score/center dicts (depth_by_detection.py:32-60).

        ``detection``: optional precomputed (boxes, scores, valid) from the
        fused single-dispatch program (runtime/fused.py) — skips the extra
        BlazeFace dispatch."""
        h, w = img.shape[:2]
        if detection is None:
            fn = self._impl._detect_fn((h, w), "face")
            detection = fn(self._impl._face_det_params, img)
        boxes, scores, valid = (np.asarray(a) for a in detection)
        bboxs = []
        for i in range(len(scores)):
            if not valid[i]:
                continue
            ymin, xmin, ymax, xmax = boxes[i, :4]
            bbox = (int(xmin * w), int(ymin * h), int((xmax - xmin) * w), int((ymax - ymin) * h))
            cx = bbox[0] + bbox[2] // 2
            cy = bbox[1] + bbox[3] // 2
            bboxs.append({"id": len(bboxs), "bbox": bbox, "score": [float(scores[i])], "center": (cx, cy)})
            if draw:
                self._draw_box(img, bbox, float(scores[i]))
        self.results = bboxs
        return img, bboxs

    def findIris(self, img: np.ndarray):
        """Single-person mesh points or None (depth_by_detection.py:62-82)."""
        self.h, self.w = img.shape[:2]
        # faithful mode feeds BGR to the mesh model like the reference does
        feed = img if self.faithful else img[..., ::-1]
        box = self._impl._best_face_box(img)
        if box is None:
            return None
        x0, y0, x1, y1 = box
        crop = np.ascontiguousarray(feed[y0:y1, x0:x1])
        lm, _score = self._impl._mesh_fn(self._impl._mesh_params, crop)
        lm = np.asarray(lm)
        sx = (x1 - x0) / 192.0
        sy = (y1 - y0) / 192.0
        return np.stack([x0 + lm[:, 0] * sx, y0 + lm[:, 1] * sy], axis=-1).astype(int)

    def findBody(self, img: np.ndarray):
        return self._impl.findBody(img)

    def body_from_fused(self, img: np.ndarray, lm, score):
        """findBody's host half on pose landmarks the fused program already
        computed (runtime/fused.py tier-3 branch)."""
        return self._impl.body_from_fused(img, lm, score)

    def _draw_box(self, img, bbox, score):
        try:
            import cv2

            cv2.rectangle(img, bbox, (255, 0, 255), 2)
            cv2.putText(img, f"{int(score * 100)}%", (bbox[0], bbox[1] - 20),
                        cv2.FONT_HERSHEY_PLAIN, 2, (255, 0, 255), 2)
        except ImportError:
            pass
