"""Single-dispatch fused frame program: depth + face detection together.

The reference's fused loop (midas_mediapipe.py:32-129) runs detection and
depth as separate stages with host work between them; our first cut kept
that staging (three jit dispatches per frame). This module compiles ONE XLA
program per source resolution that computes

  depth map (full frame)  +  BlazeFace boxes/scores (decoded, NMS'd)

from a single uint8 frame already resident on device — the detect-then-
reduce design of the BASELINE north star.

``make_fused_iris_frame_fn`` goes further: the FaceMesh+iris landmark stage
joins the SAME program. The detection-dependent face crop samples via two
dense MXU contractions (ops/sampling.py::crop_resize_linear_matmul —
dynamic box, static output shape; gather fallback available, see
crop_via_matmul), the 478-landmark mesh is mapped to frame pixels, and
the two iris min-enclosing circles are fit on device
(detect/circle.py::min_enclosing_circle_jax). The landmark stage runs
under ``lax.cond``: FaceMesh+iris on detection hit, the BlazePose
fallback on miss (``include_pose=True``) — so the whole reference fused
loop (midas_mediapipe.py:51-117) is ONE XLA dispatch per frame whichever
path the frame takes, with zero mid-frame host synchronization.

``make_fused_detection_frame_fn`` gives the detection-only pipeline
(depth_by_detection.py) the same treatment: one BlazeFace pass feeds all
three fallback tiers, with FaceMesh/BlazePose under the cond.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from depth_estimation_tpu.config import BODY_HEAD, LEFT_IRIS, RIGHT_IRIS
from depth_estimation_tpu.detect.anchors import (
    BLAZEFACE_FRONT,
    build_anchors,
    decode_boxes,
    decode_scores,
    weighted_nms,
)
from depth_estimation_tpu.detect.circle import min_enclosing_circle_jax
from depth_estimation_tpu.ops.preprocess import compute_resize_shape
from depth_estimation_tpu.ops.resize import resize2d
from depth_estimation_tpu.ops.sampling import (
    crop_resize_bilinear_rect,
    crop_resize_linear_matmul,
)

# The dynamic face crop can sample via gathers (crop_resize_bilinear_rect)
# or as two dense MXU contractions (crop_resize_linear_matmul) — identical
# numerics (≤2e-7). On-chip A/B (BASELINE.md): the matmul form wins; it is
# the default for every fused program. DEPTH_TPU_CROP_IMPL=gather re-A/Bs
# the gather form. The env var is read at TRACE time (inside _crop_resize,
# free at runtime) so setting it after import still takes effect for any
# program compiled afterwards; already-cached programs keep their choice.
import os as _os


def crop_via_matmul() -> bool:
    return _os.environ.get("DEPTH_TPU_CROP_IMPL", "matmul") != "gather"


def _crop_resize(img, box, out_hw):
    fn = crop_resize_linear_matmul if crop_via_matmul() else crop_resize_bilinear_rect
    return fn(img, box, out_hw)


def _blazeface_branch(face_model, face_params, anchors, thresh, rgb01):
    """BlazeFace detect on a /255 RGB frame — mirrors
    PersonDetector._detect_fn('face') exactly."""
    d = resize2d(rgb01 * 2.0 - 1.0, (128, 128), method="linear", align_corners=False)
    raw_boxes, raw_scores = face_model.apply(face_params, d[None])
    boxes = decode_boxes(raw_boxes[0], anchors, 128.0)
    scores = decode_scores(raw_scores[0])
    return weighted_nms(boxes, scores, iou_threshold=0.3, score_threshold=thresh)


def _crop_box(boxes, h, w):
    """Face crop box exactly as _best_face_box: 25% margin, truncating int
    casts, ordered clips (detect/person_detector.py:162-179)."""
    ymin, xmin, ymax, xmax = boxes[0, 0], boxes[0, 1], boxes[0, 2], boxes[0, 3]
    bw, bh = xmax - xmin, ymax - ymin
    x0 = jnp.trunc(jnp.clip((xmin - 0.25 * bw) * w, 0.0, w - 2.0))
    x1 = jnp.trunc(jnp.clip((xmax + 0.25 * bw) * w, x0 + 1.0, float(w)))
    y0 = jnp.trunc(jnp.clip((ymin - 0.25 * bh) * h, 0.0, h - 2.0))
    y1 = jnp.trunc(jnp.clip((ymax + 0.25 * bh) * h, y0 + 1.0, float(h)))
    return x0, x1, y0, y1


def _mesh_landmarks(mesh_model, mesh_params, feed01, x0, x1, y0, y1):
    """FaceMesh on the dynamic crop + landmark→frame-pixel mapping with the
    host path's truncating int cast (findIris semantics)."""
    crop = _crop_resize(feed01, jnp.stack([x0, y0, x1 - x0, y1 - y0]), (192, 192))
    lm, score = mesh_model.apply(mesh_params, crop[None])
    lm, score = lm[0], score[0]
    sx = (x1 - x0) / 192.0
    sy = (y1 - y0) / 192.0
    mesh = jnp.stack([x0 + lm[:, 0] * sx, y0 + lm[:, 1] * sy], axis=-1)
    return jnp.trunc(mesh).astype(jnp.int32), score  # host .astype(int)


def _pose_branch(pose_model, pose_params, rgb01):
    """BlazePose on the full frame exactly as the staged findBody feeds it
    (person_detector.py::_pose_fn — /255 then 256² linear resize)."""
    p = resize2d(rgb01, (256, 256), method="linear", align_corners=False)
    plm, pscore = pose_model.apply(pose_params, p[None])
    return plm[0], pscore[0]


def _np_index(i, n):
    """numpy-style index semantics for a device gather: one negative wrap
    (img[-3] → img[n-3]); residual out-of-range clamps (XLA gather default)
    where numpy/the reference would raise — see docs/PARITY.md."""
    return jnp.where(i < 0, i + n, i)


def _sample_iris_depth(depth, l_c, r_c, h, w):
    """FaceDet.get_depth's iris sampling (face.py:91-116) ON DEVICE, quirks
    and all: truncating int casts of the circle centers, x coords clamped to
    shape[0]-1, l's y slot overwritten with the clamp of *r*'s y (r's y
    itself never clamped), and transposed ``img[x, y]`` indexing."""
    lx = jnp.trunc(l_c[0]).astype(jnp.int32)
    rx = jnp.trunc(r_c[0]).astype(jnp.int32)
    ry = jnp.trunc(r_c[1]).astype(jnp.int32)
    lx = jnp.minimum(h - 1, lx)
    rx = jnp.minimum(h - 1, rx)
    ly = jnp.minimum(w - 1, ry)
    left = depth[_np_index(lx, h), _np_index(ly, w)]
    right = depth[_np_index(rx, h), _np_index(ry, w)]
    return (left + right) / 2.0


def _sample_pts_depth(depth, pts, h, w):
    """FaceDet.get_depth's body-fallback sampling (face.py:111-116) ON
    DEVICE: ``img[p[0], p[1]]`` with the points exactly as stored (the
    faithful transposed indexing)."""
    d_l = depth[_np_index(pts[0, 0], h), _np_index(pts[0, 1], w)]
    d_r = depth[_np_index(pts[1, 0], h), _np_index(pts[1, 1], w)]
    return (d_l + d_r) / 2.0


def make_fused_frame_fn(estimator, detector, in_hw: Tuple[int, int]):
    """Returns fn(depth_params, face_params, img_u8) ->
    (depth (H, W) f32, boxes (M, 16), scores (M,), valid (M,))."""
    cfg = estimator.preprocess_cfg
    net_hw = compute_resize_shape(*in_hw, cfg)
    mean = np.asarray(cfg.mean, np.float32)
    std = np.asarray(cfg.std, np.float32)
    model = estimator.model
    dtype = estimator.dtype
    face_model = detector._face_det
    anchors = build_anchors(BLAZEFACE_FRONT)  # host numpy (lowering-const rule)
    thresh = detector.minDetectionCon

    precision = getattr(estimator, "matmul_precision", "high")

    @jax.jit
    def fused(depth_params, face_params, img_u8):
      with jax.default_matmul_precision(precision):
        rgb = img_u8[..., ::-1].astype(jnp.float32) / 255.0

        # depth branch
        x = resize2d(rgb, net_hw, method="cubic", align_corners=False)
        x = ((x - mean) / std).astype(dtype)
        pred = model.apply(depth_params, x[None]).astype(jnp.float32)
        depth = resize2d(pred[0], in_hw, method="cubic", align_corners=False)

        # detection branch (shares the rgb f32 conversion)
        d = resize2d(rgb * 2.0 - 1.0, (128, 128), method="linear", align_corners=False)
        raw_boxes, raw_scores = face_model.apply(face_params, d[None])
        boxes = decode_boxes(raw_boxes[0], anchors, 128.0)
        scores = decode_scores(raw_scores[0])
        boxes, scores, valid = weighted_nms(boxes, scores, iou_threshold=0.3, score_threshold=thresh)
        return depth, boxes, scores, valid  # noqa: E501  (indented under precision ctx)

    return fused


def make_fused_iris_frame_fn(estimator, detector, in_hw: Tuple[int, int],
                             include_pose: bool = False,
                             emit_depth_map: bool = True):
    """The WHOLE reference iris path as one XLA program.

    Returns fn(depth_params, face_params, mesh_params[, pose_params],
    img_u8, fallback_pts) -> dict with keys:

    * ``depth`` — (H, W) f32 map (only when ``emit_depth_map``; the
      streaming loop turns it off so no f32 bytes ever cross D2H)
    * ``boxes`` (M, 16), ``scores`` (M,), ``valid`` (M,)
    * ``mesh`` (478, 2) i32 frame pixels, ``mesh_score`` f32
    * ``l_center`` (2,) f32, ``l_radius`` f32, ``r_center``, ``r_radius``
    * ``pose_lm`` (33, 5) f32 in 256-crop units, ``pose_score`` f32
      (``include_pose`` only; zeros on the hit branch)
    * ``vis_u8`` — (H, W) u8 output frame: the reference's
      ``to_video_frame`` cast/*5/+10 wraparound (midas_mediapipe.py:141-150)
      computed ON DEVICE (ops/postprocess.py::to_video_frame_u8_jax)
    * ``iris_sample`` f32 — FaceDet.get_depth's iris-center depth sample
      (face.py:91-116, quirks preserved) on device; meaningful iff
      ``valid[0]``
    * ``fallback_sample`` f32 — the same get_depth's body-fallback sample
      at the host-provided ``fallback_pts`` (2, 2) i32 (the stored head
      points, face.py:111-116); meaningful iff real points were passed
    * ``ears_sample`` f32 (``include_pose`` only) — depth sampled at the
      CURRENT frame's device-computed ear pixels (pose landmarks 7, 8
      mapped exactly as body_from_fused does); lets a pipelined stream
      record a depth sample on the first fallback frame after a
      transition, when no stored head points exist yet

    Mesh outputs are only meaningful when ``valid[0]`` — the landmark branch
    is skipped via ``lax.cond`` on detection miss (zeros returned). The crop
    box, landmark→frame mapping, and int truncation reproduce the staged
    host path (detect/person_detector.py::_best_face_box / findIris) so the
    two paths agree to numeric tolerance.

    ``include_pose=True`` makes the cond's miss branch run the BlazePose
    landmark net instead of returning zeros — the reference's body-pose
    fallback (midas_mediapipe.py:95-117) — so EVERY frame is exactly one
    dispatch whichever path it takes.
    """
    cfg = estimator.preprocess_cfg
    net_hw = compute_resize_shape(*in_hw, cfg)
    mean = np.asarray(cfg.mean, np.float32)
    std = np.asarray(cfg.std, np.float32)
    model = estimator.model
    dtype = estimator.dtype
    face_model = detector._face_det
    mesh_model = detector._mesh
    pose_model = detector._pose if include_pose else None
    anchors = build_anchors(BLAZEFACE_FRONT)  # host numpy (lowering-const rule)
    thresh = detector.minDetectionCon
    h, w = in_hw
    l_iris_idx = np.asarray(LEFT_IRIS)
    r_iris_idx = np.asarray(RIGHT_IRIS)

    from depth_estimation_tpu.ops.postprocess import to_video_frame_u8_jax

    precision = getattr(estimator, "matmul_precision", "high")

    def fused(depth_params, face_params, mesh_params, pose_params, img_u8,
              fallback_pts):
      with jax.default_matmul_precision(precision):
        rgb = img_u8[..., ::-1].astype(jnp.float32) / 255.0

        # depth branch
        x = resize2d(rgb, net_hw, method="cubic", align_corners=False)
        x = ((x - mean) / std).astype(dtype)
        pred = model.apply(depth_params, x[None]).astype(jnp.float32)
        depth = resize2d(pred[0], in_hw, method="cubic", align_corners=False)

        # detection branch (shares the rgb f32 conversion)
        boxes, scores, valid = _blazeface_branch(face_model, face_params, anchors, thresh, rgb)
        x0, x1, y0, y1 = _crop_box(boxes, h, w)

        zero_pose = (jnp.zeros((33, 5), jnp.float32), jnp.float32(0.0))

        def run_mesh(_):
            mesh, score = _mesh_landmarks(mesh_model, mesh_params, rgb, x0, x1, y0, y1)
            l_c, l_r = min_enclosing_circle_jax(mesh[l_iris_idx].astype(jnp.float32))
            r_c, r_r = min_enclosing_circle_jax(mesh[r_iris_idx].astype(jnp.float32))
            out = (mesh, score, l_c, l_r, r_c, r_r)
            return out + zero_pose if include_pose else out

        def skip_mesh(_):
            z2 = jnp.zeros((2,), jnp.float32)
            out = (
                jnp.zeros((478, 2), jnp.int32),
                jnp.float32(0.0),
                z2,
                jnp.float32(0.0),
                z2,
                jnp.float32(0.0),
            )
            if not include_pose:
                return out
            # miss branch = the reference's body-pose fallback
            return out + _pose_branch(pose_model, pose_params, rgb)

        fused_out = jax.lax.cond(valid[0], run_mesh, skip_mesh, operand=None)
        mesh, mesh_score, l_c, l_r, r_c, r_r = fused_out[:6]

        out = {
            "boxes": boxes,
            "scores": scores,
            "valid": valid,
            "mesh": mesh,
            "mesh_score": mesh_score,
            "l_center": l_c,
            "l_radius": l_r,
            "r_center": r_c,
            "r_radius": r_r,
            # output postprocess on device (VERDICT r2 #1 / SURVEY N9)
            "vis_u8": to_video_frame_u8_jax(depth, faithful=True),
            # get_depth's two sampling modes, on device (zeros-driven junk
            # on the branch whose inputs are absent — host selects by
            # valid/pts-provenance)
            "iris_sample": _sample_iris_depth(depth, l_c, r_c, h, w),
            "fallback_sample": _sample_pts_depth(depth, fallback_pts, h, w),
        }
        if emit_depth_map:
            out["depth"] = depth
        if include_pose:
            pose_lm, pose_score = fused_out[6], fused_out[7]
            out["pose_lm"] = pose_lm
            out["pose_score"] = pose_score
            # current-frame ear pixels, mapped exactly as body_from_fused
            # (person_detector.py:249-255): scale 256-crop landmarks to
            # frame, truncating int casts
            ex = jnp.trunc(pose_lm[jnp.asarray(BODY_HEAD), 0] * (w / 256.0)).astype(jnp.int32)
            ey = jnp.trunc(pose_lm[jnp.asarray(BODY_HEAD), 1] * (h / 256.0)).astype(jnp.int32)
            ears = jnp.stack([ex, ey], axis=-1)  # (2, 2) rows = (x, y)
            out["ears_sample"] = _sample_pts_depth(depth, ears, h, w)
        return out

    if include_pose:
        return jax.jit(fused)

    @jax.jit
    def fused_no_pose(depth_params, face_params, mesh_params, img_u8, fallback_pts):
        return fused(depth_params, face_params, mesh_params, None, img_u8, fallback_pts)

    return fused_no_pose


_NO_PTS = None  # lazily-built zero fallback_pts singleton


def _zero_pts():
    global _NO_PTS
    if _NO_PTS is None:
        _NO_PTS = jnp.zeros((2, 2), jnp.int32)
    return _NO_PTS


class FusedFrameRunner:
    """Caches the fused program per source resolution; one dispatch/frame.

    ``mesh=True`` (default) fuses the FaceMesh+iris stage into the program;
    ``pose=True`` (default, requires mesh) additionally fuses the BlazePose
    fallback as the detection-miss cond branch — the complete reference
    per-frame pipeline as a single dispatch whichever path a frame takes.
    ``mesh=False`` keeps the depth+detect-only program with the landmark
    stage as a second dispatch.

    ``emit_depth_map=False`` (the streaming default) drops the f32 depth
    map from the outputs: postprocess + depth sampling already happened on
    device, so the fetch is u8-and-scalars only — ≥4× fewer D2H bytes.
    """

    def __init__(self, estimator, detector, mesh: bool = True, pose: bool = True,
                 emit_depth_map: bool = True):
        self.estimator = estimator
        self.detector = detector
        self.mesh = mesh
        self.pose = mesh and pose
        self.emit_depth_map = emit_depth_map
        self._cache = {}

    def _frame_fn(self, hw):
        fn = self._cache.get(hw)
        if fn is None:
            if self.mesh:
                fn = make_fused_iris_frame_fn(
                    self.estimator, self.detector, hw, include_pose=self.pose,
                    emit_depth_map=self.emit_depth_map,
                )
            else:
                fn = make_fused_frame_fn(self.estimator, self.detector, hw)
            self._cache[hw] = fn
        return fn

    def batched(self, imgs_u8, fallback_pts=None):
        """Micro-batched dispatch: (K, H, W, 3) frames through ``jax.vmap``
        of the fused program. vmap turns the ``lax.cond`` into a select, so
        BOTH landmark branches run for every frame (0.82-0.85× the
        per-frame on-chip rate, BASELINE.md) — but the K frames cost ONE
        dispatch + ONE fetch, which wins client wall where the per-call
        round trip dominates (+62-94% at K=4 across models/sessions
        through a tunneled chip — BASELINE.md).
        Mesh mode only. ``fallback_pts``: optional (K, 2, 2) int array."""
        if not self.mesh:
            raise ValueError("batched dispatch requires mesh=True")
        K = imgs_u8.shape[0]
        hw = imgs_u8.shape[1:3]
        key = ("batched", hw, K)
        fn = self._cache.get(key)
        if fn is None:
            base = self._frame_fn(hw)
            in_axes = (None, None, None, None, 0, 0) if self.pose else (
                None, None, None, 0, 0)
            fn = jax.jit(jax.vmap(base, in_axes=in_axes))
            self._cache[key] = fn
        pts = (jnp.zeros((K, 2, 2), jnp.int32) if fallback_pts is None
               else jnp.asarray(fallback_pts, jnp.int32))
        args = [self.estimator.params, self.detector._face_det_params,
                self.detector._mesh_params]
        if self.pose:
            args.append(self.detector._pose_params)
        return fn(*args, imgs_u8, pts)

    def __call__(self, img_u8, fallback_pts=None):
        """``fallback_pts``: optional (2, 2) int array of stored head points
        for the device-side body-fallback depth sample (mesh mode only)."""
        fn = self._frame_fn(img_u8.shape[:2])
        if self.mesh:
            pts = _zero_pts() if fallback_pts is None else jnp.asarray(
                fallback_pts, jnp.int32
            )
            if self.pose:
                return fn(
                    self.estimator.params,
                    self.detector._face_det_params,
                    self.detector._mesh_params,
                    self.detector._pose_params,
                    img_u8,
                    pts,
                )
            return fn(
                self.estimator.params,
                self.detector._face_det_params,
                self.detector._mesh_params,
                img_u8,
                pts,
            )
        return fn(self.estimator.params, self.detector._face_det_params, img_u8)


def make_fused_detection_frame_fn(detector, in_hw: Tuple[int, int]):
    """The detection-only pipeline's WHOLE per-frame detector stack
    (depth_by_detection.py:196-287) as one XLA program.

    Returns fn(face_params, mesh_params, pose_params, img_u8) ->
      (boxes (M, 16), scores (M,), valid (M,),
       mesh_pts (478, 2) i32 frame pixels,      # tier-1 branch
       pose_lm (33, 5) f32, pose_score f32)     # tier-3 branch (miss)

    One BlazeFace pass feeds all three tiers: its decoded boxes drive the
    lax.cond between FaceMesh (hit — reproducing FaceDetector.findIris's
    crop box, BGR-feed quirk when ``detector.faithful``, landmark→frame
    mapping and int truncation, depth_by_detection.py:62-82) and the
    BlazePose fallback (miss), and the same boxes serve tier 2's
    ``findFaces`` on host with zero extra dispatches. Iris circle fits stay
    host-side (4-point numpy MEC — no device work to save).
    """
    impl = detector._impl
    face_model, mesh_model, pose_model = impl._face_det, impl._mesh, impl._pose
    anchors = build_anchors(BLAZEFACE_FRONT)  # host numpy (lowering-const rule)
    thresh = detector.minDetectionCon
    h, w = in_hw
    faithful = detector.faithful

    @jax.jit
    def fused(face_params, mesh_params, pose_params, img_u8):
        rgb01 = img_u8[..., ::-1].astype(jnp.float32) / 255.0
        boxes, scores, valid = _blazeface_branch(face_model, face_params, anchors, thresh, rgb01)
        x0, x1, y0, y1 = _crop_box(boxes, h, w)

        def tier1(_):
            # FaceDetector.findIris feeds the BGR frame to the mesh when
            # faithful (the reference computes imgRGB then processes img,
            # depth_by_detection.py:67-75); computed inside the branch so
            # miss frames never pay the full-frame conversion
            feed01 = img_u8.astype(jnp.float32) / 255.0 if faithful else rgb01
            pts, _score = _mesh_landmarks(mesh_model, mesh_params, feed01, x0, x1, y0, y1)
            return pts, jnp.zeros((33, 5), jnp.float32), jnp.float32(0.0)

        def tier3(_):
            plm, pscore = _pose_branch(pose_model, pose_params, rgb01)
            return jnp.zeros((478, 2), jnp.int32), plm, pscore

        mesh_pts, pose_lm, pose_score = jax.lax.cond(
            valid[0], tier1, tier3, operand=None
        )
        return boxes, scores, valid, mesh_pts, pose_lm, pose_score

    return fused


class FusedDetectionRunner:
    """Caches the fused detection program per source resolution; one
    dispatch per frame for the 3-tier fallback pipeline.

    Returns host numpy (one ``jax.device_get`` of the whole output tuple):
    every output is small and all three tiers consume them on host, so a
    single transfer beats per-array ``np.asarray`` fetches — through a
    tunneled TPU each fetch is its own ~100 ms round trip."""

    def __init__(self, detector):
        self.detector = detector
        self._cache = {}

    def __call__(self, img_u8):
        key = img_u8.shape[:2]
        fn = self._cache.get(key)
        if fn is None:
            fn = make_fused_detection_frame_fn(self.detector, key)
            self._cache[key] = fn
        impl = self.detector._impl
        return jax.device_get(
            fn(impl._face_det_params, impl._mesh_params, impl._pose_params, img_u8)
        )
