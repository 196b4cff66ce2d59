"""Detector stack tests: circle fit vs cv2, anchors/decode/NMS vs numpy
oracle, model output contracts, and the wrapper APIs end-to-end."""

import jax.numpy as jnp
import numpy as np
import pytest

from depth_estimation_tpu.detect.anchors import (
    BLAZEFACE_FRONT,
    BLAZEPOSE_DETECTOR,
    build_anchors,
    decode_boxes,
    decode_scores,
    nms,
    weighted_nms,
)
from depth_estimation_tpu.detect.circle import min_enclosing_circle, min_enclosing_circle_jax


# -- min enclosing circle ----------------------------------------------------

@pytest.mark.parametrize("n", [2, 3, 4, 8])
def test_mec_matches_cv2(rng, n):
    import cv2

    for trial in range(10):
        pts = (rng.random((n, 2)) * 100).astype(np.float32)
        (cx, cy), r = min_enclosing_circle(pts)
        (rx, ry), rr = cv2.minEnclosingCircle(pts.astype(np.int32) if trial % 2 else pts)
        if trial % 2:
            # int grid like the reference mesh points
            (cx, cy), r = min_enclosing_circle(pts.astype(np.int32))
        assert abs(cx - rx) < 0.1 and abs(cy - ry) < 0.1
        assert abs(r - rr) < 0.11  # cv2 pads its radius by ~1e-2 ulp-ish


def test_mec_jax_matches_host(rng):
    for _ in range(10):
        pts = (rng.random((4, 2)) * 50).astype(np.float32)
        (cx, cy), r = min_enclosing_circle(pts)
        c_j, r_j = min_enclosing_circle_jax(pts)
        c_j = np.asarray(c_j)
        assert abs(c_j[0] - cx) < 1e-2 and abs(c_j[1] - cy) < 1e-2
        assert abs(float(r_j) - r) < 1e-2


# -- anchors / decode / NMS --------------------------------------------------

def test_anchor_counts():
    assert build_anchors(BLAZEFACE_FRONT).shape == (896, 4)
    # the real pose_detection SsdAnchorsCalculator count (2254)
    assert build_anchors(BLAZEPOSE_DETECTOR).shape == (2254, 4)


def test_decode_boxes_roundtrip():
    anchors = build_anchors(BLAZEFACE_FRONT)
    # raw regression that should decode to a box centered on anchor 0
    raw = np.zeros((896, 16), np.float32)
    raw[0, 2] = 25.6  # w = 25.6/128 = 0.2
    raw[0, 3] = 12.8  # h = 0.1
    out = np.asarray(decode_boxes(raw, anchors, 128.0))
    cx, cy = anchors[0, 0], anchors[0, 1]
    np.testing.assert_allclose(out[0, :4], [cy - 0.05, cx - 0.1, cy + 0.05, cx + 0.1], atol=1e-6)


def test_decode_scores_clipping():
    s = np.asarray(decode_scores(np.array([0.0, 1000.0, -1000.0], np.float32)))
    np.testing.assert_allclose(s, [0.5, 1.0, 0.0], atol=1e-6)


def test_nms_suppresses_overlaps():
    boxes = np.array(
        [
            [0.0, 0.0, 0.4, 0.4],
            [0.01, 0.01, 0.41, 0.41],  # heavy overlap, lower score
            [0.6, 0.6, 0.9, 0.9],  # disjoint
        ],
        np.float32,
    )
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    out_boxes, out_scores, valid = nms(boxes, scores, iou_threshold=0.5, score_threshold=0.1, max_outputs=3)
    valid = np.asarray(valid)
    assert valid.sum() == 2
    kept = np.asarray(out_scores)[valid]
    np.testing.assert_allclose(sorted(kept, reverse=True), [0.9, 0.7])


def test_weighted_nms_blends():
    boxes = np.array(
        [[0.0, 0.0, 0.4, 0.4], [0.1, 0.1, 0.5, 0.5], [0.6, 0.6, 0.9, 0.9]], np.float32
    )
    scores = np.array([0.9, 0.9, 0.7], np.float32)
    out_boxes, out_scores, valid = weighted_nms(boxes, scores, iou_threshold=0.3, score_threshold=0.1)
    out_boxes, valid = np.asarray(out_boxes), np.asarray(valid)
    # first kept box is the average of the two equal-score overlapping boxes
    np.testing.assert_allclose(out_boxes[0], [0.05, 0.05, 0.45, 0.45], atol=1e-6)
    assert valid.sum() == 2


# -- model output contracts ---------------------------------------------------

def test_blazeface_output_shapes(rng):
    import jax

    from depth_estimation_tpu.models.blazeface import BlazeFace

    m = BlazeFace()
    params = jax.jit(m.init)(jax.random.PRNGKey(0), np.zeros((1, 128, 128, 3), np.float32))
    raw_boxes, raw_scores = jax.jit(m.apply)(params, rng.standard_normal((1, 128, 128, 3)).astype(np.float32))
    assert raw_boxes.shape == (1, 896, 16)
    assert raw_scores.shape == (1, 896)


def test_facemesh_output_shapes(rng):
    import jax

    from depth_estimation_tpu.models.facemesh import FaceMesh, FaceMeshWithIris

    m = FaceMesh()
    params = jax.jit(m.init)(jax.random.PRNGKey(0), np.zeros((1, 192, 192, 3), np.float32))
    lm, score = jax.jit(m.apply)(params, rng.random((1, 192, 192, 3)).astype(np.float32))
    assert lm.shape == (1, 468, 3)
    assert score.shape == (1,)
    assert 0.0 <= float(score[0]) <= 1.0

    mi = FaceMeshWithIris()
    params = jax.jit(mi.init)(jax.random.PRNGKey(0), np.zeros((1, 192, 192, 3), np.float32))
    lm, score = jax.jit(mi.apply)(params, rng.random((1, 192, 192, 3)).astype(np.float32))
    assert lm.shape == (1, 478, 3)  # 468 mesh + 10 iris refinement points
    # the base mesh passes through unchanged at indices 0-467
    assert np.isfinite(np.asarray(lm)).all()


def test_facemesh_iris_refinement_matches_manual_composition(rng):
    """Re-derive the refine_landmarks composition by hand — run FaceMesh,
    build the eye ROIs, crop (mirroring the right eye), run IrisLandmark,
    un-mirror and affine-map back — and require FaceMeshWithIris's points
    468-477 to match. A regression in the ROI math, the mirror, the crop
    sampling, the index layout, or the affine map back cannot pass."""
    import jax

    from depth_estimation_tpu.models.facemesh import (
        IRIS_INPUT_SIZE,
        LEFT_EYE_CORNERS,
        RIGHT_EYE_CORNERS,
        FaceMesh,
        FaceMeshWithIris,
        IrisLandmark,
        _eye_rois,
    )
    from depth_estimation_tpu.ops.sampling import crop_resize_bilinear

    m = FaceMeshWithIris()
    x = rng.random((2, 192, 192, 3)).astype(np.float32)
    params = jax.jit(m.init)(jax.random.PRNGKey(3), np.zeros((1, 192, 192, 3), np.float32))
    lm, _ = jax.jit(m.apply)(params, x)
    lm = np.asarray(lm)

    # manual composition from the same sub-params
    mesh_lm, _ = FaceMesh().apply({"params": params["params"]["mesh"]}, x)
    np.testing.assert_allclose(lm[:, :468], np.asarray(mesh_lm), atol=1e-5)
    crop = jax.vmap(crop_resize_bilinear, in_axes=(0, 0, None))
    out_hw = (IRIS_INPUT_SIZE, IRIS_INPUT_SIZE)
    for corners, sl, mirrored in (
        (RIGHT_EYE_CORNERS, slice(468, 473), True),
        (LEFT_EYE_CORNERS, slice(473, 478), False),
    ):
        x0, y0, side = _eye_rois(mesh_lm, corners, 192.0)
        c = crop(jnp.asarray(x), jnp.stack([x0, y0, side], axis=-1), out_hw)
        if mirrored:
            c = c[:, :, ::-1, :]
        _eye, iris = IrisLandmark().apply({"params": params["params"]["iris"]}, c)
        iris = np.array(iris)
        if mirrored:
            iris[:, :, 0] = IRIS_INPUT_SIZE - iris[:, :, 0]
        s = (np.asarray(side) / IRIS_INPUT_SIZE)[:, None]
        expect = np.stack(
            [np.asarray(x0)[:, None] + iris[:, :, 0] * s,
             np.asarray(y0)[:, None] + iris[:, :, 1] * s,
             iris[:, :, 2] * s], axis=-1)
        np.testing.assert_allclose(lm[:, sl], expect, atol=1e-4,
                                   err_msg=f"corners={corners}")

def test_blazepose_output_shapes(rng):
    import jax

    from depth_estimation_tpu.models.blazepose import BlazePose, BlazePoseDetector

    det = BlazePoseDetector()
    p = jax.jit(det.init)(jax.random.PRNGKey(0), np.zeros((1, 224, 224, 3), np.float32))
    rb, rs = jax.jit(det.apply)(p, rng.random((1, 224, 224, 3)).astype(np.float32))
    # the real pose_detection anchor count (strides 8/16/32/32/32)
    assert rb.shape[1] == rs.shape[1] == 28 * 28 * 2 + 14 * 14 * 2 + 7 * 7 * 6 == 2254
    assert rb.shape[2] == 12

    pose = BlazePose()
    pp = jax.jit(pose.init)(jax.random.PRNGKey(0), np.zeros((1, 256, 256, 3), np.float32))
    lm, score = jax.jit(pose.apply)(pp, rng.random((1, 256, 256, 3)).astype(np.float32))
    assert lm.shape == (1, 33, 5)
    lm, score, full = pose.apply(pp, rng.random((1, 256, 256, 3)).astype(np.float32), return_full=True)
    assert full["ld_raw"].shape == (1, 39, 5)  # 33 + 6 auxiliary
    assert full["heatmap"].shape == (1, 64, 64, 39)
    assert full["world"].shape == (1, 39, 3)


# -- wrapper APIs -------------------------------------------------------------

@pytest.fixture(scope="module")
def person_detector():
    from depth_estimation_tpu.detect.person_detector import PersonDetector
    from depth_estimation_tpu.geometry.face import FaceDet

    face = FaceDet(20, [505, 504, 675, 501])
    return PersonDetector(face, seed=0), face


def test_find_iris_populates_face(person_detector, rng):
    det, face = person_detector
    img = rng.integers(0, 256, (240, 320, 3), np.uint8)
    face.mesh = None
    det.findIris(img)
    # random-weight detector either finds nothing (mesh None) or fills
    # a consistent mesh + iris circles
    if face.mesh is not None:
        assert face.mesh.shape == (478, 2)
        assert face.l_iris["radius"] is not None
        assert face.r_iris["radius"] is not None


def test_find_body_returns_two_head_points(person_detector, rng):
    det, _ = person_detector
    img = rng.integers(0, 256, (240, 320, 3), np.uint8)
    out_img, head_pts = det.findBody(img)
    assert out_img is img
    assert len(head_pts) == 2
    for pt in head_pts:
        assert pt.shape == (2,)


def test_face_detector_api(rng):
    from depth_estimation_tpu.detect.face_detector import FaceDetector

    det = FaceDetector(seed=0)
    img = rng.integers(0, 256, (240, 320, 3), np.uint8)
    out, bboxs = det.findFaces(img, draw=False)
    assert out is img
    for b in bboxs:
        assert set(b) == {"id", "bbox", "score", "center"}
        x, y, w, h = b["bbox"]
        assert w >= 0 and h >= 0
    mesh = det.findIris(img)
    assert mesh is None or mesh.shape == (478, 2)


def test_fused_frame_runner_matches_staged(rng):
    """Single-dispatch fused program == separate depth + detection dispatches."""
    import warnings

    from depth_estimation_tpu import registry
    from depth_estimation_tpu.estimator import DepthEstimator
    from depth_estimation_tpu.runtime.fused import FusedFrameRunner

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        est = DepthEstimator("Tiny_test" if "Tiny_test" in registry.available_models() else "MiDaS_small", verbose=False)
    det, _face = _make_person_detector()
    img = rng.integers(0, 256, (120, 160, 3), np.uint8)

    runner = FusedFrameRunner(est, det, mesh=False)
    depth_f, boxes_f, scores_f, valid_f = runner(img)

    depth_s = est.predict(img)
    fn = det._detect_fn((120, 160), "face")
    boxes_s, scores_s, valid_s = fn(det._face_det_params, img)

    np.testing.assert_allclose(np.asarray(depth_f), depth_s, atol=1e-5)
    np.testing.assert_allclose(np.asarray(scores_f), np.asarray(scores_s), atol=1e-5)
    np.testing.assert_allclose(np.asarray(boxes_f), np.asarray(boxes_s), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(valid_f), np.asarray(valid_s))


def _make_person_detector():
    from depth_estimation_tpu.detect.person_detector import PersonDetector
    from depth_estimation_tpu.geometry.face import FaceDet

    face = FaceDet(20, [505, 504, 675, 501])
    return PersonDetector(face, seed=0), face


def test_iris_landmark_projection_exact(rng, monkeypatch):
    """Known landmarks from a mocked mesh model must land at exactly the
    crop-to-image mapped pixel coordinates, and the iris circle must match
    the host MEC of those points."""
    import jax.numpy as jnp

    det, face = _make_person_detector()
    img = rng.integers(0, 256, (240, 320, 3), np.uint8)

    # force a known face box: (x0, y0, x1, y1) = (64, 48, 192, 144)
    monkeypatch.setattr(det, "_best_face_box", lambda img, detection=None: (64, 48, 192, 144))

    lm = np.zeros((478, 3), np.float32)
    # iris points in crop coords (192-unit space)
    lm[474] = (96, 96, 0)
    lm[475] = (100, 96, 0)
    lm[476] = (96, 100, 0)
    lm[477] = (100, 100, 0)
    lm[469:473] = [(20, 20, 0), (24, 20, 0), (20, 24, 0), (24, 24, 0)]
    monkeypatch.setattr(det, "_mesh_fn", lambda params, crop: (jnp.asarray(lm), jnp.asarray(0.9)))

    face.mesh = None
    det.findIris(img)
    sx = (192 - 64) / 192.0  # crop width / 192
    sy = (144 - 48) / 192.0
    exp_x = 64 + 96 * sx
    exp_y = 48 + 96 * sy
    assert face.mesh[474][0] == int(exp_x)
    assert face.mesh[474][1] == int(exp_y)
    # iris circle pinned analytically: projected iris points form the square
    # (128,96),(130,96),(128,98),(130,98) -> center (129, 97), radius sqrt(2)
    assert face.mesh[det.LEFT_IRIS].tolist() == [[128, 96], [130, 96], [128, 98], [130, 98]]
    cx, cy = face.l_iris["center"]
    assert abs(cx - 129.0) < 1e-6 and abs(cy - 97.0) < 1e-6
    assert abs(face.l_iris["radius"] - np.sqrt(2.0)) < 1e-6


def test_wrap_empty_tree_falls_back_to_init():
    """An empty per-key param dict (e.g. a loader that found nothing) must
    stay falsy through _wrap so `_wrap(...) or _init(...)` random-init
    fallback fires, instead of becoming a truthy {'params': {}} that
    explodes at first apply."""
    from depth_estimation_tpu.detect.person_detector import _wrap

    assert _wrap(None) is None
    assert _wrap({}) is None
    wrapped = _wrap({"stem": {"kernel": np.zeros((3, 3, 3, 8))}})
    assert set(wrapped) == {"params"}
    already = {"params": {"stem": {}}}
    assert _wrap(already) is already
