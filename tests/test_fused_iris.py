"""Single-dispatch fused iris program tests (runtime/fused.py).

The full reference iris path (midas_mediapipe.py:51-74) — BlazeFace detect,
face crop, FaceMesh+iris landmarks, frame-pixel mapping, iris min-enclosing
circles — compiles into ONE XLA program per frame. These tests prove:

* the dynamic rect crop primitive is exactly host slice-then-resize
  (crop_resize_bilinear_rect vs resize2d on a sliced crop);
* the fused program agrees with the staged host path
  (PersonDetector.findIris) on mesh pixels and iris circles;
* the lax.cond miss branch skips the landmark nets and the stream-side
  bookkeeping leaves the face state untouched;
* FusedVidStream drives the fused program end-to-end.
"""

import warnings

import flax.linen as nn
import numpy as np
import pytest

from depth_estimation_tpu import registry
from depth_estimation_tpu.config import SMALL_PREPROCESS
from depth_estimation_tpu.estimator import DepthEstimator
from depth_estimation_tpu.geometry.face import FaceDet
from depth_estimation_tpu.detect.person_detector import PersonDetector
from depth_estimation_tpu.ops.resize import resize2d
from depth_estimation_tpu.ops.sampling import crop_resize_bilinear_rect
from depth_estimation_tpu.runtime.fused import make_fused_iris_frame_fn


class _TinyDepthNet(nn.Module):
    @nn.compact
    def __call__(self, x):
        h = nn.Conv(8, (3, 3), strides=(2, 2), padding="SAME")(x)
        h = nn.relu(h)
        h = nn.Conv(1, (3, 3), padding="SAME")(h)
        return nn.relu(h)[..., 0]


@pytest.fixture(scope="module", autouse=True)
def _register_tiny():
    if "Tiny_test" not in registry.available_models():
        registry.register(
            registry.ModelEntry("Tiny_test", _TinyDepthNet, SMALL_PREPROCESS, lambda sd: sd)
        )


@pytest.fixture(scope="module")
def estimator():
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return DepthEstimator("Tiny_test", verbose=False)


def _make_detector(minDetectionCon=1e-4):
    """Threshold ~0 → the clipped-sigmoid scores always produce a detection,
    so the mesh branch of the fused program is exercised deterministically
    even with random-init weights."""
    face = FaceDet(20, [505, 504, 675, 501])
    det = PersonDetector(face, minDetectionCon=minDetectionCon, params={}, seed=0)
    return det, face


# -- crop primitive ----------------------------------------------------------


@pytest.mark.parametrize(
    "box", [(3, 5, 40, 32), (0, 0, 80, 64), (60, 40, 17, 11), (10, 20, 6, 6)]
)
def test_crop_resize_rect_matches_slice_resize(rng, box):
    """Dynamic-box rect crop == host slice + resize2d (incl. the box-edge
    clamp when the box is smaller than the output)."""
    img = rng.random((64, 80, 3), dtype=np.float32)
    x0, y0, bw, bh = box
    oracle = np.asarray(
        resize2d(img[y0 : y0 + bh, x0 : x0 + bw], (24, 24), method="linear", align_corners=False)
    )
    got = np.asarray(
        crop_resize_bilinear_rect(
            img, np.asarray([x0, y0, bw, bh], np.float32), (24, 24)
        )
    )
    np.testing.assert_allclose(got, oracle, atol=1e-5)


# -- fused program vs staged host path ---------------------------------------


def test_fused_iris_matches_staged(estimator, rng):
    det, face = _make_detector()
    img = rng.integers(0, 256, (120, 160, 3), np.uint8)

    fn = make_fused_iris_frame_fn(estimator, det, (120, 160))
    (depth_f, boxes_f, scores_f, valid_f, mesh_f, mscore_f,
     l_c_f, l_r_f, r_c_f, r_r_f) = fn(
        estimator.params, det._face_det_params, det._mesh_params, img
    )
    assert bool(np.asarray(valid_f)[0]), "threshold ~0 must always detect"

    # staged host path on the same frame
    face.mesh = None
    det.findIris(img)
    assert face.mesh is not None

    np.testing.assert_allclose(np.asarray(depth_f), estimator.predict(img), atol=1e-5)
    # landmark pixels: identical math modulo fp ordering; the int truncation
    # may flip a knife-edge coordinate by 1
    mesh_f = np.asarray(mesh_f)
    assert mesh_f.shape == (478, 2)
    diff = np.abs(mesh_f - face.mesh)
    assert diff.max() <= 1, f"mesh mismatch: max |Δ| = {diff.max()}"
    assert (diff == 0).mean() > 0.9

    np.testing.assert_allclose(
        np.asarray(l_c_f), np.asarray(face.l_iris["center"], np.float32), atol=1.5
    )
    np.testing.assert_allclose(float(l_r_f), face.l_iris["radius"], atol=1.5)
    np.testing.assert_allclose(
        np.asarray(r_c_f), np.asarray(face.r_iris["center"], np.float32), atol=1.5
    )
    np.testing.assert_allclose(float(r_r_f), face.r_iris["radius"], atol=1.5)


def test_fused_iris_miss_branch_returns_zeros(estimator, rng):
    """Impossible threshold → no detection → lax.cond skips the landmark
    nets and returns zeros; set_fused_mesh leaves the face state alone."""
    det, face = _make_detector(minDetectionCon=2.0)
    img = rng.integers(0, 256, (120, 160, 3), np.uint8)

    fn = make_fused_iris_frame_fn(estimator, det, (120, 160))
    out = fn(estimator.params, det._face_det_params, det._mesh_params, img)
    _depth, _boxes, _scores, valid, mesh, mscore = out[:6]
    assert not np.asarray(valid).any()
    assert np.asarray(mesh).sum() == 0
    assert float(mscore) == 0.0

    face.mesh = None
    det.set_fused_mesh(img, mesh, mscore, out[6], out[7], out[8], out[9], found=False)
    assert face.mesh is None
    assert det.results is None


def test_fused_pose_branch_matches_staged(estimator, rng):
    """include_pose=True: the detection-miss cond branch runs BlazePose in
    the same dispatch; landmarks must agree with the staged findBody path
    and body_from_fused must reproduce findBody's host mapping."""
    det, _face = _make_detector(minDetectionCon=2.0)  # always miss
    img = rng.integers(0, 256, (120, 160, 3), np.uint8)

    fn = make_fused_iris_frame_fn(estimator, det, (120, 160), include_pose=True)
    out = fn(
        estimator.params, det._face_det_params, det._mesh_params,
        det._pose_params, img,
    )
    assert len(out) == 12
    assert not np.asarray(out[3]).any()  # no detection
    plm_f, pscore_f = np.asarray(out[10]), float(out[11])

    lm_s, score_s = det._pose_fn(det._pose_params, np.ascontiguousarray(img[..., ::-1]))
    np.testing.assert_allclose(plm_f, np.asarray(lm_s), atol=1e-4)
    np.testing.assert_allclose(pscore_f, float(score_s), atol=1e-4)

    _img_f, pts_f = det.body_from_fused(img.copy(), plm_f, pscore_f)
    _img_s, pts_s = det.findBody(img.copy())
    assert np.abs(np.asarray(pts_f) - np.asarray(pts_s)).max() <= 1


def test_fused_stream_miss_uses_device_pose(estimator, monkeypatch):
    """On a miss frame the stream must consume the fused pose landmarks and
    never fire the staged findBody dispatch."""
    from depth_estimation_tpu.runtime.stream import FusedVidStream
    from depth_estimation_tpu.runtime.video import NullSink, SyntheticSource

    det, face = _make_detector(minDetectionCon=2.0)  # every frame misses
    # seed iris state so the body path takes its measurement branch
    face.l_iris = {"center": (10.0, 10.0), "radius": 5.0}

    def _boom(img):
        raise AssertionError("staged findBody dispatched despite fused pose")

    monkeypatch.setattr(det, "findBody", _boom)
    vs = FusedVidStream(
        estimator, det, face, SyntheticSource(2, 120, 160), NullSink(), verbose=False
    )
    assert vs._fused_runner.pose
    vs.stream()
    assert vs.cnt == 2
    assert vs.timer.performance["body"], "body stage never taken"


def test_fused_stream_end_to_end(estimator):
    """FusedVidStream with the full single-dispatch iris program survives a
    short synthetic stream and fills the face state via set_fused_mesh."""
    from depth_estimation_tpu.runtime.stream import FusedVidStream
    from depth_estimation_tpu.runtime.video import NullSink, SyntheticSource

    det, face = _make_detector()  # ~0 threshold ⇒ detection fires every frame
    vs = FusedVidStream(
        estimator, det, face, SyntheticSource(2, 120, 160), NullSink(), verbose=False
    )
    assert vs._fused_runner is not None and vs._fused_runner.mesh
    calls = {"iris": 0, "body": 0}
    orig_iris, orig_body = vs._iris_path, vs._body_path
    vs._iris_path = lambda d: (calls.__setitem__("iris", calls["iris"] + 1), orig_iris(d))[1]
    vs._body_path = lambda d: (calls.__setitem__("body", calls["body"] + 1), orig_body(d))[1]
    vs.stream()
    assert vs.cnt == 2
    assert vs.timer.performance["depth"], "fused dispatch never timed"
    # exactly one of the two measurement paths must run per frame (random-
    # weight mesh may trip the degenerate-iris guard → body fallback; either
    # way the frame is measured, never silently skipped)
    assert calls["iris"] + calls["body"] == 2
    assert det.results is not None, "detection fired but state never filled"
    # one rel2abs per frame + one extra per body-fallback frame (the
    # reference's fallback path calls rel2abs again, midas_mediapipe.py:96)
    assert len(face.abs_depths) == 2 + calls["body"], "depth not sampled per frame"
