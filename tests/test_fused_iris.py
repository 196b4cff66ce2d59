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


@pytest.mark.parametrize("impl", ["gather", "matmul"])
@pytest.mark.parametrize(
    "box", [(3, 5, 40, 32), (0, 0, 80, 64), (60, 40, 17, 11), (10, 20, 6, 6)]
)
def test_crop_resize_rect_matches_slice_resize(rng, box, impl):
    """BOTH dynamic-box crop implementations (gather and the shipped MXU
    matmul default) == host slice + resize2d (incl. the box-edge clamp when
    the box is smaller than the output). ADVICE r2: the matmul form is the
    default and needs its own direct oracle."""
    from depth_estimation_tpu.ops.sampling import crop_resize_linear_matmul

    fn = crop_resize_bilinear_rect if impl == "gather" else crop_resize_linear_matmul
    img = rng.random((64, 80, 3), dtype=np.float32)
    x0, y0, bw, bh = box
    oracle = np.asarray(
        resize2d(img[y0 : y0 + bh, x0 : x0 + bw], (24, 24), method="linear", align_corners=False)
    )
    got = np.asarray(fn(img, np.asarray([x0, y0, bw, bh], np.float32), (24, 24)))
    np.testing.assert_allclose(got, oracle, atol=1e-5)


# -- fused program vs staged host path ---------------------------------------


ZERO_PTS = np.zeros((2, 2), np.int32)


def test_fused_iris_matches_staged(estimator, rng):
    det, face = _make_detector()
    img = rng.integers(0, 256, (120, 160, 3), np.uint8)

    fn = make_fused_iris_frame_fn(estimator, det, (120, 160))
    out = fn(estimator.params, det._face_det_params, det._mesh_params, img, ZERO_PTS)
    assert bool(np.asarray(out["valid"])[0]), "threshold ~0 must always detect"

    # staged host path on the same frame
    face.mesh = None
    det.findIris(img)
    assert face.mesh is not None

    np.testing.assert_allclose(np.asarray(out["depth"]), estimator.predict(img), atol=1e-5)
    # landmark pixels: identical math modulo fp ordering; the int truncation
    # may flip a knife-edge coordinate by 1
    mesh_f = np.asarray(out["mesh"])
    assert mesh_f.shape == (478, 2)
    diff = np.abs(mesh_f - face.mesh)
    assert diff.max() <= 1, f"mesh mismatch: max |Δ| = {diff.max()}"
    assert (diff == 0).mean() > 0.9

    np.testing.assert_allclose(
        np.asarray(out["l_center"]), np.asarray(face.l_iris["center"], np.float32), atol=1.5
    )
    np.testing.assert_allclose(float(out["l_radius"]), face.l_iris["radius"], atol=1.5)
    np.testing.assert_allclose(
        np.asarray(out["r_center"]), np.asarray(face.r_iris["center"], np.float32), atol=1.5
    )
    np.testing.assert_allclose(float(out["r_radius"]), face.r_iris["radius"], atol=1.5)


def test_fused_vis_u8_matches_host_postprocess(estimator, rng):
    """The device-side output postprocess (wraparound cast, *5, +10) must
    equal the host to_video_frame on the same f32 map — byte-for-byte."""
    from depth_estimation_tpu.ops.postprocess import to_video_frame

    det, _face = _make_detector()
    img = rng.integers(0, 256, (120, 160, 3), np.uint8)
    fn = make_fused_iris_frame_fn(estimator, det, (120, 160))
    out = fn(estimator.params, det._face_det_params, det._mesh_params, img, ZERO_PTS)
    host = to_video_frame(np.asarray(out["depth"]), faithful=True)
    np.testing.assert_array_equal(np.asarray(out["vis_u8"]), host[..., 0])


def test_fused_iris_sample_matches_host_get_depth(estimator, rng):
    """Device-side iris depth sampling == FaceDet.get_depth (faithful
    quirks: transposed indexing, the l/r clamp mixup) on the same map."""
    from depth_estimation_tpu.geometry.face import FaceDet

    det, face = _make_detector()
    img = rng.integers(0, 256, (120, 160, 3), np.uint8)
    fn = make_fused_iris_frame_fn(estimator, det, (120, 160))
    out = fn(estimator.params, det._face_det_params, det._mesh_params, img, ZERO_PTS)
    assert bool(np.asarray(out["valid"])[0])

    oracle = FaceDet(20, [505, 504, 675, 501])
    oracle.mesh = np.asarray(out["mesh"])  # any non-None mesh selects the iris branch
    l_c = np.asarray(out["l_center"], np.float64)
    r_c = np.asarray(out["r_center"], np.float64)
    oracle.l_iris = {"center": (float(l_c[0]), float(l_c[1])), "radius": float(out["l_radius"])}
    oracle.r_iris = {"center": (float(r_c[0]), float(r_c[1])), "radius": float(out["r_radius"])}
    oracle.get_depth(np.asarray(out["depth"]))
    np.testing.assert_allclose(float(out["iris_sample"]), oracle.ri_depth, rtol=1e-6)


def test_fused_fallback_sample_matches_host_get_depth(estimator, rng):
    """Device-side body-fallback sampling at host-provided head points ==
    FaceDet.get_depth's faithful head_pts branch."""
    from depth_estimation_tpu.geometry.face import FaceDet

    det, _face = _make_detector(minDetectionCon=2.0)  # miss → fallback relevant
    img = rng.integers(0, 256, (120, 160, 3), np.uint8)
    pts = np.asarray([[17, 23], [95, 110]], np.int32)
    fn = make_fused_iris_frame_fn(estimator, det, (120, 160))
    out = fn(estimator.params, det._face_det_params, det._mesh_params, img, pts)

    oracle = FaceDet(20, [505, 504, 675, 501])
    oracle.mesh = None
    oracle.head_pts = (tuple(pts[0]), tuple(pts[1]))
    oracle.get_depth(np.asarray(out["depth"]))
    np.testing.assert_allclose(float(out["fallback_sample"]), oracle.ri_depth, rtol=1e-6)


def test_fused_iris_miss_branch_returns_zeros(estimator, rng):
    """Impossible threshold → no detection → lax.cond skips the landmark
    nets and returns zeros; set_fused_mesh leaves the face state alone."""
    det, face = _make_detector(minDetectionCon=2.0)
    img = rng.integers(0, 256, (120, 160, 3), np.uint8)

    fn = make_fused_iris_frame_fn(estimator, det, (120, 160))
    out = fn(estimator.params, det._face_det_params, det._mesh_params, img, ZERO_PTS)
    assert not np.asarray(out["valid"]).any()
    assert np.asarray(out["mesh"]).sum() == 0
    assert float(out["mesh_score"]) == 0.0

    face.mesh = None
    det.set_fused_mesh(img, out["mesh"], out["mesh_score"], out["l_center"],
                       out["l_radius"], out["r_center"], out["r_radius"], found=False)
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
        det._pose_params, img, ZERO_PTS,
    )
    assert not np.asarray(out["valid"]).any()  # no detection
    assert "ears_sample" in out
    plm_f, pscore_f = np.asarray(out["pose_lm"]), float(out["pose_score"])

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
    assert vs.timer.cpu.get("depth"), "host-CPU share not recorded"
    # exactly one of the two measurement paths must run per frame (random-
    # weight mesh may trip the degenerate-iris guard → body fallback; either
    # way the frame is measured, never silently skipped)
    assert calls["iris"] + calls["body"] == 2
    assert det.results is not None, "detection fired but state never filled"
    # one rel2abs per frame + one extra per body-fallback frame (the
    # reference's fallback path calls rel2abs again, midas_mediapipe.py:96)
    assert len(face.abs_depths) == 2 + calls["body"], "depth not sampled per frame"


@pytest.mark.parametrize(
    "depth", [1, pytest.param(3, marks=pytest.mark.full)]
)
def test_fused_stream_pipeline_depth_equivalent(estimator, depth):
    """The pipelined fused loop (frames in flight) must write the same
    frames and record the same depth samples as the synchronous depth-1
    loop when detection fires every frame."""
    from depth_estimation_tpu.runtime.stream import FusedVidStream
    from depth_estimation_tpu.runtime.video import NullSink, SyntheticSource

    def run(pd):
        det, face = _make_detector()
        sink = NullSink()
        vs = FusedVidStream(estimator, det, face, SyntheticSource(4, 120, 160),
                            sink, verbose=False, pipeline_depth=pd)
        vs.stream()
        return face, sink

    face_a, sink_a = run(1)
    face_b, sink_b = run(depth)
    assert sink_a.frames_written == sink_b.frames_written == 4
    np.testing.assert_array_equal(sink_a.last_frame, sink_b.last_frame)
    np.testing.assert_allclose(face_a.ri_depths, face_b.ri_depths, rtol=1e-6)
    np.testing.assert_allclose(face_a.s2c_ds, face_b.s2c_ds, rtol=1e-6)


@pytest.mark.parametrize(
    "k", [2, pytest.param(8, marks=pytest.mark.full)]
)
def test_fused_stream_microbatch_equivalent(estimator, k):
    """microbatch=K (vmapped fused program, one dispatch + one fetch per K
    frames) must write the same frame count and record the same per-frame
    depth samples/distances as the per-frame fused loop — incl. a padded
    tail tick (5 % 2 != 0) and K > n. Frames compare within 1 u8 step
    (batched-vs-single XLA reduction order)."""
    from depth_estimation_tpu.runtime.stream import FusedVidStream
    from depth_estimation_tpu.runtime.video import NullSink, SyntheticSource

    def run(mb):
        det, face = _make_detector()
        sink = NullSink()
        vs = FusedVidStream(estimator, det, face, SyntheticSource(5, 120, 160),
                            sink, verbose=False, microbatch=mb)
        vs.stream()
        return face, sink, vs

    face_a, sink_a, _ = run(1)
    face_b, sink_b, vs_b = run(k)
    assert sink_a.frames_written == sink_b.frames_written == 5
    assert vs_b.cnt == 5
    diff = np.abs(sink_a.last_frame.astype(np.int16) - sink_b.last_frame.astype(np.int16))
    assert diff.max() <= 1, f"frame mismatch: max |Δ| = {diff.max()}"
    np.testing.assert_allclose(face_a.ri_depths, face_b.ri_depths, rtol=1e-5)
    np.testing.assert_allclose(face_a.s2c_ds, face_b.s2c_ds, rtol=1e-5)
    # amortized spans still cover every frame
    assert len(vs_b.timer.performance["depth"]) == 5


def test_fused_stream_microbatch_one_fetch_per_tick(estimator, monkeypatch):
    """5 frames at microbatch=2 → 3 ticks → exactly 3 device_gets."""
    import jax

    from depth_estimation_tpu.runtime.stream import FusedVidStream
    from depth_estimation_tpu.runtime.video import NullSink, SyntheticSource

    det, face = _make_detector()
    vs = FusedVidStream(estimator, det, face, SyntheticSource(5, 120, 160),
                        NullSink(), verbose=False, microbatch=2)
    calls = {"n": 0}
    real = jax.device_get

    def counting(x):
        calls["n"] += 1
        return real(x)

    monkeypatch.setattr(jax, "device_get", counting)
    vs.stream()
    assert calls["n"] == 3, f"expected 3 tick fetches, saw {calls['n']}"


def test_fused_stream_microbatch_requires_fused(estimator):
    from depth_estimation_tpu.runtime.stream import FusedVidStream
    from depth_estimation_tpu.runtime.video import NullSink, SyntheticSource

    det, face = _make_detector()
    with pytest.raises(ValueError, match="microbatch"):
        FusedVidStream(estimator, det, face, SyntheticSource(2, 120, 160),
                       NullSink(), verbose=False, fused=False, microbatch=2)


def test_fused_stream_single_device_get(estimator, monkeypatch):
    """ADVICE r2 (medium): the fused streaming path must fetch each frame's
    outputs with exactly ONE jax.device_get — every extra fetch is its own
    ~100 ms round trip through a tunneled chip."""
    import jax

    from depth_estimation_tpu.runtime import stream as stream_mod
    from depth_estimation_tpu.runtime.stream import FusedVidStream
    from depth_estimation_tpu.runtime.video import NullSink, SyntheticSource

    det, face = _make_detector()
    vs = FusedVidStream(estimator, det, face, SyntheticSource(3, 120, 160),
                        NullSink(), verbose=False)
    calls = {"n": 0}
    real = jax.device_get

    def counting(x):
        calls["n"] += 1
        return real(x)

    monkeypatch.setattr(jax, "device_get", counting)
    vs.stream()
    assert calls["n"] == 3, f"expected 1 device_get per frame, saw {calls['n']} for 3 frames"
