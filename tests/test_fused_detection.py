"""Fused detection-only frame program (depth_by_detection's 3-tier stack as
ONE dispatch): each tier's outputs must match the staged host path."""

import numpy as np
import pytest

from depth_estimation_tpu.detect.face_detector import FaceDetector
from depth_estimation_tpu.runtime.fused import (
    FusedDetectionRunner,
    make_fused_detection_frame_fn,
)


@pytest.fixture
def rng():
    return np.random.default_rng(3)


def test_fused_tier1_matches_staged_findIris(rng):
    det = FaceDetector(minDetectionCon=1e-4)  # ~0 threshold ⇒ always hits
    img = rng.integers(0, 256, (120, 160, 3), np.uint8)

    out = FusedDetectionRunner(det)(img)
    boxes, scores, valid, mesh, plm, pscore = out
    assert bool(np.asarray(valid)[0])
    mesh_f = np.asarray(mesh)

    mesh_s = det.findIris(img)
    assert mesh_s is not None
    assert np.abs(mesh_f - np.asarray(mesh_s)).max() <= 1

    # tier-2 reuse: findFaces fed the fused detection == its own dispatch
    img2 = img.copy()
    _, bboxs_fused = det.findFaces(img2.copy(), draw=False,
                                   detection=(boxes, scores, valid))
    _, bboxs_staged = det.findFaces(img2.copy(), draw=False)
    assert len(bboxs_fused) == len(bboxs_staged)
    for a, b in zip(bboxs_fused, bboxs_staged):
        assert a["bbox"] == b["bbox"]
        np.testing.assert_allclose(a["score"], b["score"], atol=1e-5)

    # miss branch not taken: pose outputs zeroed
    assert float(pscore) == 0.0 and not np.asarray(plm).any()


def test_fused_tier3_matches_staged_findBody(rng):
    det = FaceDetector(minDetectionCon=2.0)  # impossible threshold ⇒ miss
    img = rng.integers(0, 256, (120, 160, 3), np.uint8)

    fn = make_fused_detection_frame_fn(det, (120, 160))
    impl = det._impl
    out = fn(impl._face_det_params, impl._mesh_params, impl._pose_params, img)
    _boxes, _scores, valid, mesh, plm, pscore = out
    assert not np.asarray(valid).any()
    assert not np.asarray(mesh).any()

    lm_s, score_s = impl._pose_fn(
        impl._pose_params, np.ascontiguousarray(img[..., ::-1])
    )
    np.testing.assert_allclose(np.asarray(plm), np.asarray(lm_s), atol=1e-4)
    np.testing.assert_allclose(float(pscore), float(score_s), atol=1e-4)

    _img_f, pts_f = det.body_from_fused(img.copy(), np.asarray(plm), float(pscore))
    _img_s, pts_s = det.findBody(img.copy())
    assert np.abs(np.asarray(pts_f) - np.asarray(pts_s)).max() <= 1


def test_fused_respects_bgr_feed_quirk(rng):
    """faithful=False feeds RGB to the mesh — the fused program must honor
    the flag exactly as the staged path does."""
    img = rng.integers(0, 256, (96, 128, 3), np.uint8)
    for faithful in (True, False):
        det = FaceDetector(minDetectionCon=1e-4, faithful=faithful)
        out = FusedDetectionRunner(det)(img)
        mesh_f = np.asarray(out[3])
        mesh_s = det.findIris(img)
        assert np.abs(mesh_f - np.asarray(mesh_s)).max() <= 1


def test_entry_point_runs_fused_and_staged(tmp_path, capsys):
    import depth_by_detection as dbd

    for extra in ([], ["--staged"]):
        dbd.main(["--src", "synthetic:2x96x128",
                  "--output", str(tmp_path / "out.avi"), "--quiet"] + extra)
        outerr = capsys.readouterr()
        # runs to EOF (the "No access... Exiting" print IS the reference's
        # normal end-of-stream message, depth_by_detection.py:199)
        assert "Frame count: 2.0" in outerr.out
        assert (tmp_path / "out.avi").exists()
