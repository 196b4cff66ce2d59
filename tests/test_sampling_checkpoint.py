"""On-device sampling ops + checkpoint round-trip + weight-import CLI."""

import numpy as np
import pytest

from depth_estimation_tpu.ops.sampling import (
    depth_at_points,
    iris_depth,
    masked_median,
    roi_median_depth,
    rois_median_depth,
)


def test_depth_at_points_corrected_and_faithful(rng):
    d = rng.random((48, 64)).astype(np.float32)
    pts = np.array([[10, 20], [63, 47], [100, 100]], np.float32)  # (x, y)
    out = np.asarray(depth_at_points(d, pts))
    assert out[0] == d[20, 10]
    assert out[1] == d[47, 63]
    assert out[2] == d[47, 63]  # clamped
    # faithful transposed indexing: depth[x, y] with x clamped to H
    outf = np.asarray(depth_at_points(d, pts, faithful=True))
    assert outf[0] == d[10, 20]


def test_iris_depth_mean(rng):
    d = rng.random((48, 64)).astype(np.float32)
    v = float(iris_depth(d, np.array([10.0, 20.0]), np.array([30.0, 21.0])))
    assert np.isclose(v, (d[20, 10] + d[21, 30]) / 2)


def test_masked_median_matches_numpy(rng):
    v = rng.random((16, 16)).astype(np.float32)
    m = rng.random((16, 16)) > 0.6
    if m.sum() == 0:
        m[0, 0] = True
    got = float(masked_median(v, m))
    assert np.isclose(got, np.median(v[m]))


def test_roi_median_depth(rng):
    d = rng.random((32, 32)).astype(np.float32)
    box = np.array([4, 6, 20, 25], np.int32)
    got = float(roi_median_depth(d, box))
    assert np.isclose(got, np.median(d[4:20, 6:25]))
    # empty box -> nan
    assert np.isnan(float(roi_median_depth(d, np.array([5, 5, 5, 5], np.int32))))


def test_rois_median_vectorized(rng):
    d = rng.random((32, 32)).astype(np.float32)
    boxes = np.array([[0, 0, 8, 8], [8, 8, 32, 32], [0, 0, 0, 0]], np.int32)
    valid = np.array([True, True, False])
    out = np.asarray(rois_median_depth(d, boxes, valid))
    assert np.isclose(out[0], np.median(d[0:8, 0:8]))
    assert np.isclose(out[1], np.median(d[8:32, 8:32]))
    assert np.isnan(out[2])


def test_checkpoint_roundtrip(tmp_path, monkeypatch, rng):
    monkeypatch.setenv("DEPTH_ESTIMATION_TPU_CACHE", str(tmp_path))
    from depth_estimation_tpu.utils import checkpoint as ckpt

    params = {"layer": {"kernel": rng.random((4, 4)).astype(np.float32),
                        "bias": rng.random(4).astype(np.float32)}}
    ckpt.save_params("Test_model", params, meta={"k": "v"})
    back = ckpt.load_params("Test_model")
    np.testing.assert_array_equal(back["layer"]["kernel"], params["layer"]["kernel"])
    assert ckpt.load_params("Missing_model") is None


def test_import_torch_checkpoint_cli(tmp_path, monkeypatch):
    """End-to-end: a fake hub .pt file → converted cache → DepthEstimator
    picks it up (no random-init warning)."""
    import torch

    monkeypatch.setenv("DEPTH_ESTIMATION_TPU_CACHE", str(tmp_path))
    from tests.oracles import midas_small_torch as oracle

    sd = oracle.make_random_state_dict(seed=11)
    pt = tmp_path / "midas_v21_small_256.pt"
    torch.save(sd, pt)

    from depth_estimation_tpu.tools.import_weights import main

    assert main([str(pt), "MiDaS_small"]) == 0

    # second import with same content is a cache hit (no re-conversion crash)
    assert main([str(pt), "MiDaS_small"]) == 0

    import warnings

    from depth_estimation_tpu.estimator import DepthEstimator

    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any random-init warning -> failure
        est = DepthEstimator("MiDaS_small", verbose=False)
    img = np.random.default_rng(0).integers(0, 256, (96, 128, 3), np.uint8)
    out = est.predict(img)
    assert out.shape == (96, 128)

    # and the prediction matches the torch oracle end-to-end (real weights path)
    import cv2
    import torch as _t

    rgb = img[..., ::-1].astype(np.float32) / 255.0
    from depth_estimation_tpu.ops.preprocess import compute_resize_shape

    nh, nw = compute_resize_shape(96, 128, est.preprocess_cfg)
    resized = cv2.resize(rgb, (nw, nh), interpolation=cv2.INTER_CUBIC)
    mean = np.asarray(est.preprocess_cfg.mean, np.float32)
    std = np.asarray(est.preprocess_cfg.std, np.float32)
    x = ((resized - mean) / std).transpose(2, 0, 1)[None]
    pred = oracle.forward(sd, _t.from_numpy(x))
    pred = _t.nn.functional.interpolate(
        pred[None], size=(96, 128), mode="bicubic", align_corners=False
    )[0, 0].numpy()
    scale = np.abs(pred).max() + 1e-8
    np.testing.assert_allclose(out / scale, pred / scale, atol=2e-4)


@pytest.mark.skipif(
    not __import__("os").environ.get("DEPTH_TPU_REHEARSAL"),
    reason="full-size 105M-param .pt rehearsal is opt-in (DEPTH_TPU_REHEARSAL=1)",
)
def test_import_torch_checkpoint_cli_midas_v21(tmp_path, monkeypatch):
    """Drop-day rehearsal for the v2.1 'MiDaS' hub file at REAL size:
    torch.save'd full-scale state dict → import_weights CLI → orbax cache →
    DepthEstimator auto-load → prediction matches the torch oracle.
    (CI covers the same converter at tiny scale in test_midas_v21.py.)"""
    import torch

    monkeypatch.setenv("DEPTH_ESTIMATION_TPU_CACHE", str(tmp_path))
    from tests.oracles import midas_v21_torch as oracle

    sd = oracle.make_random_state_dict(seed=17)
    pt = tmp_path / "model-f6b98070.pt"  # real hub filename for MiDaS v2.1
    torch.save(sd, pt)

    from depth_estimation_tpu.tools.import_weights import main

    assert main([str(pt), "MiDaS"]) == 0

    import warnings

    from depth_estimation_tpu.estimator import DepthEstimator

    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any random-init warning -> failure
        est = DepthEstimator("MiDaS", verbose=False)
    img = np.random.default_rng(0).integers(0, 256, (96, 128, 3), np.uint8)
    out = est.predict(img)
    assert out.shape == (96, 128)

    import cv2
    import torch as _t

    rgb = img[..., ::-1].astype(np.float32) / 255.0
    from depth_estimation_tpu.ops.preprocess import compute_resize_shape

    nh, nw = compute_resize_shape(96, 128, est.preprocess_cfg)
    resized = cv2.resize(rgb, (nw, nh), interpolation=cv2.INTER_CUBIC)
    mean = np.asarray(est.preprocess_cfg.mean, np.float32)
    std = np.asarray(est.preprocess_cfg.std, np.float32)
    x = ((resized - mean) / std).transpose(2, 0, 1)[None]
    pred = oracle.forward(sd, _t.from_numpy(x))
    pred = _t.nn.functional.interpolate(
        pred[None], size=(96, 128), mode="bicubic", align_corners=False
    )[0, 0].numpy()
    scale = np.abs(pred).max() + 1e-8
    np.testing.assert_allclose(out / scale, pred / scale, atol=2e-4)
