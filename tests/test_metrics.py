"""Depth evaluation metrics: protocol properties + numpy oracle parity."""

import jax
import numpy as np
import pytest

from depth_estimation_tpu.train.metrics import (
    METRIC_NAMES,
    align_disparity,
    depth_metrics,
    evaluate_pairs,
)


@pytest.fixture()
def gt(rng):
    # positive disparities well away from the eps clamp
    return (rng.random((2, 16, 24)).astype(np.float32) * 2.0 + 0.5)


def test_perfect_prediction_scores_zero(gt):
    m = jax.device_get(depth_metrics(gt, gt, align=False))
    assert set(m) == set(METRIC_NAMES)
    for k in ("abs_rel", "sq_rel", "rmse", "rmse_log", "log10"):
        assert abs(float(m[k])) < 1e-5, (k, m[k])
    for k in ("d1", "d2", "d3"):
        assert float(m[k]) == pytest.approx(1.0)


def test_alignment_removes_scale_and_shift(gt):
    pred = 3.7 * gt + 0.9
    aligned = np.asarray(align_disparity(pred, gt))
    np.testing.assert_allclose(aligned, gt, atol=1e-4)
    m = jax.device_get(depth_metrics(pred, gt, align=True))
    assert float(m["abs_rel"]) < 1e-3
    # without alignment the same prediction scores badly
    m_raw = jax.device_get(depth_metrics(pred, gt, align=False))
    assert float(m_raw["abs_rel"]) > 0.5


def test_metrics_match_numpy_oracle(rng, gt):
    pred = gt * (1.0 + 0.1 * rng.standard_normal(gt.shape).astype(np.float32))
    pred = np.maximum(pred, 0.05)
    m = jax.device_get(depth_metrics(pred, gt, align=False))

    pd, gd = 1.0 / pred, 1.0 / gt
    err = pd - gd
    abs_rel = (np.abs(err) / gd).mean(axis=(1, 2)).mean()
    rmse = np.sqrt((err ** 2).mean(axis=(1, 2))).mean()
    ratio = np.maximum(pd / gd, gd / pd)
    d1 = (ratio < 1.25).mean(axis=(1, 2)).mean()
    assert float(m["abs_rel"]) == pytest.approx(abs_rel, rel=1e-5)
    assert float(m["rmse"]) == pytest.approx(rmse, rel=1e-5)
    assert float(m["d1"]) == pytest.approx(d1, rel=1e-6)


def test_invalid_pixels_are_masked(gt):
    pred = gt.copy()
    gt_holes = gt.copy()
    gt_holes[:, :4, :] = 0.0  # invalid gt (disparity 0) must not count
    pred[:, :4, :] = 50.0  # wild prediction inside the hole
    m = jax.device_get(depth_metrics(pred, gt_holes, align=False))
    assert float(m["abs_rel"]) < 1e-5
    assert float(m["d1"]) == pytest.approx(1.0)


def test_evaluate_pairs_batches_and_weights(rng):
    # apply_fn derives disparity deterministically from the image; gt equal
    # -> perfect score regardless of batching; 5 pairs at batch 2 exercises
    # the uneven tail flush
    def disp_of(img):
        return img[..., 0].astype(np.float32) / 255.0 + 0.5

    pairs = []
    for _ in range(5):
        img = rng.integers(0, 256, (16, 24, 3), np.uint8)
        pairs.append((img, disp_of(img)))

    def apply_fn(imgs_u8):
        return disp_of(np.asarray(imgs_u8))

    out = evaluate_pairs(apply_fn, iter(pairs), batch=2, align=False)
    assert out["images"] == 5
    assert out["abs_rel"] < 1e-5 and out["d1"] == pytest.approx(1.0)

    with pytest.raises(ValueError):
        evaluate_pairs(apply_fn, iter([]), batch=2)


def test_metrics_jittable(gt):
    jitted = jax.jit(lambda p, g: depth_metrics(p, g, align=True))
    m = jax.device_get(jitted(gt * 2.0, gt))
    assert float(m["abs_rel"]) < 1e-3
