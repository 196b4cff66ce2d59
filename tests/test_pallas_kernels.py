"""Pallas kernel tests (interpret mode on CPU; compiled paths are exercised
on the real TPU by tools/tpu_smoke.py)."""

import numpy as np
import pytest

from depth_estimation_tpu.config import DPT_PREPROCESS, SMALL_PREPROCESS
from depth_estimation_tpu.ops.pallas.resize import (
    pallas_preprocess,
    pallas_resize2d,
    preprocess_fits_vmem,
)
from depth_estimation_tpu.ops.preprocess import compute_resize_shape, preprocess
from depth_estimation_tpu.ops.resize import resize2d


@pytest.mark.parametrize("cfg", [DPT_PREPROCESS, SMALL_PREPROCESS])
def test_pallas_preprocess_matches_xla(rng, cfg):
    img = rng.integers(0, 256, (120, 160, 3), np.uint8)
    out_hw = compute_resize_shape(120, 160, cfg)
    got = np.asarray(
        pallas_preprocess(img, out_hw, tuple(cfg.mean), tuple(cfg.std), interpret=True)
    )
    ref = np.asarray(preprocess(img, cfg))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=3e-5)


def test_pallas_resize2d_matches_xla(rng):
    d = rng.random((96, 128)).astype(np.float32)
    got = np.asarray(pallas_resize2d(d, (120, 160), interpret=True))
    ref = np.asarray(resize2d(d, (120, 160), method="cubic", align_corners=False))
    np.testing.assert_allclose(got, ref, atol=3e-5)


def test_vmem_budget_estimate():
    assert preprocess_fits_vmem((480, 640), (384, 512))
    assert not preprocess_fits_vmem((2160, 3840), (384, 672))
