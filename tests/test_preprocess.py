"""Preprocess parity: resize-shape policy + full transform chain vs a numpy
oracle that replicates the MiDaS hub transforms (cv2 float cubic resize)."""

import numpy as np
import pytest

from depth_estimation_tpu.config import (
    DEFAULT_PREPROCESS,
    DPT_PREPROCESS,
    SMALL_PREPROCESS,
    PreprocessConfig,
)
from depth_estimation_tpu.ops.preprocess import compute_resize_shape, preprocess


@pytest.mark.parametrize(
    "hw,cfg,expected",
    [
        # dpt_transform: 384 'minimal' — scale the closer-to-1 side, round to /32
        ((480, 640), DPT_PREPROCESS, (384, 512)),
        ((384, 384), DPT_PREPROCESS, (384, 384)),
        ((720, 1280), DPT_PREPROCESS, (384, 672)),  # scale_h=.533 closer to 1 than .3
        ((1080, 1920), DPT_PREPROCESS, (384, 672)),
        # small_transform: 256 'upper_bound' — both sides <= 256
        ((480, 640), SMALL_PREPROCESS, (192, 256)),
        ((256, 256), SMALL_PREPROCESS, (256, 256)),
        ((720, 1280), SMALL_PREPROCESS, (128, 256)),
        # default_transform: 384 'upper_bound' — both sides <= 384
        ((480, 640), DEFAULT_PREPROCESS, (288, 384)),
        ((384, 384), DEFAULT_PREPROCESS, (384, 384)),
    ],
)
def test_resize_shape_policy(hw, cfg, expected):
    assert compute_resize_shape(*hw, cfg) == expected


def _oracle(img_bgr_u8, cfg):
    """Numpy/cv2 oracle replicating the hub transform chain semantics."""
    import cv2

    rgb = img_bgr_u8[..., ::-1].astype(np.float32) / 255.0
    h, w = rgb.shape[:2]
    nh, nw = compute_resize_shape(h, w, cfg)
    resized = cv2.resize(rgb, (nw, nh), interpolation=cv2.INTER_CUBIC)
    mean = np.asarray(cfg.mean, dtype=np.float32)
    std = np.asarray(cfg.std, dtype=np.float32)
    return (resized - mean) / std


@pytest.mark.parametrize("cfg", [DPT_PREPROCESS, SMALL_PREPROCESS, DEFAULT_PREPROCESS])
@pytest.mark.parametrize("hw", [(480, 640), (240, 320)])
def test_preprocess_matches_oracle(rng, cfg, hw):
    img = rng.integers(0, 256, size=(*hw, 3), dtype=np.uint8)
    ours = np.asarray(preprocess(img, cfg))
    ref = _oracle(img, cfg)
    assert ours.shape == (1, *ref.shape)
    np.testing.assert_allclose(ours[0], ref, atol=2e-4, rtol=1e-4)


def test_preprocess_batched(rng):
    imgs = rng.integers(0, 256, size=(3, 192, 256, 3), dtype=np.uint8)
    out = np.asarray(preprocess(imgs, SMALL_PREPROCESS))
    assert out.shape[0] == 3
    one = np.asarray(preprocess(imgs[1], SMALL_PREPROCESS))
    np.testing.assert_allclose(out[1], one[0], atol=1e-6)


def test_transforms_shim_matches_preprocess(rng):
    """The torch.hub-style transforms shim equals preprocess on RGB input."""
    from depth_estimation_tpu import transforms

    rgb_u8 = rng.integers(0, 256, (480, 640, 3), np.uint8)
    out = np.asarray(transforms.dpt_transform(rgb_u8))
    ref = np.asarray(preprocess(rgb_u8, DPT_PREPROCESS, bgr_to_rgb=False))
    np.testing.assert_array_equal(out, ref)
    # float [0,1] input path
    out_f = np.asarray(transforms.small_transform(rgb_u8.astype(np.float32) / 255.0))
    ref_f = np.asarray(preprocess(rgb_u8, SMALL_PREPROCESS, bgr_to_rgb=False))
    np.testing.assert_allclose(out_f, ref_f, atol=1e-5)
    # the hub's third transform (never selected by the reference, PARITY #8b)
    out_d = np.asarray(transforms.default_transform(rgb_u8))
    ref_d = np.asarray(preprocess(rgb_u8, DEFAULT_PREPROCESS, bgr_to_rgb=False))
    np.testing.assert_array_equal(out_d, ref_d)
