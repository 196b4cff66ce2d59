"""Golden tests for the matmul-based resize against torch and OpenCV.

The accuracy budget for the whole pipeline is 1e-3 abs-rel (BASELINE.md), so
the resize layer itself must match the reference ops to ~1e-5.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from depth_estimation_tpu.ops.resize import interp_matrix, resize2d


def torch_resize(x_hwc, out_hw, mode, align_corners):
    t = torch.from_numpy(np.ascontiguousarray(x_hwc.transpose(2, 0, 1)))[None]
    r = F.interpolate(t, size=out_hw, mode=mode, align_corners=align_corners)
    return r[0].numpy().transpose(1, 2, 0)


@pytest.mark.parametrize("in_hw,out_hw", [((17, 23), (34, 46)), ((64, 48), (384, 288)),
                                          ((100, 100), (37, 53)), ((384, 384), (480, 640))])
@pytest.mark.parametrize("align_corners", [False, True])
def test_bicubic_matches_torch(rng, in_hw, out_hw, align_corners):
    x = rng.random((*in_hw, 3)).astype(np.float32)
    ours = np.asarray(resize2d(x, out_hw, method="cubic", align_corners=align_corners))
    ref = torch_resize(x, out_hw, "bicubic", align_corners)
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("in_hw,out_hw", [((16, 16), (32, 32)), ((24, 24), (48, 48)),
                                          ((13, 29), (26, 58)), ((56, 72), (112, 144))])
@pytest.mark.parametrize("align_corners", [False, True])
def test_bilinear_matches_torch(rng, in_hw, out_hw, align_corners):
    x = rng.random((*in_hw, 4)).astype(np.float32)
    ours = np.asarray(resize2d(x, out_hw, method="linear", align_corners=align_corners))
    ref = torch_resize(x, out_hw, "bilinear", align_corners)
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", [((480, 640), (288, 384)), ((720, 1280), (384, 672)),
                                          ((100, 160), (256, 416))])
def test_cubic_matches_cv2_float(rng, in_hw, out_hw):
    """cv2.resize INTER_CUBIC on float32 input — the MiDaS transform path."""
    import cv2

    x = rng.random((*in_hw, 3)).astype(np.float32)
    ours = np.asarray(resize2d(x, out_hw, method="cubic", align_corners=False))
    ref = cv2.resize(x, (out_hw[1], out_hw[0]), interpolation=cv2.INTER_CUBIC)
    np.testing.assert_allclose(ours, ref, atol=5e-5, rtol=1e-4)


def test_identity_resize_is_noop(rng):
    x = rng.random((32, 32, 3)).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(resize2d(x, (32, 32))), x)


def test_interp_matrix_rows_sum_to_one():
    for method in ("cubic", "linear"):
        for ac in (False, True):
            W = interp_matrix(37, 91, method, ac)
            np.testing.assert_allclose(W.sum(axis=1), 1.0, atol=1e-6)


def test_batched_and_2d_inputs(rng):
    x = rng.random((2, 24, 24, 3)).astype(np.float32)
    out = np.asarray(resize2d(x, (48, 48), method="linear", align_corners=True))
    assert out.shape == (2, 48, 48, 3)
    single = np.asarray(resize2d(x[0], (48, 48), method="linear", align_corners=True))
    np.testing.assert_allclose(out[0], single, atol=1e-6)

    d = rng.random((24, 24)).astype(np.float32)
    out2d = np.asarray(resize2d(d, (48, 48), method="cubic"))
    assert out2d.shape == (48, 48)


@pytest.mark.parametrize("align_corners", [False, True])
@pytest.mark.parametrize("hw,c,co", [((13, 17), 8, 5), ((24, 32), 16, 32)])
def test_upsample2x_conv3x3_matches_literal_chain(rng, align_corners, hw, c, co):
    """Fused head op == upsample-then-SAME-conv against torch, incl. borders."""
    from depth_estimation_tpu.ops.resize import upsample2x_conv3x3

    h, w = hw
    x = rng.random((2, h, w, c)).astype(np.float32)
    k = (rng.random((3, 3, c, co)).astype(np.float32) - 0.5)
    bias = rng.random((co,)).astype(np.float32)

    ours = np.asarray(upsample2x_conv3x3(x, k, bias, align_corners=align_corners))

    up = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                       scale_factor=2, mode="bilinear",
                       align_corners=align_corners)
    ref = F.conv2d(up, torch.from_numpy(k).permute(3, 2, 0, 1),
                   torch.from_numpy(bias), padding=1)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=2e-4)


def test_upsample2x_conv3x3_rejects_wrong_kernel(rng):
    from depth_estimation_tpu.ops.resize import upsample2x_conv3x3

    x = rng.random((1, 8, 8, 4)).astype(np.float32)
    with pytest.raises(ValueError):
        upsample2x_conv3x3(x, np.zeros((5, 5, 4, 2), np.float32))
    with pytest.raises(ValueError):
        upsample2x_conv3x3(x, np.zeros((3, 3, 3, 2), np.float32))
