"""Postprocess semantics, including faithful uint8 wraparound
(midas_mediapipe.py:141-150, depth_midas.py:81-85)."""

import numpy as np

from depth_estimation_tpu.ops.postprocess import depth_to_gray_u8, merge_gray3, to_video_frame


def test_faithful_cast_wraps(rng):
    d = np.array([[0.4, 255.6], [256.2, 1000.9]], dtype=np.float32)
    out = depth_to_gray_u8(d, faithful=True)
    # numpy float->uint8 cast truncates then wraps mod 256
    assert out.tolist() == [[0, 255], [0, 232]]


def test_to_video_frame_faithful_wraparound():
    d = np.array([[60.0, 10.0]], dtype=np.float32)
    out = to_video_frame(d, faithful=True)
    # 60*5=300 wraps to 44, +10 = 54 ; 10*5+10 = 60
    assert out[0, 0].tolist() == [54, 54, 54]
    assert out[0, 1].tolist() == [60, 60, 60]
    assert out.shape == (1, 2, 3)


def test_fixed_mode_normalizes(rng):
    d = rng.random((16, 16)).astype(np.float32) * 1000
    out = to_video_frame(d, faithful=False)
    assert out.dtype == np.uint8
    assert out.max() <= 255 and out.min() >= 10


def test_merge_gray3(rng):
    g = rng.integers(0, 255, (4, 5), dtype=np.uint8)
    m = merge_gray3(g)
    assert m.shape == (4, 5, 3)
    assert (m[..., 0] == g).all() and (m[..., 2] == g).all()
