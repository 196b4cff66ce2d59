"""Lowering-constant hygiene: no jitted program may capture jax.Arrays.

A device array captured as a closure constant is fetched back D2H at
LOWERING time — one blocking tunnel RPC per constant, serialized behind
all pending device work on the tunneled-TPU box (observed stalling
``fn.lower()`` for minutes during tunnel congestion, round 5). Trace-time
constants must stay host numpy so they embed into the HLO as literals
(see estimator._make_frame_fn's note). These tests pin that invariant for
every shipped frame program: a regression shows up as a non-empty device
const list, not as a mysteriously slow bench three rounds later.
"""

import flax.linen as nn
import jax
import numpy as np
import pytest

from depth_estimation_tpu import registry
from depth_estimation_tpu.config import SMALL_PREPROCESS
from depth_estimation_tpu.estimator import DepthEstimator


class _TinyDepthNet(nn.Module):
    @nn.compact
    def __call__(self, x):
        h = nn.Conv(8, (3, 3), strides=(2, 2), padding="SAME")(x)
        return nn.relu(nn.Conv(1, (3, 3), padding="SAME")(h))[..., 0]


@pytest.fixture(scope="module", autouse=True)
def _register_tiny():
    registry.register(
        registry.ModelEntry(
            "Tiny_consts_test", _TinyDepthNet, SMALL_PREPROCESS, lambda sd: sd
        )
    )


@pytest.fixture(scope="module")
def estimator():
    with pytest.warns(UserWarning, match="random"):
        return DepthEstimator("Tiny_consts_test", verbose=False)


def _device_consts(traced):
    return [
        (type(c).__name__, getattr(c, "shape", None))
        for c in traced.jaxpr.consts
        if isinstance(c, jax.Array)
    ]


def test_frame_fn_has_no_device_consts(estimator):
    img = np.zeros((96, 128, 3), np.uint8)
    for output in ("f32", "u8"):
        fn = estimator.frame_fn((96, 128), output=output)
        bad = _device_consts(fn.trace(estimator.params, img))
        assert bad == [], f"device-array consts in frame_fn({output}): {bad}"


def test_batched_fn_has_no_device_consts(estimator):
    imgs = np.zeros((2, 96, 128, 3), np.uint8)
    fn = estimator._batched_fn((96, 128))
    bad = _device_consts(fn.trace(estimator.params, imgs))
    assert bad == [], f"device-array consts in batched_fn: {bad}"


def test_fused_iris_program_has_no_device_consts(estimator):
    from depth_estimation_tpu.detect.person_detector import PersonDetector
    from depth_estimation_tpu.geometry.face import FaceDet
    from depth_estimation_tpu.runtime.fused import make_fused_iris_frame_fn

    det = PersonDetector(
        FaceDet(20, [505, 504, 675, 501]), minDetectionCon=1e-4, params={},
        seed=0,
    )
    fn = make_fused_iris_frame_fn(
        estimator, det, (96, 128), include_pose=True, emit_depth_map=False
    )
    img = np.zeros((96, 128, 3), np.uint8)
    zero_pts = np.zeros((2, 2), np.int32)
    bad = _device_consts(fn.trace(
        estimator.params, det._face_det_params, det._mesh_params,
        det._pose_params, img, zero_pts,
    ))
    assert bad == [], f"device-array consts in fused iris program: {bad}"


def test_fused_detection_program_has_no_device_consts():
    from depth_estimation_tpu.detect.face_detector import FaceDetector
    from depth_estimation_tpu.runtime.fused import make_fused_detection_frame_fn

    det = FaceDetector(minDetectionCon=1e-4)
    fn = make_fused_detection_frame_fn(det, (96, 128))
    impl = det._impl
    img = np.zeros((96, 128, 3), np.uint8)
    bad = _device_consts(fn.trace(
        impl._face_det_params, impl._mesh_params, impl._pose_params, img
    ))
    assert bad == [], f"device-array consts in fused detection program: {bad}"
