"""StableHLO export round-trip: the serialized frame program must reload
without model code and reproduce the live program exactly."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def est():
    import warnings

    from depth_estimation_tpu.estimator import DepthEstimator

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return DepthEstimator("MiDaS_small", verbose=False)


def test_export_roundtrip_single_frame(est, tmp_path, rng):
    from depth_estimation_tpu.utils.export import (
        export_frame_program,
        load_frame_program,
    )

    img = rng.integers(0, 256, (64, 96, 3), np.uint8)
    ref = est.predict(img)

    blob = export_frame_program(est, (64, 96))
    path = tmp_path / "midas.shlo"
    path.write_bytes(blob)
    fn = load_frame_program(path)  # from disk, as a serving process would
    out = np.asarray(fn(est.params, img))
    np.testing.assert_array_equal(out, ref)


def test_export_roundtrip_batched(est, rng):
    from depth_estimation_tpu.utils.export import (
        export_frame_program,
        load_frame_program,
    )

    imgs = rng.integers(0, 256, (2, 64, 96, 3), np.uint8)
    ref = est.predict_batch(imgs)
    blob = export_frame_program(est, (64, 96), batched=True, batch=2)
    fn = load_frame_program(blob)
    np.testing.assert_array_equal(np.asarray(fn(est.params, imgs)), ref)


def test_export_roundtrip_fused(est, rng):
    """The config-4 FUSED program (depth + detection + mesh/iris + pose
    fallback + postprocess + sampling) exports and reloads; outputs match
    the live program exactly."""
    import jax

    from depth_estimation_tpu.runtime.fused import make_fused_iris_frame_fn
    from depth_estimation_tpu.utils.export import (
        export_fused_program,
        load_frame_program,
    )
    from tests.test_fused_iris import _make_detector

    det, _face = _make_detector()
    hw = (120, 160)
    img = rng.integers(0, 256, (*hw, 3), np.uint8)
    pts = np.asarray([[40, 50], [60, 50]], np.int32)
    live_fn = make_fused_iris_frame_fn(est, det, hw, include_pose=True,
                                       emit_depth_map=False)
    args = (est.params, det._face_det_params, det._mesh_params,
            det._pose_params, img, pts)
    ref = jax.device_get(live_fn(*args))

    blob = export_fused_program(est, det, hw, include_pose=True)
    fn = load_frame_program(blob)
    out = jax.device_get(fn(*args))
    assert set(out) == set(ref)
    for k in ref:
        np.testing.assert_array_equal(np.asarray(out[k]), np.asarray(ref[k]),
                                      err_msg=k)
