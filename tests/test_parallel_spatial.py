"""Spatial partitioning of conv-model inference (GSPMD halo exchange).

predict_spatial shards a single frame's rows across a mesh axis and lets
GSPMD propagate the sharding through the conv graph. Parity against the
unsharded path on the virtual 8-device CPU mesh proves the halo-exchange
partitioning computes the same function.
"""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@pytest.fixture(scope="module")
def mesh8():
    return Mesh(np.asarray(jax.devices()[:8]).reshape(1, 8), axis_names=("dp", "tp"))


def test_tiny_v21_spatially_sharded_matches_unsharded(mesh8, rng):
    """Model-level: tiny MidasV21 with H-sharded activations == unsharded."""
    from depth_estimation_tpu.models.midas_v21 import MidasV21
    from tests.test_midas_v21 import TINY

    model = MidasV21(TINY)
    x = rng.standard_normal((1, 64, 96, 3)).astype(np.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    ref = np.asarray(jax.jit(model.apply)(params, x))

    x_sh = jax.device_put(x, NamedSharding(mesh8, P(None, "tp")))  # shard H
    params_rep = jax.device_put(params, NamedSharding(mesh8, P()))
    out = np.asarray(jax.jit(model.apply)(params_rep, x_sh))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_estimator_predict_spatial_matches_predict(mesh8, rng):
    """Estimator-level: the full frame program (preprocess + forward +
    upsample) spatially partitioned == single-device, through the public
    predict_spatial API (random-init MiDaS_small)."""
    import warnings

    from depth_estimation_tpu.estimator import DepthEstimator

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        est = DepthEstimator("MiDaS_small", verbose=False)
    img = rng.integers(0, 256, (96, 128, 3), np.uint8)
    ref = est.predict(img)
    out = est.predict_spatial(img, mesh8, axis="tp")
    assert out.shape == ref.shape == (96, 128)
    scale = np.abs(ref).max() + 1e-8
    np.testing.assert_allclose(out / scale, ref / scale, atol=2e-5)

    with pytest.raises(ValueError):
        est.predict_spatial(rng.integers(0, 256, (97, 128, 3), np.uint8), mesh8)
