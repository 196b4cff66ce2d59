"""Golden tests: Flax MiDaS-small vs functional torch oracle.

A random state dict in the authentic hub naming drives both the torch oracle
(tests/oracles/midas_small_torch.py) and our converter + Flax model; end-to-end
agreement proves both the architecture and the weight conversion.
"""

import jax
import numpy as np
import pytest
import torch

from depth_estimation_tpu.models.midas_small import MidasSmall
from depth_estimation_tpu.utils.convert import convert_midas_small
from tests.oracles import midas_small_torch as oracle


@pytest.fixture(scope="module")
def sd():
    return oracle.make_random_state_dict(seed=7)


@pytest.fixture(scope="module")
def flax_params(sd):
    return {"params": convert_midas_small({k: v.numpy() for k, v in sd.items()})}


def _apply(flax_params, x):
    return jax.jit(MidasSmall().apply)(flax_params, x)


def test_param_tree_matches_flax_init(sd, flax_params):
    """Converted tree must be structurally identical to a fresh init."""
    model = MidasSmall()
    ref = jax.jit(model.init)(jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32))
    ref_paths = {jax.tree_util.keystr(p): v.shape for p, v in jax.tree_util.tree_leaves_with_path(ref["params"])}
    got_paths = {jax.tree_util.keystr(p): np.asarray(v).shape for p, v in jax.tree_util.tree_leaves_with_path(flax_params["params"])}
    assert ref_paths == got_paths


@pytest.mark.parametrize("hw", [(64, 64), (96, 128)])
def test_forward_matches_torch_oracle(sd, flax_params, rng, hw):
    x = rng.standard_normal((1, *hw, 3)).astype(np.float32)
    ours = np.asarray(_apply(flax_params, x))
    ref = oracle.forward(sd, torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    assert ours.shape == ref.shape == (1, *hw)
    # abs-rel error against the oracle's dynamic range
    scale = np.abs(ref).max() + 1e-8
    np.testing.assert_allclose(ours / scale, ref / scale, atol=2e-5)


def test_forward_256(sd, flax_params, rng):
    """MiDaS-small native input bucket (small_transform: 256 upper_bound)."""
    x = rng.standard_normal((1, 192, 256, 3)).astype(np.float32)
    ours = np.asarray(_apply(flax_params, x))
    ref = oracle.forward(sd, torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    scale = np.abs(ref).max() + 1e-8
    np.testing.assert_allclose(ours / scale, ref / scale, atol=5e-5)


def test_batched_forward(sd, flax_params, rng):
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    out = np.asarray(_apply(flax_params, x))
    one = np.asarray(_apply(flax_params, x[1:]))
    np.testing.assert_allclose(out[1:], one, atol=1e-5)
