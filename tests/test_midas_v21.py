"""Golden tests: Flax MiDaS v2.1 Large ("MiDaS") vs functional torch oracle.

A random state dict in the authentic hub naming (MidasNet: pretrained.layer1-4
ResNeXt wrap + scratch.* decoder) drives both the torch oracle
(tests/oracles/midas_v21_torch.py) and our converter + Flax model; end-to-end
agreement proves both the architecture and the weight conversion. CI runs a
tiny config; the full-scale (3,4,23,3)/256ch model is gated by
tools/accuracy_gate.py (make gate-cpu / gate-tpu).
"""

import jax
import numpy as np
import pytest
import torch

from depth_estimation_tpu.models.midas_v21 import MidasV21, MidasV21Config
from depth_estimation_tpu.utils.convert import convert_midas_v21, midas_v21_expected_keys
from tests.oracles import midas_v21_torch as oracle

TINY = MidasV21Config(
    depths=(1, 1, 1, 1),
    planes=(8, 16, 32, 64),
    stem_features=8,
    groups=4,
    width_per_group=16,
    features=16,
    head_features=8,
    head_mid=8,
)


@pytest.fixture(scope="module")
def sd():
    return oracle.make_random_state_dict(TINY, seed=7)


@pytest.fixture(scope="module")
def flax_params(sd):
    return {"params": convert_midas_v21({k: v.numpy() for k, v in sd.items()}, TINY)}


def _apply(flax_params, x):
    return jax.jit(MidasV21(TINY).apply)(flax_params, x)


def test_param_tree_matches_flax_init(sd, flax_params):
    """Converted tree must be structurally identical to a fresh init."""
    model = MidasV21(TINY)
    ref = jax.jit(model.init)(jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32))
    ref_paths = {jax.tree_util.keystr(p): v.shape for p, v in jax.tree_util.tree_leaves_with_path(ref["params"])}
    got_paths = {jax.tree_util.keystr(p): np.asarray(v).shape for p, v in jax.tree_util.tree_leaves_with_path(flax_params["params"])}
    assert ref_paths == got_paths


def test_expected_keys_cover_oracle_dict(sd):
    assert set(midas_v21_expected_keys(TINY)) == set(sd)


@pytest.mark.parametrize("hw", [(64, 64), (96, 128)])
def test_forward_matches_torch_oracle(sd, flax_params, rng, hw):
    x = rng.standard_normal((1, *hw, 3)).astype(np.float32)
    ours = np.asarray(_apply(flax_params, x))
    ref = oracle.forward(sd, torch.from_numpy(x.transpose(0, 3, 1, 2)), TINY).numpy()
    assert ours.shape == ref.shape == (1, *hw)
    scale = np.abs(ref).max() + 1e-8
    np.testing.assert_allclose(ours / scale, ref / scale, atol=2e-5)


def test_batched_forward(sd, flax_params, rng):
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    out = np.asarray(_apply(flax_params, x))
    one = np.asarray(_apply(flax_params, x[1:]))
    np.testing.assert_allclose(out[1:], one, atol=1e-5)


def test_registry_entry():
    """'MiDaS' resolves like the reference's non-DPT branch: small_transform
    preprocess (depth_midas.py:13-16) and the v2.1 Large network."""
    from depth_estimation_tpu.config import SMALL_PREPROCESS
    from depth_estimation_tpu.registry import get_entry

    entry = get_entry("MiDaS")
    assert entry.preprocess == SMALL_PREPROCESS
    model = entry.make_model()
    assert isinstance(model, MidasV21)
    assert model.cfg.depths == (3, 4, 23, 3) and model.cfg.features == 256


@pytest.mark.parametrize("impl", ["dense", "batched", "pallas"])
def test_conv2_rewrites_match_grouped(sd, flax_params, rng, impl):
    """The MXU rewrites of the grouped conv2 (block-diagonal dense kernel,
    im2col batched matmul, Pallas shifted-matmul kernel — interpret mode on
    CPU) are numerically reassociations of the grouped conv: same params
    (tree identical — the default-config goldens above already prove the
    shipped mix against the torch oracle), outputs equal to
    accumulation-order noise. Guards the expansion/patch indexing, incl.
    the strided conv2s at layer2-4 block0."""
    import dataclasses

    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    base = dataclasses.replace(TINY, conv2_impl=("grouped",) * 4)
    ref = np.asarray(jax.jit(MidasV21(base).apply)(flax_params, x))
    cfg = dataclasses.replace(TINY, conv2_impl=(impl,) * 4)
    got = np.asarray(jax.jit(MidasV21(cfg).apply)(flax_params, x))
    scale = np.abs(ref).max() + 1e-8
    np.testing.assert_allclose(got / scale, ref / scale, atol=1e-5)


def test_conv2_auto_dispatch(sd, flax_params, rng):
    """'auto' (the shipped layer3 default) must equal the explicit lowering
    it dispatches to in each mode: batched at f32, pallas at bf16 (both
    reassociations of the grouped conv, so outputs agree with the grouped
    reference to the mode's accumulation noise)."""
    import dataclasses

    import jax.numpy as jnp

    x32 = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    auto = dataclasses.replace(TINY, conv2_impl=("auto",) * 4)
    batched = dataclasses.replace(TINY, conv2_impl=("batched",) * 4)
    a = np.asarray(jax.jit(MidasV21(auto).apply)(flax_params, x32))
    b = np.asarray(jax.jit(MidasV21(batched).apply)(flax_params, x32))
    np.testing.assert_array_equal(a, b)  # identical program at f32

    p16 = jax.tree.map(lambda v: jnp.asarray(v, jnp.bfloat16), flax_params)
    x16 = jnp.asarray(x32, jnp.bfloat16)
    a16 = np.asarray(jax.jit(MidasV21(auto).apply)(p16, x16), np.float32)
    g16 = np.asarray(
        jax.jit(MidasV21(dataclasses.replace(TINY, conv2_impl=("grouped",) * 4)
                         ).apply)(p16, x16), np.float32)
    scale = np.abs(g16).max() + 1e-8
    np.testing.assert_allclose(a16 / scale, g16 / scale, atol=0.1)
