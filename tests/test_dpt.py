"""Golden tests: Flax DPT vs functional torch oracle (tiny configs on CPU)."""

import jax
import numpy as np
import pytest
import torch

from depth_estimation_tpu.models.dpt import DPT, DPTConfig
from depth_estimation_tpu.utils.convert import convert_dpt
from tests.oracles import dpt_torch as oracle

TINY = DPTConfig(
    embed_dim=64,
    depth=4,
    num_heads=2,
    hooks=(0, 1, 2, 3),
    reassemble_channels=(16, 32, 64, 64),
    features=32,
    img_size=64,
)


@pytest.fixture(scope="module")
def sd():
    return oracle.make_random_state_dict(TINY, seed=3)


@pytest.fixture(scope="module")
def flax_params(sd):
    return {"params": convert_dpt({k: v.numpy() for k, v in sd.items()}, TINY)}


def test_param_tree_matches_init(sd, flax_params):
    model = DPT(TINY)
    ref = jax.jit(model.init)(jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32))
    ref_paths = {jax.tree_util.keystr(p): v.shape for p, v in jax.tree_util.tree_leaves_with_path(ref["params"])}
    got_paths = {jax.tree_util.keystr(p): np.asarray(v).shape for p, v in jax.tree_util.tree_leaves_with_path(flax_params["params"])}
    assert ref_paths == got_paths


def test_forward_matches_torch_oracle_native_grid(sd, flax_params, rng):
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    ours = np.asarray(jax.jit(DPT(TINY).apply)(flax_params, x))
    ref = oracle.forward(sd, torch.from_numpy(x.transpose(0, 3, 1, 2)), TINY).numpy()
    assert ours.shape == ref.shape == (1, 64, 64)
    scale = np.abs(ref).max() + 1e-8
    np.testing.assert_allclose(ours / scale, ref / scale, atol=5e-5)


def test_forward_matches_with_pos_embed_interpolation(sd, flax_params, rng):
    """Non-native input grid exercises the DPT _resize_pos_embed path."""
    x = rng.standard_normal((1, 96, 128, 3)).astype(np.float32)
    ours = np.asarray(jax.jit(DPT(TINY).apply)(flax_params, x))
    ref = oracle.forward(sd, torch.from_numpy(x.transpose(0, 3, 1, 2)), TINY).numpy()
    assert ours.shape == ref.shape == (1, 96, 128)
    scale = np.abs(ref).max() + 1e-8
    np.testing.assert_allclose(ours / scale, ref / scale, atol=5e-5)


def test_pallas_attention_matches_xla(rng):
    from depth_estimation_tpu.ops.pallas.attention import multi_head_attention, _attention_xla

    q = rng.standard_normal((2, 4, 577, 64)).astype(np.float32)
    k = rng.standard_normal((2, 4, 577, 64)).astype(np.float32)
    v = rng.standard_normal((2, 4, 577, 64)).astype(np.float32)
    ref = np.asarray(_attention_xla(q, k, v, 64 ** -0.5))
    # interpret=True runs the Pallas kernel logic on CPU
    got = np.asarray(multi_head_attention(q, k, v, use_pallas=True, interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


TINY_HYBRID = DPTConfig(
    embed_dim=64,
    depth=4,
    num_heads=2,
    hooks=(0, 1, 2, 3),
    reassemble_channels=(256, 512, 64, 64),
    features=32,
    hybrid=True,
    img_size=64,
)


@pytest.fixture(scope="module")
def sd_hybrid():
    return oracle.make_random_state_dict(TINY_HYBRID, seed=5)


@pytest.fixture(scope="module")
def flax_params_hybrid(sd_hybrid):
    return {"params": convert_dpt({k: v.numpy() for k, v in sd_hybrid.items()}, TINY_HYBRID)}


def test_hybrid_param_tree_matches_init(sd_hybrid, flax_params_hybrid):
    model = DPT(TINY_HYBRID)
    ref = jax.jit(model.init)(jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32))
    ref_paths = {jax.tree_util.keystr(p): v.shape for p, v in jax.tree_util.tree_leaves_with_path(ref["params"])}
    got_paths = {jax.tree_util.keystr(p): np.asarray(v).shape for p, v in jax.tree_util.tree_leaves_with_path(flax_params_hybrid["params"])}
    assert ref_paths == got_paths


def test_hybrid_forward_matches_torch_oracle(sd_hybrid, flax_params_hybrid, rng):
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    ours = np.asarray(jax.jit(DPT(TINY_HYBRID).apply)(flax_params_hybrid, x))
    ref = oracle.forward_hybrid(sd_hybrid, torch.from_numpy(x.transpose(0, 3, 1, 2)), TINY_HYBRID).numpy()
    assert ours.shape == ref.shape == (1, 64, 64)
    scale = np.abs(ref).max() + 1e-8
    np.testing.assert_allclose(ours / scale, ref / scale, atol=1e-4)


def test_shipped_hybrid_precision_mix():
    """The registry's DPT_Hybrid ships the round-4 section mix: ambient
    f32_precision 'highest' (covers exactly the ResNetV2 stem, which needs
    6-pass — 2.8e-3 at 'high') with the ViT-B trunk and decoder overridden
    to 3-pass 'high' (full-scale gate 3.46e-4 vs 1e-3 on the real chip,
    tools/precision_bisect.py --model dpt_hybrid). Pins the config so a
    registry edit can't silently drop either half of the mix."""
    from depth_estimation_tpu.registry import get_entry

    entry = get_entry("DPT_Hybrid")
    assert entry.f32_precision == "highest"
    model = entry.make_model()
    assert model.cfg.dot_precision == "high"
    assert model.cfg.decoder_precision == "high"
    # param tree must be unaffected by precision overrides
    assert model.cfg.hybrid and model.cfg.embed_dim == 768
