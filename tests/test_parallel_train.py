"""Mesh/sharding + training-step tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from depth_estimation_tpu.models.dpt import DPT, DPTConfig
from depth_estimation_tpu.parallel.mesh import make_mesh, param_pspecs, shard_params
from depth_estimation_tpu.train.losses import gradient_matching_loss, ssi_loss
from depth_estimation_tpu.train.step import (
    init_state,
    make_optimizer,
    make_train_step,
    shard_batch,
)

TINY = DPTConfig(
    embed_dim=64, depth=4, num_heads=2, hooks=(0, 1, 2, 3),
    reassemble_channels=(16, 32, 64, 64), features=32, img_size=64, use_pallas=False,
)
# training configs disable the final ReLU clamp: with random init + tiny
# nets it dies (zero gradients), as any ReLU-headed regressor would
TINY_TRAIN = DPTConfig(
    embed_dim=64, depth=4, num_heads=2, hooks=(0, 1, 2, 3),
    reassemble_channels=(16, 32, 64, 64), features=32, img_size=64, use_pallas=False,
    non_negative=False,
)


def test_mesh_shapes():
    m = make_mesh(8, tp=2)
    assert m.devices.shape == (4, 2)
    assert m.axis_names == ("dp", "tp")
    with pytest.raises(ValueError):
        make_mesh(8, tp=3)


def test_tp_rules_hit_transformer_matmuls():
    model = DPT(TINY)
    params = jax.eval_shape(model.init, jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32))
    specs = param_pspecs(params["params"])
    flat = {jax.tree_util.keystr(p): s for p, s in jax.tree_util.tree_leaves_with_path(specs, is_leaf=lambda x: isinstance(x, P))}
    qkv = [k for k in flat if "qkv" in k and "kernel" in k]
    assert qkv and all(flat[k] == P(None, "tp") for k in qkv)
    proj = [k for k in flat if "attn" in k and "proj" in k and "kernel" in k]
    assert proj and all(flat[k] == P("tp", None) for k in proj)
    convs = [k for k in flat if "output_conv_0" in k and "kernel" in k]
    assert convs and all(flat[k] == P() for k in convs)


def test_ssi_loss_invariance(rng):
    gt = rng.random((2, 32, 32)).astype(np.float32) + 0.1
    pred = 3.0 * gt + 0.7  # exact affine transform of gt
    loss = float(ssi_loss(pred, gt, trim=0.0))
    assert loss < 1e-5
    # scale/shift invariance: transformed prediction gives the same loss
    pred2 = rng.random((2, 32, 32)).astype(np.float32)
    l1 = float(ssi_loss(pred2, gt, trim=0.0))
    l2 = float(ssi_loss(2.0 * pred2 - 1.0, gt, trim=0.0))
    assert abs(l1 - l2) < 1e-5


def test_gradient_matching_zero_for_identical(rng):
    gt = rng.random((1, 32, 32)).astype(np.float32)
    assert float(gradient_matching_loss(gt, gt)) == 0.0


def test_sharded_train_step_runs_and_learns():
    mesh = make_mesh(8, tp=2)
    model = DPT(TINY_TRAIN)
    x = np.random.default_rng(0).random((4, 64, 64, 3)).astype(np.float32)
    gt = 1.0 / (np.random.default_rng(1).random((4, 64, 64)).astype(np.float32) + 0.5)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    tx = make_optimizer(lr=1e-3)
    step = make_train_step(lambda p, im: model.apply(p, im), tx, donate=False)
    with mesh:
        state = init_state(params, tx, mesh=mesh)
        xb, gtb = shard_batch(x, mesh), shard_batch(gt, mesh)
        losses = []
        for _ in range(5):
            state, loss = step(state, xb, gtb)
            losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]  # learns on a fixed batch


def test_sharded_matches_single_device():
    """DP+TP sharded step must produce the same loss trajectory as one device."""
    model = DPT(TINY_TRAIN)
    x = np.random.default_rng(0).random((4, 64, 64, 3)).astype(np.float32)
    gt = np.random.default_rng(1).random((4, 64, 64)).astype(np.float32) + 0.5
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    tx = make_optimizer(lr=1e-3)

    step = make_train_step(lambda p, im: model.apply(p, im), tx, donate=False)
    state1 = init_state(params, tx)
    _, loss_single = step(state1, x, gt)

    mesh = make_mesh(8, tp=2)
    with mesh:
        state8 = init_state(params, tx, mesh=mesh)
        _, loss_sharded = step(state8, shard_batch(x, mesh), shard_batch(gt, mesh))
    # tolerance derivation: the delta is pure f32 reduction-order noise from
    # the tp-sharded matmul partials, and it is XLA:CPU *codegen*-dependent —
    # measured ≤2.2e-7 over 8 seeds on one host but 5.1e-5 on another
    # (round-3 verdict), so per-host measurements need wide margin. 5e-4 is
    # ~10x the worst observed anywhere while a real sharding bug (missing
    # psum / wrong dp mean) moves this O(0.6) loss by >=1e-2, 20x the bound.
    np.testing.assert_allclose(float(loss_single), float(loss_sharded), rtol=5e-4)


def test_shard_params_placement():
    mesh = make_mesh(8, tp=2)
    model = DPT(TINY)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32))
    sharded = shard_params(params, mesh)
    leaves = jax.tree_util.tree_leaves_with_path(sharded)
    qkv = [v for p, v in leaves if "qkv" in jax.tree_util.keystr(p) and "kernel" in jax.tree_util.keystr(p)]
    assert qkv
    for v in qkv:
        # sharded over tp: each device holds half the output features
        assert v.sharding.spec == P(None, "tp")


def test_grad_accumulation_matches_full_batch(rng):
    """accum_steps=2 must reproduce the full-batch step: per-image-mean
    losses make averaged microbatch grads equal the full-batch grad."""
    model = DPT(TINY_TRAIN)
    x = rng.standard_normal((4, 64, 64, 3)).astype(np.float32)
    gt = (rng.random((4, 64, 64)) + 0.1).astype(np.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    tx = make_optimizer()
    full = make_train_step(lambda v, im: model.apply(v, im), tx, donate=False)
    accum = make_train_step(lambda v, im: model.apply(v, im), tx, donate=False,
                            accum_steps=2)
    s_full, loss_full = full(init_state(variables, tx), x, gt)
    s_acc, loss_acc = accum(init_state(variables, tx), x, gt)
    np.testing.assert_allclose(float(loss_acc), float(loss_full), rtol=1e-6)
    # compare GRADIENTS, not post-adamw params: adam's g/(sqrt(v)+eps)
    # amplifies float-noise on near-zero grads into sign-level update
    # differences, so param equality after one step is ill-conditioned
    from depth_estimation_tpu.train.step import loss_fn as _loss_fn

    g_full = jax.grad(lambda v: _loss_fn(model.apply, v, x, gt))(variables)
    g_half = [
        jax.grad(lambda v: _loss_fn(model.apply, v, x[i:i + 2], gt[i:i + 2]))(variables)
        for i in (0, 2)
    ]
    g_acc = jax.tree_util.tree_map(lambda a, b: (a + b) / 2.0, *g_half)
    for a, b in zip(jax.tree_util.tree_leaves(g_acc),
                    jax.tree_util.tree_leaves(g_full)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-7)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        make_train_step(lambda v, im: model.apply(v, im), tx, donate=False,
                        accum_steps=3)(init_state(variables, tx), x, gt)


# -- TP inference (SURVEY §2c optional extension) ----------------------------


@pytest.fixture(scope="module")
def tp_estimator():
    """Tiny DPT behind the estimator API, preprocess pinned to the model's
    64×64 grid, so predict_sharded exercises the real TP rules."""
    import warnings

    from depth_estimation_tpu import registry
    from depth_estimation_tpu.config import PreprocessConfig
    from depth_estimation_tpu.estimator import DepthEstimator

    pre = PreprocessConfig(target_height=64, target_width=64,
                           keep_aspect_ratio=False, ensure_multiple_of=32)
    registry.register(registry.ModelEntry(
        "TinyDPT_tp_test", lambda: DPT(TINY), pre, lambda sd: sd))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return DepthEstimator("TinyDPT_tp_test", verbose=False)


def test_predict_sharded_tp_matches_single(tp_estimator):
    """Single-frame TP inference (estimator.predict_sharded): qkv/fc1
    column-parallel + proj/fc2 row-parallel over tp=8 must reproduce the
    single-device frame program."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (96, 128, 3), np.uint8)
    single = tp_estimator.predict(img)
    mesh = make_mesh(8, tp=8)
    with mesh:
        tp_out = tp_estimator.predict_sharded(img, mesh)
    np.testing.assert_allclose(tp_out, single, rtol=2e-5, atol=2e-5)
    # the cache must hold genuinely TP-sharded params, not replicas
    cached = tp_estimator._mesh_params[(mesh, True)]
    leaves = jax.tree_util.tree_leaves_with_path(cached)
    qkv = [v for p, v in leaves
           if "qkv" in jax.tree_util.keystr(p) and v.ndim == 2]
    assert qkv and all(
        v.sharding.spec == P(None, "tp") for v in qkv
    ), "qkv kernels are not column-sharded over tp"


def test_predict_batch_sharded_dp_tp_matches_single(tp_estimator):
    """Batched stills over a (dp=2, tp=4) mesh — DP over the batch axis
    composed with TP of the transformer matmuls — must match
    predict_batch."""
    rng = np.random.default_rng(4)
    imgs = rng.integers(0, 256, (4, 96, 128, 3), np.uint8)
    single = tp_estimator.predict_batch(imgs)
    mesh = make_mesh(8, tp=4)
    with mesh:
        sharded = tp_estimator.predict_batch_sharded(imgs, mesh)
    np.testing.assert_allclose(sharded, single, rtol=2e-5, atol=2e-5)
