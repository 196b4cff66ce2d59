"""TrainState checkpoint/resume: deterministic continuation after restore."""

import jax
import numpy as np

from depth_estimation_tpu.models.midas_small import FeatureFusionBlock  # reuse small module
import flax.linen as nn

from depth_estimation_tpu.train.step import TrainState, init_state, make_optimizer, make_train_step
from depth_estimation_tpu.utils.checkpoint import load_train_state, save_train_state


class _Net(nn.Module):
    @nn.compact
    def __call__(self, x):
        h = nn.Conv(8, (3, 3), padding="SAME")(x)
        h = nn.relu(h)
        return nn.Conv(1, (1, 1))(h)[..., 0]


def test_train_resume_is_deterministic(tmp_path):
    model = _Net()
    x = np.random.default_rng(0).random((2, 16, 16, 3)).astype(np.float32)
    gt = np.random.default_rng(1).random((2, 16, 16)).astype(np.float32) + 0.5
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    tx = make_optimizer(lr=1e-3)
    step = make_train_step(lambda p, im: model.apply(p, im), tx, donate=False)

    # run 4 steps straight
    s = init_state(params, tx)
    losses_straight = []
    for _ in range(4):
        s, l = step(s, x, gt)
        losses_straight.append(float(l))

    # run 2 steps, checkpoint, restore, run 2 more
    s2 = init_state(params, tx)
    for _ in range(2):
        s2, _ = step(s2, x, gt)
    path = tmp_path / "state"
    save_train_state(path, s2)
    template = jax.tree_util.tree_map(np.asarray, s2)
    restored = load_train_state(path, template)
    restored = TrainState(*restored) if not isinstance(restored, TrainState) else restored
    losses_resumed = []
    for _ in range(2):
        restored, l = step(restored, x, gt)
        losses_resumed.append(float(l))

    np.testing.assert_allclose(losses_resumed, losses_straight[2:], rtol=1e-6)
    assert int(restored.step) == 4


def test_sharded_train_resume(tmp_path):
    """Distributed resume: checkpoint a dp×tp-sharded TrainState, restore
    on a fresh mesh placement, continue — losses match the uninterrupted
    sharded run (orbax gathers shards on save; shard_params re-places on
    restore)."""
    from depth_estimation_tpu.models.dpt import DPT, DPTConfig
    from depth_estimation_tpu.parallel.mesh import make_mesh
    from depth_estimation_tpu.train.step import shard_batch

    cfg = DPTConfig(
        embed_dim=64, depth=2, num_heads=2, hooks=(0, 0, 1, 1),
        reassemble_channels=(16, 32, 64, 64), features=32, img_size=64,
        use_pallas=False, non_negative=False,
    )
    model = DPT(cfg)
    mesh = make_mesh(8, tp=2)
    x = np.random.default_rng(0).random((4, 64, 64, 3)).astype(np.float32)
    gt = np.random.default_rng(1).random((4, 64, 64)).astype(np.float32) + 0.5
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    tx = make_optimizer(lr=1e-3)
    step = make_train_step(lambda v, im: model.apply(v, im), tx, donate=False)

    def run(state, n):
        losses = []
        with mesh:
            for _ in range(n):
                state, l = step(state, shard_batch(x, mesh), shard_batch(gt, mesh))
                losses.append(float(l))
        return state, losses

    with mesh:
        s = init_state(variables, tx, mesh=mesh)
    _, straight = run(s, 4)

    with mesh:
        s2 = init_state(variables, tx, mesh=mesh)
    s2, _ = run(s2, 2)
    path = tmp_path / "sharded_state"
    save_train_state(path, jax.tree_util.tree_map(np.asarray, s2))
    template = jax.tree_util.tree_map(np.asarray, s2)
    restored = load_train_state(path, template)
    # re-place on the mesh exactly as a fresh distributed job would
    from depth_estimation_tpu.parallel.mesh import shard_params

    with mesh:
        restored = TrainState(
            params=shard_params(restored.params, mesh),
            opt_state=jax.tree_util.tree_map(
                lambda a: jax.device_put(a), restored.opt_state
            ),
            step=restored.step,
        )
    _, resumed = run(restored, 2)
    np.testing.assert_allclose(resumed, straight[2:], rtol=1e-5)
