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
