"""Training loop: learns on structured synthetic depth; resumes mid-run."""

import flax.linen as nn
import jax
import numpy as np

from depth_estimation_tpu.parallel.mesh import make_mesh
from depth_estimation_tpu.train.loop import fit, synthetic_depth_dataset


class _SmallDepthNet(nn.Module):
    @nn.compact
    def __call__(self, x):
        h = nn.Conv(16, (3, 3), padding="SAME")(x)
        h = nn.relu(h)
        h = nn.Conv(16, (3, 3), padding="SAME")(h)
        h = nn.relu(h)
        return nn.Conv(1, (1, 1))(h)[..., 0]


def test_fit_learns_on_synthetic_depth():
    model = _SmallDepthNet()
    data = synthetic_depth_dataset(batch=4, hw=(32, 32), n_batches=4)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), data[0][0])
    state, hist = fit(model.apply, params, data, steps=60, lr=3e-3, alpha=0.0, verbose=False)
    first, last = hist[0][1], hist[-1][1]
    assert np.isfinite(last)
    assert last < first * 0.7, (first, last)


def test_fit_checkpoint_resume(tmp_path):
    model = _SmallDepthNet()
    data = synthetic_depth_dataset(batch=2, hw=(16, 16), n_batches=2)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), data[0][0])

    # straight 20 steps
    state_a, hist_a = fit(model.apply, params, data, steps=20, lr=1e-3, alpha=0.0, verbose=False)

    # 10 steps with checkpointing, then resume to 20
    ck = tmp_path / "run"
    fit(model.apply, params, data, steps=10, lr=1e-3, alpha=0.0,
        ckpt_dir=str(ck), ckpt_every=5, verbose=False)
    state_b, hist_b = fit(model.apply, params, data, steps=20, lr=1e-3, alpha=0.0,
                          ckpt_dir=str(ck), ckpt_every=5, verbose=False)
    assert int(state_b.step) == 20
    np.testing.assert_allclose(hist_b[-1][1], hist_a[-1][1], rtol=1e-6)


def test_fit_sharded_over_mesh():
    model = _SmallDepthNet()
    data = synthetic_depth_dataset(batch=8, hw=(16, 16), n_batches=2)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), data[0][0])
    mesh = make_mesh(8, tp=1)
    with mesh:
        state, hist = fit(model.apply, params, data, steps=10, lr=1e-3, alpha=0.0,
                          mesh=mesh, verbose=False)
    assert np.isfinite(hist[-1][1])


def test_fit_midas_v21_tiny():
    """The new v2.1 family is trainable: a tiny-config MidasV21 (frozen-BN
    params get gradients like any other leaf) reduces SSI loss under fit()."""
    from depth_estimation_tpu.models.midas_v21 import MidasV21
    from tests.test_midas_v21 import TINY

    model = MidasV21(TINY)
    data = synthetic_depth_dataset(batch=2, hw=(64, 64), n_batches=2)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), data[0][0])
    state, hist = fit(model.apply, params, data, steps=30, lr=3e-3, alpha=0.0, verbose=False)
    first, last = hist[0][1], hist[-1][1]
    assert np.isfinite(last)
    assert last < first * 0.9, (first, last)


def test_fit_with_periodic_eval():
    """eval_data scores the params with the aligned depth metrics during
    training; history carries (step, loss, metrics) tuples."""
    model = _SmallDepthNet()
    data = synthetic_depth_dataset(batch=4, hw=(32, 32), n_batches=4)
    eval_data = synthetic_depth_dataset(batch=4, hw=(32, 32), n_batches=2, seed=9)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), data[0][0])
    state, hist = fit(model.apply, params, data, steps=40, lr=3e-3, alpha=0.0,
                      verbose=False, eval_data=eval_data, eval_every=20)
    evals = [h for h in hist if len(h) == 3]
    assert len(evals) == 2  # steps 20 and 40
    for step, loss, m in evals:
        assert set(m) >= {"abs_rel", "rmse", "d1"}
        assert np.isfinite(m["abs_rel"]) and 0.0 <= m["d1"] <= 1.0
    # training should not make the aligned metric worse start -> end
    assert evals[-1][2]["abs_rel"] <= evals[0][2]["abs_rel"] * 1.5
