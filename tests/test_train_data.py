"""Training data pipeline: npz IO, batching determinism, device prefetch
(dp-sharded placement), and a raw-u8 end-to-end fit() on the virtual mesh."""

import numpy as np
import pytest

from depth_estimation_tpu.train.data import (
    batches,
    device_prefetch,
    iter_npz_dir,
    make_training_apply,
    synthetic_pairs,
)


def _write_npz_dir(tmp_path, n=5, h=32, w=48, seed=0):
    rng = np.random.default_rng(seed)
    for i in range(n):
        np.savez(tmp_path / f"sample_{i:03d}.npz",
                 image=rng.integers(0, 256, (h, w, 3), np.uint8),
                 disparity=rng.random((h, w), np.float32) + 0.1)
    return tmp_path


def test_iter_npz_dir_roundtrip(tmp_path):
    _write_npz_dir(tmp_path, n=4)
    pairs = list(iter_npz_dir(tmp_path))
    assert len(pairs) == 4
    for img, disp in pairs:
        assert img.shape == (32, 48, 3) and img.dtype == np.uint8
        assert disp.shape == (32, 48) and disp.dtype == np.float32


def test_iter_npz_dir_validates(tmp_path):
    np.savez(tmp_path / "bad.npz",
             image=np.zeros((8, 8, 3), np.float32),
             disparity=np.zeros((8, 8), np.float32))
    with pytest.raises(ValueError, match="uint8"):
        list(iter_npz_dir(tmp_path))
    with pytest.raises(FileNotFoundError):
        list(iter_npz_dir(tmp_path / "nope"))


def test_batches_shapes_and_determinism():
    bs = list(batches(synthetic_pairs(10, 16, 24), 4, epochs=2, seed=7))
    # 10 samples, batch 4, drop_remainder → 2 batches/epoch × 2 epochs
    assert len(bs) == 4
    for imgs, gt in bs:
        assert imgs.shape == (4, 16, 24, 3) and imgs.dtype == np.uint8
        assert gt.shape == (4, 16, 24) and gt.dtype == np.float32
    bs2 = list(batches(synthetic_pairs(10, 16, 24), 4, epochs=2, seed=7))
    for (a, ga), (b, gb) in zip(bs, bs2):
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(ga, gb)
    # different epochs see different orders (shuffle actually reshuffles)
    assert not np.array_equal(bs[0][0], bs[2][0])


def test_device_prefetch_values_and_sharding():
    from depth_estimation_tpu.parallel.mesh import make_mesh

    host = list(batches(synthetic_pairs(16, 8, 12), 8, shuffle=False))
    mesh = make_mesh(8, tp=1)
    dev = list(device_prefetch(iter(host), size=2, mesh=mesh))
    assert len(dev) == len(host)
    for (hi, hg), (di, dg) in zip(host, dev):
        np.testing.assert_array_equal(hi, np.asarray(di))
        np.testing.assert_array_equal(hg, np.asarray(dg))
        assert "dp" in str(di.sharding.spec)  # batch axis sharded over dp


def test_fit_from_raw_u8_batches_on_mesh():
    """End-to-end: raw u8 npz-style batches → device_prefetch(dp mesh) →
    fit() with the preprocess-fused apply; loss finite and state advances."""
    import jax

    from depth_estimation_tpu.config import PreprocessConfig
    from depth_estimation_tpu.models.dpt import DPT, DPTConfig
    from depth_estimation_tpu.parallel.mesh import make_mesh
    from depth_estimation_tpu.train.loop import fit

    cfg = DPTConfig(embed_dim=64, depth=4, num_heads=2, hooks=(0, 1, 2, 3),
                    reassemble_channels=(16, 32, 64, 64), features=32,
                    img_size=64, use_pallas=False, non_negative=False)
    model = DPT(cfg)
    pre = PreprocessConfig(target_height=64, target_width=64,
                           keep_aspect_ratio=False, ensure_multiple_of=32)
    apply = make_training_apply(model, pre, net_hw=(64, 64))
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 np.zeros((1, 64, 64, 3), np.float32))
    mesh = make_mesh(8, tp=1)
    data = device_prefetch(
        batches(synthetic_pairs(16, 40, 56, seed=1), 8, epochs=4), mesh=mesh)
    with mesh:
        state, history = fit(apply, params, data, steps=3, mesh=mesh,
                             verbose=False, log_every=1)
    assert int(state.step) == 3
    assert history and all(np.isfinite(l) for _, l in history)


def test_fit_restarts_exhausted_dataset():
    """batches()/device_prefetch() are re-iterable: fit() must loop the
    dataset when steps exceed one pass (loop.py's epoch-restart path)."""
    import jax

    from depth_estimation_tpu.config import PreprocessConfig
    from depth_estimation_tpu.models.dpt import DPT, DPTConfig
    from depth_estimation_tpu.train.loop import fit

    cfg = DPTConfig(embed_dim=64, depth=4, num_heads=2, hooks=(0, 1, 2, 3),
                    reassemble_channels=(16, 32, 64, 64), features=32,
                    img_size=64, use_pallas=False, non_negative=False)
    model = DPT(cfg)
    pre = PreprocessConfig(target_height=64, target_width=64,
                           keep_aspect_ratio=False, ensure_multiple_of=32)
    apply = make_training_apply(model, pre, net_hw=(64, 64))
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 np.zeros((1, 64, 64, 3), np.float32))
    # one epoch = 2 batches; 5 steps needs 2 restarts
    data = device_prefetch(batches(synthetic_pairs(4, 48, 64, seed=2), 2,
                                   epochs=1))
    state, history = fit(apply, params, data, steps=5, verbose=False,
                         log_every=1)
    assert int(state.step) == 5
    assert all(np.isfinite(l) for _, l in history)

    # a bare generator still fails, but loudly
    def one_shot():
        yield from iter(batches(synthetic_pairs(4, 48, 64, seed=2), 2))

    with pytest.raises(ValueError, match="re-iterable"):
        fit(apply, params, one_shot(), steps=5, verbose=False)


def test_iter_npz_dir_recursive(tmp_path):
    (tmp_path / "scene1").mkdir()
    (tmp_path / "scene2").mkdir()
    _write_npz_dir(tmp_path / "scene1", n=2)
    _write_npz_dir(tmp_path / "scene2", n=3)
    assert len(list(iter_npz_dir(tmp_path))) == 5
