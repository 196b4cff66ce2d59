"""Training loop driver: fit/evaluate with periodic checkpointing + resume.

Completes the training subsystem (losses.py + step.py): a minimal,
deterministic loop that shards over a mesh when given one, checkpoints every
``ckpt_every`` steps via orbax, and resumes bitwise-identically from the
latest checkpoint (test: tests/test_train_checkpoint.py).
"""

from __future__ import annotations

import pathlib
from typing import Callable, Iterable, Iterator, Optional, Tuple

import jax
import numpy as np

from depth_estimation_tpu.train.step import (
    TrainState,
    init_state,
    make_optimizer,
    make_train_step,
    shard_batch,
)
from depth_estimation_tpu.utils.checkpoint import load_train_state, save_train_state


def fit(
    model_apply: Callable,
    params,
    data: Iterable[Tuple[np.ndarray, np.ndarray]],
    steps: int,
    lr: float = 1e-4,
    alpha: float = 0.5,
    accum_steps: int = 1,
    mesh=None,
    ckpt_dir: Optional[str] = None,
    ckpt_every: int = 100,
    log_every: int = 10,
    verbose: bool = True,
    eval_data: Optional[Iterable[Tuple[np.ndarray, np.ndarray]]] = None,
    eval_every: int = 100,
) -> Tuple[TrainState, list]:
    """Run ``steps`` optimizer steps over ``data`` (iterable of (images, gt)).

    Resumes from ``ckpt_dir`` if a checkpoint exists there. Returns the
    final state and the per-log loss history.

    ``eval_data`` (a re-iterable of (images, gt) batches) scores the
    current params every ``eval_every`` steps and at the end with the
    standard depth metrics (train/metrics.py, aligned protocol); results
    land in the history as ``(step, loss, metrics_dict)`` tuples.
    """
    tx = make_optimizer(lr=lr)
    state = init_state(params, tx, mesh=mesh)

    ckpt_path = pathlib.Path(ckpt_dir) / "state" if ckpt_dir else None
    if ckpt_path is not None and ckpt_path.exists():
        template = jax.tree_util.tree_map(np.asarray, state)
        state = TrainState(*load_train_state(ckpt_path, template))
        if verbose:
            print(f"resumed from step {int(state.step)}")

    step_fn = make_train_step(model_apply, tx, alpha=alpha, donate=False,
                              accum_steps=accum_steps)

    eval_metrics_fn = None
    if eval_data is not None:
        from depth_estimation_tpu.train.metrics import depth_metrics

        eval_metrics_fn = jax.jit(
            lambda p, imgs, gt: depth_metrics(model_apply(p, imgs), gt, align=True)
        )

    def run_eval(params_now):
        sums, n = {}, 0
        for imgs, gt in eval_data:
            m = jax.device_get(eval_metrics_fn(params_now, imgs, gt))
            k = len(imgs)
            for key, v in m.items():
                sums[key] = sums.get(key, 0.0) + float(v) * k
            n += k
        return {key: v / max(n, 1) for key, v in sums.items()}

    it: Iterator = iter(data)
    history = []
    start = int(state.step)
    for i in range(start, steps):
        try:
            images, gt = next(it)
        except StopIteration:
            it = iter(data)
            try:
                images, gt = next(it)
            except StopIteration:
                raise ValueError(
                    "dataset yielded nothing on restart — pass a "
                    "re-iterable (e.g. train/data.py::batches / "
                    "device_prefetch), not a bare generator"
                ) from None
        if mesh is not None:
            images, gt = shard_batch(images, mesh), shard_batch(gt, mesh)
        state, loss = step_fn(state, images, gt)
        if (i + 1) % log_every == 0 or i + 1 == steps:
            loss_v = float(loss)
            history.append((i + 1, loss_v))
            if verbose:
                print(f"step {i + 1}/{steps} loss {loss_v:.5f}")
        if eval_metrics_fn is not None and ((i + 1) % eval_every == 0 or i + 1 == steps):
            m = run_eval(state.params)
            history.append((i + 1, float(loss), m))
            if verbose:
                print(f"step {i + 1}/{steps} eval abs_rel {m['abs_rel']:.4f} "
                      f"d1 {m['d1']:.3f} rmse {m['rmse']:.4f}")
        if ckpt_path is not None and (i + 1) % ckpt_every == 0:
            save_train_state(ckpt_path, jax.tree_util.tree_map(np.asarray, state))
    if ckpt_path is not None:
        save_train_state(ckpt_path, jax.tree_util.tree_map(np.asarray, state))
    return state, history


def synthetic_depth_dataset(batch: int, hw: Tuple[int, int], n_batches: int = 8, seed: int = 0):
    """Deterministic toy dataset: images + inverse-depth gt with structure
    (a bright disc at a known depth over a gradient background)."""
    rng = np.random.default_rng(seed)
    h, w = hw
    out = []
    yy, xx = np.mgrid[0:h, 0:w]
    for _ in range(n_batches):
        imgs = np.empty((batch, h, w, 3), np.float32)
        gts = np.empty((batch, h, w), np.float32)
        for b in range(batch):
            cx, cy = rng.integers(w // 4, 3 * w // 4), rng.integers(h // 4, 3 * h // 4)
            r = rng.integers(min(h, w) // 8, min(h, w) // 4)
            disc = ((xx - cx) ** 2 + (yy - cy) ** 2) < r * r
            depth_bg = 1.0 / (2.0 + 3.0 * (yy / h))  # floor receding with y
            depth = np.where(disc, 1.0, depth_bg).astype(np.float32)
            img = np.stack([depth, depth * 0.5, 1.0 - depth], axis=-1)
            img = img + rng.normal(0, 0.02, img.shape)
            imgs[b] = img.astype(np.float32)
            gts[b] = depth
        out.append((imgs, gts))
    return out
