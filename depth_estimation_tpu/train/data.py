"""Training data pipeline: host IO → batching → device prefetch.

The reference repo has no training at all (SURVEY.md §2c: inference-only);
this completes our beyond-reference training subsystem (losses.py, step.py,
loop.py) with the input side, TPU-first:

* the HOST only decodes and batches uint8 images + float32 disparity maps
  — no normalization/resizing on CPU;
* :func:`make_training_apply` fuses the MiDaS preprocess (u8 → f32/255 →
  cubic resize → normalize, ops/preprocess.py semantics) into the model
  apply, so the whole train step consumes raw u8 batches and everything
  numeric runs in ONE XLA program on device;
* :func:`device_prefetch` keeps ``size`` batches in flight on device
  (``jax.device_put`` is async) so host decode/stacking overlaps device
  compute — the training-side double-buffer matching the streaming loops'
  pipeline_depth; with a mesh it places batches dp-sharded, so each host
  transfer feeds all data-parallel devices.

Storage format: .npz files with ``image`` (H, W, 3) uint8 and
``disparity`` (H, W) float32 — the (frame, inverse-depth) pairs the SSI
loss expects (train/losses.py).
"""

from __future__ import annotations

import pathlib
from collections import deque
from typing import Iterable, Iterator, Optional, Sequence, Tuple

import numpy as np

Pair = Tuple[np.ndarray, np.ndarray]


def iter_npz_dir(path) -> Iterator[Pair]:
    """Yield (image u8 (H,W,3), disparity f32 (H,W)) from every .npz under
    ``path`` — recursively, in sorted order (deterministic)."""
    files = sorted(pathlib.Path(path).rglob("*.npz"))
    if not files:
        raise FileNotFoundError(f"no .npz samples under {path}")
    for f in files:
        with np.load(f) as z:
            img = np.asarray(z["image"])
            disp = np.asarray(z["disparity"])
        if img.dtype != np.uint8 or img.ndim != 3 or img.shape[-1] != 3:
            raise ValueError(f"{f}: 'image' must be (H, W, 3) uint8, got "
                             f"{img.shape} {img.dtype}")
        if disp.shape != img.shape[:2]:
            raise ValueError(f"{f}: 'disparity' {disp.shape} does not match "
                             f"image {img.shape[:2]}")
        yield img, disp.astype(np.float32)


def synthetic_pairs(n: int, h: int, w: int, seed: int = 0) -> Iterator[Pair]:
    """Deterministic synthetic (image, disparity) pairs for tests/smokes."""
    rng = np.random.default_rng(seed)
    for _ in range(n):
        img = rng.integers(0, 256, (h, w, 3), np.uint8)
        disp = rng.random((h, w), np.float32) + 0.1
        yield img, disp


class _Reiterable:
    """Dataset wrapper that restarts from scratch on every ``iter()`` —
    what train/loop.py's epoch-restart (``iter(data)`` after exhaustion)
    needs; a bare generator would come back empty."""

    def __init__(self, factory):
        self._factory = factory

    def __iter__(self):
        return self._factory()


def batches(
    pairs: Iterable[Pair],
    batch_size: int,
    epochs: int = 1,
    shuffle: bool = True,
    seed: int = 0,
    drop_remainder: bool = True,
):
    """Stack pairs into ((B,H,W,3) u8, (B,H,W) f32) batches.

    Materializes the sample list once (depth datasets here are file sets,
    not unbounded streams) and returns a RE-ITERABLE: each ``iter()``
    yields ``epochs`` deterministic passes, reshuffled per epoch from
    ``seed`` — so train/loop.py's fit() can restart the dataset when it
    runs more steps than one pass provides."""
    data = list(pairs)
    if not data:
        raise ValueError("empty dataset")
    if drop_remainder and len(data) < batch_size:
        raise ValueError(f"{len(data)} samples < batch_size {batch_size}")

    def gen():
        for epoch in range(epochs):
            order = np.arange(len(data))
            if shuffle:
                np.random.default_rng(seed + epoch).shuffle(order)
            stop = (len(data) // batch_size) * batch_size if drop_remainder else len(data)
            for i in range(0, stop, batch_size):
                sel = order[i:i + batch_size]
                yield (np.stack([data[j][0] for j in sel]),
                       np.stack([data[j][1] for j in sel]))

    return _Reiterable(gen)


def device_prefetch(it: Iterable, size: int = 2, mesh=None):
    """Batches already placed on device, ``size`` kept in flight.

    ``jax.device_put`` returns immediately (async transfer), so while the
    train step consumes batch t, batches t+1..t+size are already crossing
    H2D — host IO overlaps device compute. With ``mesh``, batches go out
    sharded over the ``dp`` axis (train/step.py::shard_batch placement), so
    the jitted step consumes them with zero further data movement.

    Returns a RE-ITERABLE when ``it`` is one (e.g. :func:`batches`'s
    result): each ``iter()`` restarts the underlying dataset, so fit()'s
    epoch restart works through the prefetcher."""
    import jax

    if mesh is not None:
        from jax.sharding import NamedSharding

        from depth_estimation_tpu.parallel.mesh import batch_pspec

        sharding = NamedSharding(mesh, batch_pspec())
        put = lambda b: jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), b)
    else:
        put = jax.device_put

    def gen():
        q: deque = deque()
        for item in it:
            q.append(put(item))
            if len(q) > max(1, int(size)):
                yield q.popleft()
        while q:
            yield q.popleft()

    return _Reiterable(gen)


def make_training_apply(model, preprocess_cfg, net_hw: Optional[Sequence[int]] = None,
                        bgr: bool = False):
    """Model apply over RAW uint8 batches: fuses the MiDaS input transform
    (ops/preprocess.py semantics — /255, cubic resize to the net grid,
    mean/std normalize; reference: torch-hub ``transforms``) into the
    forward, so the loss/grad program consumes (B, H, W, 3) u8 directly
    and the whole train step is one XLA program.

    ``net_hw`` pins the network grid; default = the transform of the
    dataset resolution at trace time. ``bgr=True`` mirrors the inference
    path's cv2 channel order."""
    from depth_estimation_tpu.ops.preprocess import (
        _preprocess_impl,
        compute_resize_shape,
    )
    from depth_estimation_tpu.ops.resize import resize2d

    def apply(params, imgs_u8):
        src_hw = imgs_u8.shape[1:3]
        hw = tuple(net_hw) if net_hw else compute_resize_shape(
            src_hw[0], src_hw[1], preprocess_cfg)
        # the ONE shared implementation of the MiDaS input transform
        # (ops/preprocess.py — same code the inference `preprocess` uses)
        x = _preprocess_impl(imgs_u8, hw, tuple(preprocess_cfg.mean),
                             tuple(preprocess_cfg.std), bgr_to_rgb=bgr)
        pred = model.apply(params, x)  # (B, h', w') at the net grid
        # back to the dataset resolution so the loss aligns with full-res
        # gt (same bicubic the inference path uses, estimator.py)
        return resize2d(pred[..., None], tuple(src_hw), method="cubic",
                        align_corners=False)[..., 0]

    return apply
