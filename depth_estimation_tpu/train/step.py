"""Sharded training step.

New capability (the reference only runs inference); built TPU-first: the
step is one jit-compiled program over a (dp, tp) mesh. Sharding is carried
by the *data*: params are placed with the TP PartitionSpecs
(parallel/mesh.py), the optimizer state is born sharded by initializing
optax from the sharded params, batches are placed with P('dp') — and GSPMD
propagates through the jitted step, inserting the grad all-reduce over dp
and the activation psums over tp on ICI. Params/opt-state buffers are
donated, so the step updates in place in HBM.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding

from depth_estimation_tpu.parallel.mesh import batch_pspec, shard_params
from depth_estimation_tpu.train.losses import gradient_matching_loss, ssi_loss


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(lr: float = 1e-4, weight_decay: float = 1e-2) -> optax.GradientTransformation:
    return optax.adamw(lr, weight_decay=weight_decay)


def init_state(params, tx: optax.GradientTransformation, mesh: Mesh | None = None) -> TrainState:
    """With a mesh: place params per the TP rules first, so the optimizer
    moments (zeros_like) inherit the same shardings."""
    if mesh is not None:
        params = shard_params(params, mesh)
    return TrainState(params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))


def shard_batch(batch, mesh: Mesh):
    return jax.device_put(batch, NamedSharding(mesh, batch_pspec()))


def loss_fn(model_apply: Callable, params, images, gt_disparity, alpha: float = 0.5):
    pred = model_apply(params, images)
    loss = ssi_loss(pred, gt_disparity)
    if alpha > 0:
        loss = loss + alpha * gradient_matching_loss(pred, gt_disparity)
    return loss


def make_train_step(model_apply: Callable, tx: optax.GradientTransformation,
                    alpha: float = 0.5, donate: bool = True,
                    accum_steps: int = 1):
    """step(state, images, gt) -> (state, loss), one XLA program.

    ``accum_steps > 1`` splits the batch into that many equal microbatches
    and accumulates gradients under ``lax.scan`` before the single
    optimizer update — the large-effective-batch lever when activations
    for the full batch don't fit HBM. Both losses are per-image means, so
    the averaged microbatch gradients equal the full-batch gradient (up to
    float association); equality is CI-tested.
    """

    def grads_of(params, images, gt):
        return jax.value_and_grad(
            lambda p: loss_fn(model_apply, p, images, gt, alpha)
        )(params)

    def step(state: TrainState, images, gt):
        if accum_steps == 1:
            loss, grads = grads_of(state.params, images, gt)
        else:
            b = images.shape[0]
            if b % accum_steps:
                raise ValueError(f"batch {b} not divisible by accum_steps={accum_steps}")
            im = images.reshape(accum_steps, b // accum_steps, *images.shape[1:])
            g = gt.reshape(accum_steps, b // accum_steps, *gt.shape[1:])

            def body(carry, xs):
                acc_loss, acc_g = carry
                l, gr = grads_of(state.params, xs[0], xs[1])
                return (acc_loss + l, jax.tree_util.tree_map(jnp.add, acc_g, gr)), None

            zero = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (loss_sum, grads), _ = jax.lax.scan(
                body, (jnp.zeros((), jnp.float32), zero), (im, g)
            )
            loss = loss_sum / accum_steps
            grads = jax.tree_util.tree_map(lambda a: a / accum_steps, grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return jax.jit(step, donate_argnums=(0,) if donate else ())
