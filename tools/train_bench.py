#!/usr/bin/env python
"""Full-scale training-step benchmark on the current backend.

Proves the training subsystem at production scale (the CI suite trains
tiny configs only): builds the full DPT-Large (or any registry model's
config), jits the complete train step (SSI + gradient-matching loss,
adamw, donated state), and times on-chip ms/step with the slope method —
steps iterated inside one jitted lax.scan whose per-step input is salted,
timed at two step counts and differenced, so dispatch latency and the
remote invocation cache cannot distort the number (see
utils/benchmark.py).

Usage: python tools/train_bench.py [--model DPT_Large] [--batch 1]
       [--hw 384 384] [--remat]
"""

import argparse
import sys
import time
import warnings

import numpy as np

sys.path.insert(0, ".")  # run from the repo root


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="DPT_Large",
                    choices=("MiDaS_small", "DPT_Large", "DPT_Hybrid"))
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--hw", type=int, nargs=2, default=(384, 384))
    ap.add_argument("--remat", action="store_true",
                    help="jax.checkpoint the ViT blocks (trade FLOPs for HBM)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import optax

    from depth_estimation_tpu.registry import get_entry
    from depth_estimation_tpu.train.losses import gradient_matching_loss, ssi_loss
    from depth_estimation_tpu.train.step import make_optimizer

    model = get_entry(args.model).make_model()
    h, w = args.hw
    x0 = np.zeros((args.batch, h, w, 3), np.float32)

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        t0 = time.time()
        params = jax.jit(model.init)(jax.random.PRNGKey(0), x0)
        jax.block_until_ready(params)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
    print(f"{args.model}: {n_params / 1e6:.1f}M params, init {time.time() - t0:.1f}s, "
          f"batch {args.batch} @ {h}x{w}, backend {jax.default_backend()}")

    apply_fn = model.apply
    if args.remat:
        apply_fn = jax.checkpoint(model.apply)

    tx = make_optimizer(lr=1e-4)
    opt_state = tx.init(params)

    def one_step(params, opt_state, imgs, gt):
        def loss_fn(p):
            pred = apply_fn(p, imgs)
            return ssi_loss(pred, gt) + 0.5 * gradient_matching_loss(pred, gt)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    gt = jnp.asarray(np.random.default_rng(0).random((args.batch, h, w)).astype(np.float32) + 0.1)
    imgs = jnp.asarray(np.random.default_rng(1).random((args.batch, h, w, 3)).astype(np.float32))

    def make_loop(n):
        @jax.jit
        def loop(params, opt_state, imgs, gt, salt):
            def body(carry, i):
                p, o = carry
                # salt the batch per step AND per invocation — params also
                # change every step, so the remote cache cannot hit
                im = imgs + (salt * 1e-6) * (i + 1)
                p, o, loss = one_step(p, o, im, gt)
                return (p, o), loss
            (_, _), losses = jax.lax.scan(body, (params, opt_state), jnp.arange(n))
            return losses.sum()

        return loop

    from depth_estimation_tpu.utils.benchmark import slope_time_ms

    ms = slope_time_ms(make_loop, (params, opt_state, imgs, gt), n1=3, n2=9)
    print(f"train step: {ms:.1f} ms/step on-chip "
          f"({1000.0 / ms:.1f} steps/s, {args.batch * 1000.0 / ms:.1f} imgs/s)"
          f"{' [remat]' if args.remat else ''}")


if __name__ == "__main__":
    main()
