#!/usr/bin/env python
"""Full-scale training-step benchmark on the current backend.

Proves the training subsystem at production scale (the CI suite trains
tiny configs only): builds the full DPT-Large (or any registry model's
config), reuses the SHIPPED train step (train/step.py::make_train_step —
SSI + gradient-matching loss, adamw; inlined un-donated inside the timing
scan, whose carry gives XLA the same in-place buffer reuse), and times
on-chip ms/step with the slope method — steps iterated inside one jitted
lax.scan whose per-step input is salted, timed at two step counts and
differenced, so dispatch latency and the remote invocation cache cannot
distort the number (see utils/benchmark.py).

``--remat`` enables per-block rematerialisation of the ViT trunk
(DPTConfig.remat → nn.remat on each transformer block): backward
recomputes block activations instead of storing them — the real
activation-memory lever for bigger batches (DPT models only).

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
                    choices=("MiDaS_small", "MiDaS", "DPT_Large", "DPT_Hybrid"))
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--hw", type=int, nargs=2, default=(384, 384))
    ap.add_argument("--remat", action="store_true",
                    help="per-block nn.remat of the ViT trunk (DPT models): "
                    "backward recomputes block activations instead of "
                    "storing them")
    args = ap.parse_args()

    from depth_estimation_tpu.utils.platform import (
        apply_platform_env,
        enable_compilation_cache,
    )
    apply_platform_env()  # honor DEPTH_TPU_PLATFORM=cpu before backend init
    enable_compilation_cache()
    h, w = args.hw
    if h % 32 or w % 32:
        ap.error(f"--hw must be multiples of 32 (got {h}x{w})")

    import jax
    import jax.numpy as jnp

    from depth_estimation_tpu.registry import get_entry
    from depth_estimation_tpu.train.step import (
        init_state,
        make_optimizer,
        make_train_step,
    )

    if args.remat:
        import dataclasses

        from depth_estimation_tpu.models.dpt import DPT, DPT_HYBRID, DPT_LARGE

        cfgs = {"DPT_Large": DPT_LARGE, "DPT_Hybrid": DPT_HYBRID}
        if args.model not in cfgs:
            ap.error("--remat applies to the DPT models' ViT trunk")
        model = DPT(dataclasses.replace(cfgs[args.model], remat=True))
    else:
        model = get_entry(args.model).make_model()

    x0 = np.zeros((args.batch, h, w, 3), np.float32)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        t0 = time.time()
        params = jax.jit(model.init)(jax.random.PRNGKey(0), x0)
        # value-fetch to truly block — block_until_ready does not
        # synchronize through the axon tunnel (CLAUDE.md)
        float(np.asarray(jax.tree_util.tree_leaves(params)[0]).ravel()[0])
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
    print(f"{args.model}: {n_params / 1e6:.1f}M params, init {time.time() - t0:.1f}s, "
          f"batch {args.batch} @ {h}x{w}, backend {jax.default_backend()}")

    tx = make_optimizer(lr=1e-4)
    # the SHIPPED step, un-donated (its buffers are re-fed across timing
    # invocations); calling the jitted step inside the scan inlines it
    step = make_train_step(lambda v, imgs: model.apply(v, imgs), tx, donate=False)
    state0 = init_state(params, tx)

    gt = jnp.asarray(np.random.default_rng(0).random((args.batch, h, w)).astype(np.float32) + 0.1)
    imgs = jnp.asarray(np.random.default_rng(1).random((args.batch, h, w, 3)).astype(np.float32))

    def make_loop(n):
        @jax.jit
        def loop(state, imgs, gt, salt):
            def body(state, i):
                # salt the batch per step AND per invocation — params also
                # change every step, so the remote cache cannot hit
                im = imgs + (salt * 1e-6) * (i + 1)
                state, loss = step(state, im, gt)
                return state, loss

            _, losses = jax.lax.scan(body, state, jnp.arange(n))
            return losses.sum()

        return loop

    from depth_estimation_tpu.utils.benchmark import slope_time_ms

    ms = slope_time_ms(make_loop, (state0, imgs, gt), n1=6, n2=18)
    print(f"train step: {ms:.1f} ms/step on-chip "
          f"({1000.0 / ms:.1f} steps/s, {args.batch * 1000.0 / ms:.1f} imgs/s)"
          f"{' [remat]' if args.remat else ''}")


if __name__ == "__main__":
    main()
