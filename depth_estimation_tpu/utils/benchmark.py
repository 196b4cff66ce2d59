"""THE timing methodology for this repo — salted fori_loop slope timing.

Per-call wall timing lies on this box (see CLAUDE.md): the TPU sits behind
a tunnel with ~100 ms variable dispatch latency, the remote executor
memoizes identical (executable, inputs) invocations — including repeat
calls of the same jitted function with the same args — and
``block_until_ready`` does not actually synchronize (only value fetches
do). The defenses, all load-bearing:

* the measured computation is iterated inside one jitted
  ``lax.fori_loop`` whose body perturbs the input per step, timed at two
  iteration counts and differenced — per-dispatch latency cancels;
* every timed invocation carries a fresh ``salt`` argument so the remote
  cache can never serve a repeat;
* the loop result is fetched with ``float(...)`` (a value fetch), the one
  operation that truly synchronizes.

Every benchmark in the repo (bench.py, tools/pallas_ab.py,
tools/precision_bisect.py) builds on these helpers; fix timing bugs HERE.
"""

from __future__ import annotations

import time
from typing import Callable, Sequence


def slope_time_ms(
    make_loop: Callable[[int], Callable],
    args: Sequence,
    n1: int = 16,
    n2: int = 48,
    repeats: int = 3,
) -> float:
    """ms per loop step. ``make_loop(n)`` returns a jitted callable invoked
    as ``loop(*args, salt)`` whose result is a scalar (fetched to block).
    Each count is compiled+warmed once (uncounted), then min-of-``repeats``.

    Counts must be large enough that the (n2-n1)-iteration time delta
    dominates tunnel RTT noise (~±0.1 s observed): a 16-iteration delta of
    a ~12 ms/frame program is ~0.2 s — same order as the noise, and one
    congested-tunnel session measured DPT-Large 34% fast that way. The
    defaults give a ≥3× noise margin for ≥6 ms/iteration programs; pass
    bigger counts for cheaper ones.
    """
    import jax.numpy as jnp

    salt_counter = [0]

    def timed(loop):
        salt_counter[0] += 1
        t0 = time.perf_counter()
        float(loop(*args, jnp.float32(salt_counter[0])))
        return time.perf_counter() - t0

    mins = {}
    for n in (n1, n2):
        loop = make_loop(n)
        timed(loop)  # compile + warm (uncounted)
        mins[n] = min(timed(loop) for _ in range(repeats))
    return max((mins[n2] - mins[n1]) / (n2 - n1), 1e-6) * 1e3


def salted_loop(step_fn: Callable) -> Callable[[int], Callable]:
    """Wrap ``step_fn(i, salt, *args) -> scalar`` into a ``make_loop`` for
    slope_time_ms: ``loop(*args, salt)`` runs n salted steps and sums.

    The trip count is a TRACED argument of one shared jitted loop, so both
    slope counts run the SAME executable — one compile instead of two
    (compile time dominated the old per-family bench cost, VERDICT r4 #1),
    and the slope method's core assumption (identical per-iteration cost at
    both counts) holds by construction rather than by hoping XLA lowered
    two separately-compiled loops identically."""
    import jax
    import jax.numpy as jnp

    loop_cell: list = []

    def make_loop(n):
        if not loop_cell:
            @jax.jit
            def loop(*args_salt_n):
                *args, salt, n_dyn = args_salt_n

                def body(i, acc):
                    return acc + step_fn(i, salt, *args)

                return jax.lax.fori_loop(
                    0, n_dyn, body, jnp.zeros((), jnp.float32)
                )

            loop_cell.append(loop)
        loop = loop_cell[0]

        def bound(*args_and_salt):
            return loop(*args_and_salt, jnp.int32(n))

        return bound

    return make_loop


def perturb_u8(img_u8, i, salt):
    """Cheap per-step + per-invocation uint8 perturbation (defeats both the
    loop-level CSE and the remote invocation cache)."""
    import jax.numpy as jnp

    off = ((i.astype(jnp.float32) + salt) % 7.0).astype(jnp.uint8)
    return img_u8 + off


def onchip_frame_ms(est, img_u8, n1: int = 24, n2: int = 72, repeats: int = 3) -> float:
    """On-chip ms/frame of the estimator's OWN shipped frame program
    (est.frame_fn — jitted, so it inlines into the timing loop; there is no
    re-implementation that could drift from what users run)."""
    import jax.numpy as jnp

    fn = est.frame_fn(img_u8.shape[:2])

    def step(i, salt, params, img):
        return fn(params, perturb_u8(img, i, salt)).mean()

    return slope_time_ms(
        salted_loop(step), (est.params, jnp.asarray(img_u8)), n1, n2, repeats
    )


def onchip_batch_ms_per_image(
    est, imgs_u8, n1: int = 8, n2: int = 24, repeats: int = 3
) -> float:
    """On-chip ms/image of the estimator's shipped BATCHED program
    (est._batched_fn — the same executable predict_batch runs)."""
    import jax.numpy as jnp

    fn = est._batched_fn(imgs_u8.shape[1:3])

    def step(i, salt, params, imgs):
        return fn(params, perturb_u8(imgs, i, salt)).mean()

    ms = slope_time_ms(
        salted_loop(step), (est.params, jnp.asarray(imgs_u8)), n1, n2, repeats
    )
    return ms / imgs_u8.shape[0]
