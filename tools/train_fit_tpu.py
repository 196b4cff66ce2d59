#!/usr/bin/env python
"""On-chip training proof-of-life: a real fit, not just step timing.

VERDICT r4 #6: the training subsystem was proven at full scale for step
TIME (tools/train_bench.py) and for convergence only at tiny CPU configs
(tests/test_train_loop.py). This tool closes the gap: a short REAL-CHIP
fit of a full-scale registry model on synthetic .npz data that asserts

  1. the SSI+gradient-matching loss DECREASES monotonically across
     thirds of the logged curve (per-step noise tolerated, trend not),
  2. a mid-run orbax checkpoint + a SECOND PROCESS resume continues the
     curve (no loss jump at the seam, further decrease after it).

Flow (single command, two phases):
  phase A (this process)  — write a synthetic .npz dataset (train/data.py
      storage format: u8 image + f32 disparity), build the full model,
      fit() steps 0..S/2 with ckpt_dir → orbax checkpoint at S/2;
  phase B (fresh python)  — re-exec this script with --phase b: rebuilds
      everything from scratch, fit() to S resumes from the on-disk
      checkpoint ("resumed from step S/2"), continues the curve; history
      is returned to the parent through a JSON file and both curves are
      asserted together.

The cross-process resume is the point: phase B's TrainState (params +
adamw moments + step) comes entirely from orbax restore, exercising
utils/checkpoint.py::{save,load}_train_state the way a preempted fleet
job would (reference has no training at all — SURVEY.md §2c; this is the
beyond-reference subsystem's end-to-end proof).

Usage:
  python tools/train_fit_tpu.py                     # full v2.1 on the chip
  python tools/train_fit_tpu.py --quick             # MiDaS_small 128², fast
  DEPTH_TPU_PLATFORM=cpu python tools/train_fit_tpu.py --quick   # no TPU
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import subprocess
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def write_synthetic_npz(root: pathlib.Path, n: int, h: int, w: int, seed: int = 0) -> None:
    """Structured synthetic samples in the train/data.py storage format:
    a bright disc at a known disparity over a floor-like gradient, imaged
    into u8 RGB with the disparity driving the channels (learnable signal,
    unlike pure noise)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    root.mkdir(parents=True, exist_ok=True)
    for i in range(n):
        cx = int(rng.integers(w // 4, 3 * w // 4))
        cy = int(rng.integers(h // 4, 3 * h // 4))
        r = int(rng.integers(min(h, w) // 8, min(h, w) // 4))
        disc = ((xx - cx) ** 2 + (yy - cy) ** 2) < r * r
        disp = np.where(disc, 1.0, 1.0 / (2.0 + 3.0 * (yy / h))).astype(np.float32)
        img_f = np.stack([disp, disp * 0.5, 1.0 - disp], axis=-1)
        img_f = img_f + rng.normal(0, 0.02, img_f.shape)
        img = np.clip(img_f * 255.0, 0, 255).astype(np.uint8)
        np.savez(root / f"sample_{i:03d}.npz", image=img, disparity=disp)


def run_fit(args, steps: int) -> list:
    """Build the dataset pipeline + full model and fit() to ``steps``,
    resuming from args.ckpt_dir when a checkpoint exists. Returns the
    logged (step, loss) history."""
    from depth_estimation_tpu.utils.platform import (
        apply_platform_env,
        enable_compilation_cache,
    )

    apply_platform_env()

    enable_compilation_cache()
    import warnings

    import jax

    from depth_estimation_tpu.registry import get_entry
    from depth_estimation_tpu.train.data import (
        batches,
        device_prefetch,
        iter_npz_dir,
        make_training_apply,
    )
    from depth_estimation_tpu.train.loop import fit

    entry = get_entry(args.model)
    model = entry.make_model()
    apply_u8 = make_training_apply(model, entry.preprocess, net_hw=(args.net, args.net))

    t0 = time.time()
    x0 = np.zeros((args.batch, args.hw, args.hw, 3), np.uint8)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0),
            np.zeros((args.batch, args.net, args.net, 3), np.float32),
        )
        float(np.asarray(jax.tree_util.tree_leaves(params)[0]).ravel()[0])
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
    print(f"{args.model}: {n_params / 1e6:.1f}M params, net {args.net}², "
          f"data {args.hw}² batch {args.batch}, backend {jax.default_backend()}, "
          f"init {time.time() - t0:.1f}s", flush=True)

    data = device_prefetch(
        batches(iter_npz_dir(args.data_dir), args.batch, epochs=10_000, seed=1),
        size=2,
    )
    t1 = time.time()
    state, history = fit(
        apply_u8, params, data, steps=steps, lr=args.lr,
        ckpt_dir=args.ckpt_dir, ckpt_every=max(steps, 1),
        log_every=args.log_every, verbose=True,
    )
    dt = time.time() - t1
    done = steps - min((h[0] for h in history), default=steps) + args.log_every
    print(f"fit wall {dt:.1f}s (~{dt / max(done, 1) * 1000:.0f} ms/step e2e "
          f"incl. compile)", flush=True)
    return [(int(s), float(l)) for s, l in history]


def assert_monotone_thirds(history: list, label: str) -> None:
    losses = [l for _, l in history]
    k = max(len(losses) // 3, 1)
    first, mid, last = losses[:k], losses[k:2 * k], losses[2 * k:]
    m1, m2, m3 = (float(np.mean(x)) for x in (first, mid, last))
    print(f"{label}: loss thirds {m1:.5f} -> {m2:.5f} -> {m3:.5f}")
    assert m1 > m2 > m3, f"{label}: loss not monotonically decreasing across thirds"
    assert losses[-1] < losses[0], f"{label}: final loss not below initial"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="MiDaS",
                    choices=("MiDaS_small", "MiDaS", "DPT_Large", "DPT_Hybrid"))
    ap.add_argument("--steps", type=int, default=200,
                    help="total steps; phase A runs the first half")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--hw", type=int, default=256, help="dataset resolution")
    ap.add_argument("--net", type=int, default=256, help="network grid")
    # 1e-4 measured safe across families; >=1e-3 dead-ReLU-collapses the
    # randomly-initialized MiDaS output head (loss freezes at the constant-
    # zero-prediction value with exactly-zero grads) — see BASELINE.md r5
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--log-every", type=int, default=10)
    ap.add_argument("--samples", type=int, default=16)
    ap.add_argument("--quick", action="store_true",
                    help="MiDaS_small 128² few-step smoke (CPU-viable)")
    ap.add_argument("--work-dir", default=None,
                    help="reuse a work dir (default: fresh tempdir)")
    # internal: phase B re-exec
    ap.add_argument("--phase", default="a", choices=("a", "b"))
    ap.add_argument("--data-dir", default=None, help=argparse.SUPPRESS)
    ap.add_argument("--ckpt-dir", default=None, help=argparse.SUPPRESS)
    ap.add_argument("--history-out", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.quick:
        args.model, args.steps = "MiDaS_small", min(args.steps, 60)
        args.hw = args.net = 128

    if args.phase == "b":
        history = run_fit(args, steps=args.steps)
        pathlib.Path(args.history_out).write_text(json.dumps(history))
        return

    work = pathlib.Path(args.work_dir or tempfile.mkdtemp(prefix="depth_fit_"))
    data_dir, ckpt_dir = work / "data", work / "ckpt"
    hist_file = work / "history_b.json"
    write_synthetic_npz(data_dir, args.samples, args.hw, args.hw)
    args.data_dir, args.ckpt_dir = str(data_dir), str(ckpt_dir)

    half = args.steps // 2
    print(f"== phase A: steps 0..{half} (checkpoint at {half}) ==", flush=True)
    hist_a = run_fit(args, steps=half)

    print(f"== phase B: fresh process resumes {half}..{args.steps} ==", flush=True)
    cmd = [sys.executable, os.path.abspath(__file__), "--phase", "b",
           "--model", args.model, "--steps", str(args.steps),
           "--batch", str(args.batch), "--hw", str(args.hw),
           "--net", str(args.net), "--lr", str(args.lr),
           "--log-every", str(args.log_every),
           "--data-dir", str(data_dir), "--ckpt-dir", str(ckpt_dir),
           "--history-out", str(hist_file)]
    proc = subprocess.run(cmd, text=True, capture_output=True,
                          cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    sys.stdout.write(proc.stdout)
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr)
        raise SystemExit(f"phase B failed (rc {proc.returncode})")
    assert f"resumed from step {half}" in proc.stdout, \
        "phase B did not resume from the mid-run checkpoint"
    hist_b = json.loads(hist_file.read_text())

    # -- assertions ----------------------------------------------------
    full = hist_a + hist_b
    assert_monotone_thirds(full, "A+B curve")
    a_end = hist_a[-1][1]
    b_start = hist_b[0][1]
    seam_tol = 0.15 * abs(hist_a[0][1] - a_end) + 1e-6
    print(f"seam: A ends {a_end:.5f}, B first log {b_start:.5f} "
          f"(tol {seam_tol:.5f})")
    assert b_start < a_end + seam_tol, \
        "resume discontinuity: loss jumped at the checkpoint seam"
    assert hist_b[-1][1] < a_end, "phase B did not improve on phase A"
    print(json.dumps({
        "model": args.model, "steps": args.steps, "batch": args.batch,
        "net": args.net, "loss_first": full[0][1], "loss_mid": a_end,
        "loss_final": full[-1][1], "resume_ok": True,
        "history": full,
    }))
    print("TRAIN FIT PROOF-OF-LIFE: PASS")


if __name__ == "__main__":
    main()
