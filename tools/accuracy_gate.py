#!/usr/bin/env python
"""Accuracy gate: measure max abs-rel error vs the torch oracles on the
current JAX backend (run on the TPU for the numbers that matter).

Without network access the oracles use full-scale random weights in the
authentic hub format — a conservative proxy that exercises every layer at
real dimensions. With a real hub checkpoint on disk, pass
``--from-pt <ckpt.pt> --models <name>`` to gate the ACTUAL weights: the
same .pt drives both the torch oracle and our converter+model, so the
measured error is the real-deployment number.

Usage: python tools/accuracy_gate.py [--threshold 1e-3]
       python tools/accuracy_gate.py --from-pt midas_v21.pt --models MiDaS
"""

import argparse
import sys
import time
import warnings

import numpy as np


def _gate(entry_name, make_model, convert, oracle, seed, hw, sd=None):
    """Shared gate body: full-scale hub weights (random by default, or a
    real state dict via ``sd``) → converted Flax model at the registry's
    f32 precision vs the torch oracle; max abs-rel error."""
    import jax
    import torch

    sys.path.insert(0, ".")
    from depth_estimation_tpu.registry import get_entry

    prec = get_entry(entry_name).f32_precision
    if sd is None:
        sd = oracle.make_random_state_dict(seed=seed)
    params = {"params": convert({k: v.numpy() for k, v in sd.items()})}
    x = np.random.default_rng(0).standard_normal((1, *hw, 3)).astype(np.float32) * 0.5
    ref = oracle.forward(sd, torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    m = make_model()

    @jax.jit
    def fwd(p, x):
        with jax.default_matmul_precision(prec):
            return m.apply(p, x)

    out = np.asarray(fwd(params, x))
    return float(np.abs(out - ref).max() / (np.abs(ref).max() + 1e-8))


def gate_midas_small(sd=None):
    sys.path.insert(0, ".")
    from depth_estimation_tpu.models.midas_small import MidasSmall
    from depth_estimation_tpu.utils.convert import convert_midas_small
    from tests.oracles import midas_small_torch as oracle

    return _gate("MiDaS_small", MidasSmall, convert_midas_small, oracle,
                 seed=11, hw=(256, 256), sd=sd)


def gate_midas_v21(sd=None):
    sys.path.insert(0, ".")
    from depth_estimation_tpu.models.midas_v21 import MidasV21
    from depth_estimation_tpu.utils.convert import convert_midas_v21
    from tests.oracles import midas_v21_torch as oracle

    # small_transform bucket (the reference's non-DPT branch): 256 upper_bound
    return _gate("MiDaS", MidasV21, convert_midas_v21, oracle,
                 seed=13, hw=(256, 256), sd=sd)


def gate_dpt(cfg_name, sd=None):
    import jax
    import torch

    from depth_estimation_tpu.models.dpt import DPT_HYBRID, DPT_LARGE
    from depth_estimation_tpu.utils.convert import convert_dpt
    from tests.oracles import dpt_torch as oracle

    from depth_estimation_tpu.registry import get_entry

    entry = get_entry(cfg_name)
    prec = entry.f32_precision
    cfg = DPT_LARGE if cfg_name == "DPT_Large" else DPT_HYBRID
    if sd is None:
        sd = oracle.make_random_state_dict(cfg, seed=5)
    params = {"params": convert_dpt({k: v.numpy() for k, v in sd.items()}, cfg)}
    x = np.random.default_rng(0).standard_normal((1, 384, 384, 3)).astype(np.float32) * 0.5
    fwd_t = oracle.forward_hybrid if cfg.hybrid else oracle.forward
    ref = fwd_t(sd, torch.from_numpy(x.transpose(0, 3, 1, 2)), cfg).numpy()
    # build via the registry factory, NOT DPT(cfg): the shipped model may
    # carry section-precision overrides (e.g. Hybrid's mixed config) that
    # the gate must measure exactly as the estimator runs them
    m = entry.make_model()

    @jax.jit
    def fwd(p, x):
        with jax.default_matmul_precision(prec):
            return m.apply(p, x)

    out = np.asarray(fwd(params, x))
    return float(np.abs(out - ref).max() / (np.abs(ref).max() + 1e-8))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--threshold", type=float, default=1e-3)
    ap.add_argument("--models", nargs="*", default=["MiDaS_small", "MiDaS", "DPT_Large", "DPT_Hybrid"])
    ap.add_argument("--from-pt", default=None,
                    help="gate a REAL hub checkpoint (.pt state dict) instead "
                         "of random weights; use with a single --models name")
    args = ap.parse_args()

    import sys as _sys
    _sys.path.insert(0, ".")
    from depth_estimation_tpu.utils.platform import (
        apply_platform_env,
        enable_compilation_cache,
    )
    apply_platform_env()  # honor DEPTH_TPU_PLATFORM=cpu before backend init
    enable_compilation_cache()

    import jax

    print(f"backend: {jax.default_backend()}")
    real_sd = None
    if args.from_pt:
        if len(args.models) != 1:
            ap.error("--from-pt gates one model; pass a single --models name")
        import torch

        real_sd = torch.load(args.from_pt, map_location="cpu", weights_only=True)
        if hasattr(real_sd, "state_dict"):
            real_sd = real_sd.state_dict()
        print(f"gating real checkpoint {args.from_pt} ({len(real_sd)} tensors)")
    ok = True
    for name in args.models:
        t0 = time.time()
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            if name == "MiDaS_small":
                err = gate_midas_small(sd=real_sd)
            elif name == "MiDaS":
                err = gate_midas_v21(sd=real_sd)
            else:
                err = gate_dpt(name, sd=real_sd)
        status = "PASS" if err < args.threshold else "FAIL"
        ok &= err < args.threshold
        print(f"{name}: max abs-rel {err:.2e} vs torch oracle -> {status} ({time.time()-t0:.0f}s)")
    print("GATE", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
