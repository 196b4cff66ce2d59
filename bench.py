#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric (BASELINE.md north star): DPT-Large 384×384 streaming-video
FPS on one TPU chip, compared against the CPU reference FPS. The original
repo publishes no numbers and its torch/timm/mediapipe stack cannot run here
(no network / no timm), so the CPU baseline is THIS framework's identical
f32 frame function on the CPU backend — the same math the torch reference
executes on CPU (measured in a subprocess; cached in .bench_cache.json).

Usage: python bench.py [--model-type DPT_Large] [--frames 32] [--height 384]
                       [--width 384] [--cpu-frames 2] [--cpu-worker]
"""

import argparse
import json
import os
import pathlib
import subprocess
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent
CACHE = REPO / ".bench_cache.json"


def make_inputs(n, h, w):
    sys.path.insert(0, str(REPO))
    from depth_estimation_tpu.runtime.video import SyntheticSource

    src = SyntheticSource(n, h, w)
    frames = []
    while True:
        ok, f = src.read()
        if not ok:
            break
        frames.append(f)
    return frames


def measure(model_type, frames, warmup=3):
    import jax

    from depth_estimation_tpu.estimator import DepthEstimator

    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        est = DepthEstimator(model_type, verbose=False)
    h, w = frames[0].shape[:2]
    fn = est.frame_fn((h, w))
    for i in range(warmup):
        jax.block_until_ready(fn(est.params, frames[i % len(frames)]))

    # p50 latency: per-frame blocking round trip
    lat = []
    for f in frames[: min(len(frames), 16)]:
        t0 = time.perf_counter()
        jax.block_until_ready(fn(est.params, f))
        lat.append(time.perf_counter() - t0)
    p50_ms = sorted(lat)[len(lat) // 2] * 1e3

    # throughput: pipelined submissions, block at the end
    t0 = time.perf_counter()
    out = None
    for f in frames:
        out = fn(est.params, f)
    jax.block_until_ready(out)
    fps = len(frames) / (time.perf_counter() - t0)
    return fps, p50_ms


def cpu_baseline(model_type, h, w, cpu_frames):
    key = f"{model_type}_{h}x{w}_cpu_fps"
    if CACHE.exists():
        cache = json.loads(CACHE.read_text())
        if key in cache:
            return cache[key], True
    env = dict(os.environ, DEPTH_TPU_PLATFORM="cpu")
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py"), "--cpu-worker",
         "--model-type", model_type, "--frames", str(cpu_frames),
         "--height", str(h), "--width", str(w)],
        capture_output=True, text=True, env=env, timeout=3600,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not line:
        raise RuntimeError(f"cpu worker failed: {out.stdout}\n{out.stderr}")
    fps = json.loads(line[-1])["fps"]
    cache = json.loads(CACHE.read_text()) if CACHE.exists() else {}
    cache[key] = fps
    CACHE.write_text(json.dumps(cache))
    return fps, False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-type", default="DPT_Large")
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--height", type=int, default=384)
    ap.add_argument("--width", type=int, default=384)
    ap.add_argument("--cpu-frames", type=int, default=2)
    ap.add_argument("--cpu-worker", action="store_true")
    ap.add_argument("--skip-cpu", action="store_true")
    args = ap.parse_args()

    sys.path.insert(0, str(REPO))
    from depth_estimation_tpu.utils.platform import apply_platform_env

    apply_platform_env()

    if args.cpu_worker:
        frames = make_inputs(max(args.frames, 2), args.height, args.width)
        fps, p50 = measure(args.model_type, frames, warmup=1)
        print(json.dumps({"fps": fps, "p50_ms": p50}))
        return

    frames = make_inputs(args.frames, args.height, args.width)
    fps, p50_ms = measure(args.model_type, frames)

    if args.skip_cpu:
        cpu_fps = None
    else:
        cpu_fps, _cached = cpu_baseline(args.model_type, args.height, args.width, args.cpu_frames)

    vs = (fps / cpu_fps) if cpu_fps else None
    print(json.dumps({
        "metric": f"{args.model_type}_{args.height}x{args.width}_stream_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(vs, 2) if vs else None,
        "p50_latency_ms": round(p50_ms, 2),
        "cpu_reference_fps": round(cpu_fps, 3) if cpu_fps else None,
    }))


if __name__ == "__main__":
    main()
