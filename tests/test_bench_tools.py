"""Unit tests for the bench harness plumbing (VERDICT r4 #1-#3): the
time-budget guard, the slope-timing single-executable loop, and the
round-over-round regression comparator. All pure CPU/host logic — the
actual on-chip numbers are the driver's job."""

import json
import time

import numpy as np
import pytest


# --- Budget guard (bench.py) -------------------------------------------------

def _load_root_module(name):
    import importlib.util
    import pathlib as _pl

    path = _pl.Path(__file__).resolve().parents[1] / name
    spec = importlib.util.spec_from_file_location(path.stem + "_mod", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _budget(total, elapsed=0.0):
    bench = _load_root_module("bench.py")
    return bench.Budget(total, time.monotonic() - elapsed)


def test_budget_allows_within_and_skips_beyond():
    b = _budget(1000.0)
    assert b.allows("family", 100.0, "family:X")
    assert b.skipped == []
    b2 = _budget(100.0)
    assert not b2.allows("family", 100.0, "family:Y")  # 100 < 100*1.25+15
    assert b2.skipped == ["family:Y"]


def test_budget_estimate_adapts_to_observed_max():
    b = _budget(200.0)
    b.record("family", 150.0)
    # observed 150 dominates the optimistic 50 estimate → 150*1.25+15 > 200
    assert not b.allows("family", 50.0, "family:Z")


def test_budget_estimate_adapts_downward_once_observed():
    # a warm exec cache makes phases ~6x cheaper than the cold-calibrated
    # static estimate; after one observation the observed cost must replace
    # the static guess or affordable phases get skipped late in the run
    b = _budget(100.0)
    b.record("family", 20.0)
    assert b.allows("family", 120.0, "family:warm")  # 20*1.25+15 < 100


def test_budget_kinds_are_independent():
    # the expensive headline must not starve the cheap family sweep
    b = _budget(200.0)
    b.record("headline", 400.0)
    assert b.allows("family", 60.0, "family:ok")


def test_budget_remaining_counts_down():
    b = _budget(500.0, elapsed=100.0)
    assert 395.0 < b.remaining() < 405.0


# --- single-executable slope loop (utils/benchmark.py) -----------------------

def test_salted_loop_single_compile_and_correct_counts():
    import jax
    import jax.numpy as jnp

    from depth_estimation_tpu.utils.benchmark import salted_loop

    calls = []

    def step(i, salt, x):
        calls.append(1)  # traced once per executable
        return (x * 0 + 1.0).sum() + 0.0 * salt + 0.0 * i

    make_loop = salted_loop(step)
    loop8 = make_loop(8)
    loop24 = make_loop(24)
    x = jnp.zeros((4,), jnp.float32)
    # n is a traced argument of ONE shared executable: the step body traces
    # exactly once even though two counts are used
    assert float(loop8(x, jnp.float32(1))) == 8 * 4
    assert float(loop24(x, jnp.float32(2))) == 24 * 4
    assert len(calls) == 1


def test_slope_time_ms_positive_and_finite():
    import jax.numpy as jnp

    from depth_estimation_tpu.utils.benchmark import salted_loop, slope_time_ms

    def step(i, salt, x):
        return (x + salt + i).sum()

    ms = slope_time_ms(salted_loop(step), (jnp.ones((64, 64), jnp.float32),),
                       n1=4, n2=12)
    assert np.isfinite(ms) and ms > 0


# --- bench_compare (tools/bench_compare.py) ----------------------------------

@pytest.fixture()
def compare_mod():
    return _load_root_module("tools/bench_compare.py")


def _mk_lines(fps, ms, fam=None, bf16=None):
    line = {"metric": "DPT_Large_384x384_stream_fps_per_chip", "value": fps,
            "unit": "frames/s", "onchip_ms_per_frame": ms}
    if fam:
        line["all_models_onchip_ms"] = fam
    if bf16:
        line["bf16_onchip_ms"] = bf16
    return [line]


def test_compare_flags_fps_drop_and_ms_rise(compare_mod):
    prev = compare_mod.flatten(_mk_lines(100.0, 10.0))
    cur = compare_mod.flatten(_mk_lines(80.0, 12.5))
    rows, regressions = compare_mod.compare(cur, prev, 0.10)
    assert sorted(regressions) == [
        "DPT_Large_384x384_stream_fps_per_chip",
        "DPT_Large_384x384_stream_fps_per_chip.onchip_ms_per_frame",
    ]


def test_compare_improvement_and_ok(compare_mod):
    prev = compare_mod.flatten(_mk_lines(100.0, 10.0))
    cur = compare_mod.flatten(_mk_lines(120.0, 9.8))
    rows, regressions = compare_mod.compare(cur, prev, 0.10)
    assert regressions == []
    by_key = {r[0]: r[4] for r in rows}
    assert by_key["DPT_Large_384x384_stream_fps_per_chip"] == "improved"
    assert by_key["DPT_Large_384x384_stream_fps_per_chip.onchip_ms_per_frame"] == "OK"


def test_compare_family_maps_and_missing(compare_mod):
    prev = compare_mod.flatten(_mk_lines(100.0, 10.0, fam={"MiDaS": 6.5},
                                         bf16={"MiDaS": 3.4}))
    cur = compare_mod.flatten(_mk_lines(100.0, 10.0, fam={"MiDaS": 7.5}))
    rows, regressions = compare_mod.compare(cur, prev, 0.10)
    assert "all_models_onchip_ms.MiDaS" in regressions  # 6.5 → 7.5 ms
    missing = [r[0] for r in rows if r[4] == "missing"]
    assert "bf16_onchip_ms.MiDaS" in missing


def test_compare_parses_driver_record_envelope(compare_mod, tmp_path):
    tail_line = json.dumps(_mk_lines(91.55, 10.924)[0])
    rec = {"n": 3, "rc": 0, "tail": f"WARNING: noise\n{tail_line}\n"}
    p = tmp_path / "BENCH_r99.json"
    p.write_text(json.dumps(rec))
    lines = compare_mod.load_bench(p)
    assert lines and lines[0]["value"] == 91.55


def test_budget_emergency_record_fires_in_subprocess(tmp_path):
    """A hang past budget+grace must still emit the partial headline record
    (exit 0) — or exit 4 when nothing was measured yet."""
    import subprocess
    import sys as _sys
    import pathlib as _pl

    root = _pl.Path(__file__).resolve().parents[1]
    code = (
        "import importlib.util, time, sys\n"
        f"spec = importlib.util.spec_from_file_location('bench_mod', {str(root / 'bench.py')!r})\n"
        "bench = importlib.util.module_from_spec(spec); spec.loader.exec_module(bench)\n"
        "b = bench.Budget(0.2, time.monotonic())\n"
        "b.emergency.update({'metric': 'X_stream_fps_per_chip', 'value': 1.0})\n"
        "b.arm_emergency(grace_s=0.3)\n"
        "time.sleep(30)\n"
    )
    r = subprocess.run([_sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=25)
    assert r.returncode == 0, r.stderr
    import json as _json

    rec = _json.loads(r.stdout.strip().splitlines()[-1])
    assert rec["metric"] == "X_stream_fps_per_chip" and "aborted" in rec

    code_none = code.replace("b.emergency.update({'metric': 'X_stream_fps_per_chip', 'value': 1.0})\n", "")
    r2 = subprocess.run([_sys.executable, "-c", code_none], capture_output=True,
                        text=True, timeout=25)
    assert r2.returncode == 4
