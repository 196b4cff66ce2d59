#!/usr/bin/env python
"""Round-over-round bench regression comparator (VERDICT r4 ask #3).

Diffs the current bench output against the previous round's driver record
(``BENCH_r{N}.json``) per metric and flags regressions beyond a threshold
(default 10%). The stale-Hybrid incident (a 7.2 ms number believed for two
rounds while the real program ran 13.4 ms) is why this is mechanical, not
prose: any number not re-measured and re-compared by a standing command
should be assumed stale.

Inputs
------
* ``--current``: a file of bench JSON lines (one object per line, the
  format ``python bench.py`` prints), OR a driver ``BENCH_r*.json`` record
  (detected by its ``tail``/``parsed`` envelope). Default: read lines from
  stdin.
* ``--previous``: the prior round's record. Default: the highest-numbered
  ``BENCH_r*.json`` in the repo root (``--previous BENCH_r03.json`` to pin).

Comparison keys: every bench line's ``metric`` name, plus the per-family
``all_models_onchip_ms`` / ``bf16_onchip_ms`` maps embedded in the headline
line (compared per model). Higher is better for fps/value metrics; lower is
better for ms metrics.

Output: a markdown table (paste into BASELINE.md) and one summary line.
Exit code 1 if any regression exceeds the threshold — CI-friendly.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import re
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent


def _lines_from_text(text: str) -> list[dict]:
    out = []
    for ln in text.splitlines():
        ln = ln.strip()
        if not ln.startswith("{"):
            continue
        try:
            obj = json.loads(ln)
        except json.JSONDecodeError:
            continue
        if isinstance(obj, dict) and "metric" in obj:
            out.append(obj)
    return out


def load_bench(path_or_text: str | pathlib.Path, is_text: bool = False) -> list[dict]:
    """Bench lines from either a raw-lines file or a driver BENCH_r*.json."""
    text = path_or_text if is_text else pathlib.Path(path_or_text).read_text()
    try:
        envelope = json.loads(text)
    except json.JSONDecodeError:
        envelope = None
    if isinstance(envelope, dict) and "tail" in envelope:
        # driver record: bench lines live in the captured tail
        return _lines_from_text(envelope.get("tail", ""))
    return _lines_from_text(text)


def latest_record(exclude: pathlib.Path | None = None) -> pathlib.Path | None:
    recs = sorted(
        p for p in REPO.glob("BENCH_r*.json")
        if re.match(r"BENCH_r\d+\.json$", p.name) and p != exclude
    )
    return recs[-1] if recs else None


def flatten(lines: list[dict]) -> dict[str, tuple[float, bool]]:
    """{key: (value, lower_is_better)} for every comparable number."""
    out: dict[str, tuple[float, bool]] = {}
    for obj in lines:
        m = obj["metric"]
        if isinstance(obj.get("value"), (int, float)):
            out[m] = (float(obj["value"]), False)  # fps/imgs-per-s: higher better
        for k in ("onchip_ms_per_frame", "onchip_ms_per_image"):
            if isinstance(obj.get(k), (int, float)):
                out[f"{m}.{k}"] = (float(obj[k]), True)
        for map_key in ("all_models_onchip_ms", "bf16_onchip_ms"):
            fam = obj.get(map_key)
            if isinstance(fam, dict):
                for model, ms in fam.items():
                    if isinstance(ms, (int, float)):
                        out[f"{map_key}.{model}"] = (float(ms), True)
    return out


def compare(cur: dict, prev: dict, threshold: float):
    rows, regressions = [], []
    for key in sorted(set(cur) | set(prev)):
        cv = cur.get(key)
        pv = prev.get(key)
        if cv is None or pv is None:
            rows.append((key, pv, cv, None, "missing" if cv is None else "new"))
            continue
        (c, lower_better), (p, _) = cv, pv
        if p == 0:
            rows.append((key, pv, cv, None, "prev=0"))
            continue
        delta = (c - p) / p
        # normalize so positive = improvement
        gain = -delta if lower_better else delta
        status = "OK"
        if gain < -threshold:
            status = "REGRESSION"
            regressions.append(key)
        elif gain > threshold:
            status = "improved"
        rows.append((key, pv, cv, gain, status))
    return rows, regressions


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--current", default="-",
                    help="bench-lines file or BENCH_r*.json ('-' = stdin)")
    ap.add_argument("--previous", default=None,
                    help="prior BENCH_r*.json (default: latest in repo root)")
    ap.add_argument("--threshold", type=float, default=0.10,
                    help="flag |relative change| beyond this (default 10%%)")
    args = ap.parse_args()

    if args.current == "-":
        cur_lines = load_bench(sys.stdin.read(), is_text=True)
        cur_name = "<stdin>"
    else:
        cur_lines = load_bench(args.current)
        cur_name = args.current
    prev_path = (pathlib.Path(args.previous) if args.previous
                 else latest_record(exclude=pathlib.Path(cur_name)
                                    if cur_name != "<stdin>" else None))
    if prev_path is None or not prev_path.exists():
        print("bench_compare: no previous BENCH_r*.json record found", file=sys.stderr)
        return 2
    prev_lines = load_bench(prev_path)
    if not cur_lines:
        print(f"bench_compare: no bench lines parsed from {cur_name}", file=sys.stderr)
        return 2

    rows, regressions = compare(flatten(cur_lines), flatten(prev_lines), args.threshold)

    print(f"### bench compare: {cur_name} vs {prev_path.name} "
          f"(threshold {args.threshold:.0%})\n")
    print("| metric | prev | current | change | status |")
    print("|---|---|---|---|---|")
    for key, pv, cv, gain, status in rows:
        p = f"{pv[0]:g}" if pv else "—"
        c = f"{cv[0]:g}" if cv else "—"
        g = f"{gain:+.1%}" if gain is not None else "—"
        print(f"| {key} | {p} | {c} | {g} | {status} |")
    n_cmp = sum(1 for r in rows if r[3] is not None)
    print(f"\n{len(regressions)} regression(s) > {args.threshold:.0%} across "
          f"{n_cmp} compared metrics"
          + (f": {', '.join(regressions)}" if regressions else ""))
    return 1 if regressions else 0


if __name__ == "__main__":
    raise SystemExit(main())
