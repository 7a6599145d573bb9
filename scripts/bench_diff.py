#!/usr/bin/env python
"""Per-query bench regression diff: BENCH_r{N} vs BENCH_r{N-1}.

The driver records ``BENCH_r{N}.json`` per round ({"tail": "...one
JSON line from bench.py..."} or the bench line itself); this script
extracts the per-query timings from any two of them (or a fresh
``bench.py`` output file) and flags regressions worse than
``THRESHOLD`` (default 1.3x), ignoring sub-300ms queries where JVM
noise dominates.

Usage:
    python scripts/bench_diff.py BENCH_r01.json BENCH_r02.json
    python scripts/bench_diff.py            # latest two BENCH_r*.json
Exit code 1 when regressions are found (CI-friendly).
"""

from __future__ import annotations

import glob
import json
import re
import sys

THRESHOLD = 1.3
MIN_SEC = 0.3  # below this, fixed JVM/planning overhead dominates


def load_bench(path: str) -> dict:
    """Extract the bench JSON line from a driver BENCH_r*.json wrapper
    or a raw bench.py output file."""
    with open(path) as f:
        raw = f.read()
    try:
        doc = json.loads(raw)
        if isinstance(doc, dict) and "queries" in doc:
            return doc
        if isinstance(doc, dict) and "tail" in doc:
            raw = doc["tail"]
    except json.JSONDecodeError:
        pass
    for line in reversed(raw.splitlines()):
        m = re.search(r"\{.*\"queries\".*\}", line)
        if m:
            return json.loads(m.group(0))
    raise SystemExit(f"{path}: no bench JSON line with 'queries' found")


def main(argv: list[str]) -> int:
    if len(argv) == 2:
        before_path, after_path = argv
    else:
        paths = sorted(glob.glob("BENCH_r*.json"))
        if len(paths) < 2:
            print(json.dumps({"status": "skip", "reason": "need two BENCH_r*.json"}))
            return 0
        before_path, after_path = paths[-2], paths[-1]

    before, after = load_bench(before_path), load_bench(after_path)
    bq, aq = before["queries"], after["queries"]
    report = {
        "before": before_path,
        "after": after_path,
        "total_before_sec": round(sum(bq.values()), 3),
        "total_after_sec": round(sum(aq.values()), 3),
        "threshold": THRESHOLD,
        "regressions": {},
        "improvements": {},
        "added": sorted(set(aq) - set(bq)),
        "removed": sorted(set(bq) - set(aq)),
    }
    bs, as_ = before.get("spread", {}), after.get("spread", {})
    for name in sorted(set(bq) & set(aq)):
        b, a = bq[name], aq[name]
        ratio = a / b if b else float("inf")
        entry = {"before_sec": b, "after_sec": a, "ratio": round(ratio, 3)}
        med_ratio = None
        if name in bs and name in as_:
            bmed, amed = bs[name][len(bs[name]) // 2], as_[name][len(as_[name]) // 2]
            med_ratio = amed / bmed if bmed else float("inf")
            entry["before_spread"] = bs[name]
            entry["after_spread"] = as_[name]
            entry["median_ratio"] = round(med_ratio, 3)
        # A flag needs the MIN (steady-state) to regress AND, when both
        # rounds carry spreads, the MEDIAN too — one tail sample on a
        # 2-3x-noise host is not a regression (r2→r3 false flag on
        # byte-identical code).
        regressed = ratio > THRESHOLD and a > MIN_SEC
        if regressed and med_ratio is not None and med_ratio <= THRESHOLD:
            regressed = False
        if regressed:
            report["regressions"][name] = entry
        elif ratio < 1 / THRESHOLD and b > MIN_SEC:
            report["improvements"][name] = entry
    print(json.dumps(report, indent=2))
    return 1 if report["regressions"] else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
