#!/usr/bin/env python
"""Incremental SCALING update: re-measure a SUBSET of bench queries
across the scale ladder and merge the rows into the committed
SCALING.json, then re-render SCALING.md.

Exists because a full `scaling_curve.py` pass re-times all ~50
headline queries at four scales (~2 h wall) — overkill when a round
changes a handful of operators.  Rows for unchanged queries keep
their previous measurements (same host, same protocol); merged rows
record the merge in the summary's `merged_rounds` note.

The scaled corpora must already exist (`scaling_curve.py --keep`).

Usage: python scripts/scaling_merge.py <query> [query ...]
"""

from __future__ import annotations

import json
import math
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    queries = sys.argv[1:]
    if not queries:
        print(__doc__)
        return 2

    sys.path.insert(0, str(REPO / "scripts"))
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "scaling_curve", REPO / "scripts/scaling_curve.py"
    )
    sc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sc)

    summary = json.loads((REPO / "SCALING.json").read_text())
    sfs = summary["scales"]
    top_ratio = summary["top_step_data_ratio"]
    scaled_dir = sc.SCRATCH / f"sf{sfs[-1]}"
    if not (scaled_dir / "documents.parquet").exists():
        print(f"missing {scaled_dir}; run scaling_curve.py --keep first")
        return 1

    dirs = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
            "/root/testdata/sf0.1", str(scaled_dir)]
    per_sf = {}
    for sf, d in zip(sfs, dirs):
        print(f"bench subset @ sf{sf} ...", flush=True)
        per_sf[sf] = sc.run_bench(d, queries)["queries"]

    flagged = set(summary.get("flagged_superlinear", []))
    for q in queries:
        times = [per_sf[s].get(q) for s in sfs]
        t_prev, t_top = times[-2], times[-1]
        exponent = (
            round(math.log(t_top / t_prev) / math.log(top_ratio), 3)
            if t_prev and t_top and t_prev > 0
            else None
        )
        summary["queries"][q] = {
            "times_sec": times,
            "top_step_exponent": exponent,
        }
        flagged.discard(q)
        if exponent is not None and t_top > (top_ratio * 1.3) * t_prev:
            flagged.add(q)
        print(f"  {q}: {times} exp={exponent}", flush=True)
    summary["flagged_superlinear"] = sorted(
        f for f in flagged if f in summary["queries"]
    )
    summary.setdefault("merged_rounds", []).append(
        {"queries": queries, "note": "subset re-measure via scaling_merge.py"}
    )
    summary["totals_sec"] = {
        s: round(sum(v["times_sec"][i] for v in summary["queries"].values()
                     if v["times_sec"][i] is not None), 4)
        for i, s in enumerate(sfs)
    }
    (REPO / "SCALING.json").write_text(json.dumps(summary, indent=1))
    sc.render_md(summary)
    print("merged; SCALING.json + SCALING.md updated")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
