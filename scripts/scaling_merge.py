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
    # DEDUP_FAMILY members also carry a natural-density-corpus row —
    # re-measure it too, or the re-rendered natural table silently
    # mixes rounds (stale sf0.1 baseline against a new shuffled row).
    nat_queries = [q for q in queries if q in sc.DEDUP_FAMILY]
    nat_note = None
    if nat_queries:
        natural_dir = sc.SCRATCH / f"sf{sfs[-1]}_natural"
        if (natural_dir / "documents.parquet").exists():
            print(f"bench natural-corpus subset @ sf{sfs[-1]} ...", flush=True)
            nat_times = sc.run_bench(str(natural_dir), nat_queries)["queries"]
            for q in nat_queries:
                t_small = per_sf[sfs[-2]].get(q)
                t_nat = nat_times.get(q)
                summary.setdefault("natural_corpus", {})[q] = {
                    "sf0.1_sec": t_small,
                    "natural_sf_sec": t_nat,
                    "exponent": (
                        round(math.log(t_nat / t_small) / math.log(top_ratio), 3)
                        if t_small and t_nat
                        else None
                    ),
                }
                print(f"  {q} natural: {t_small} -> {t_nat}", flush=True)
        else:
            nat_note = (
                f"natural corpus missing at {natural_dir}; DEDUP_FAMILY rows "
                f"for {nat_queries} NOT re-measured (stale)"
            )
            for q in nat_queries:
                row = summary.get("natural_corpus", {}).get(q)
                if row is not None:
                    row["stale"] = True
            print(nat_note, flush=True)
    summary.setdefault("merged_rounds", []).append(
        {
            "queries": queries,
            "note": "subset re-measure via scaling_merge.py",
            **({"natural_omission": nat_note} if nat_note else {}),
        }
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
