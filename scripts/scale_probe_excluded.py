#!/usr/bin/env python
"""Spark-side at-scale probe for the oracle-excluded entries.

`scripts/sweep_sf16.py` excludes ~20 registry entries because their
DUCKDB ORACLE SQL is infeasible at sf1.6 density (quadratic
baselines, signature rebuilds, unrolled Lloyd, unbounded recursion).
That says nothing about the SPARK side — this probe runs each
excluded entry's Spark plan against the synthesized sf1.6 tables
(rows-only: materialize through the noop sink, record row count and
wall time), in one subprocess per entry so a hang cannot wedge the
sweep.  Entries whose SPARK side is itself a documented quadratic
baseline (all-pairs cosine/Jaccard) or a documented recursion
boundary are listed as such, not probed — their scale path is a
separate green entry.

Writes SCALE_PROBE.md.  Requires /tmp/spark_graft_scale/sf1.6
(run `scripts/scaling_curve.py --keep` first); dedup-density-
sensitive entries are probed on the natural-density corpus as well
when it exists, since the shuffled corpus inflates pair output.

Usage: python scripts/scale_probe_excluded.py [per_entry_timeout_sec]
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = "/tmp/spark_graft_scale/sf1.6"
NATURAL_DIR = "/tmp/spark_graft_scale/sf1.6_natural"

#: Spark side documented-infeasible by design: these ARE the
#: quadratic correctness baselines (or the documented recursion
#: boundary); each names its green scale-path twin.
SPARK_SIDE_BASELINE = {
    "dedup_ngram_jaccard": "all-pairs shingle self-join baseline -> dedup_jaccard_prefix_join",
    "embedding_near_dup": "n^2/2 cosine baseline -> semdedup_pairs / dedup_minhash_lsh",
    "minhash_accuracy_report": "exact pairwise Jaccard tuning readout -> run at sample scale",
    "neardup_components_sql": "recursive-CTE UNION ALL walk boundary (documented) -> neardup_components",
}

#: Entries whose REGISTRY build pins an oracle-determinism knob that
#: is NOT the production form: probe the production call instead.
#: (Round 4 emptied this: knn_graph_lsh / eval_semantic_contamination
#: now REGISTER the auto-width production form, oracle included, and
#: both left the exclusion list entirely.)
PROBE_BUILD_OVERRIDE: dict[str, str] = {}


def probe_one(name: str, sf_dir: str, timeout: int) -> subprocess.CompletedProcess:
    """Run one entry in a subprocess; parse its one-line JSON result."""
    build = PROBE_BUILD_OVERRIDE.get(
        name, f"df = REGISTRY[{name!r}].build(spark, sf_dir)"
    )
    code = f"""
import json, sys, time
sys.path.insert(0, {str(REPO)!r})
from storm_data_etl_service_spark.operators.registry import REGISTRY
from storm_data_etl_service_spark.session import get_spark
spark = get_spark(app_name="scale_probe",
                  extra_conf={{"spark.ui.showConsoleProgress": "false"}})
sf_dir = {sf_dir!r}
{build}
t0 = time.perf_counter()
n = df.count()
dt = time.perf_counter() - t0
print("PROBE_RESULT " + json.dumps({{"rows": n, "sec": round(dt, 2)}}))
"""
    return subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=timeout
    )


def _load_exclude() -> dict:
    """EXCLUDE from sweep_sf16.py — single source of truth (scripts/
    is not a package, so load the module by path)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "sweep_sf16", REPO / "scripts" / "sweep_sf16.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.EXCLUDE


def main() -> int:
    timeout = int(sys.argv[1]) if len(sys.argv) > 1 else 560
    only = set(sys.argv[2:])  # optional entry names: re-probe just these

    EXCLUDE = _load_exclude()

    # carry forward previous results (JSON sidecar) so a filtered
    # re-probe — e.g. a longer timeout for one slow census — merges
    # into the committed table instead of truncating it
    sidecar = REPO / "SCALE_PROBE.json"
    results: dict[str, dict] = {}
    if only and sidecar.exists():
        results = json.loads(sidecar.read_text())
    probe_names = [
        n
        for n in EXCLUDE
        if n not in SPARK_SIDE_BASELINE and (not only or n in only)
    ]
    for name in probe_names:
        dirs = [("shuffled", SF_DIR)]
        if name.startswith(("dedup", "neardup", "crossmodal", "fuzzy", "pagerank")) and Path(
            NATURAL_DIR, "documents.parquet"
        ).exists():
            dirs.append(("natural", NATURAL_DIR))
        for corpus, d in dirs:
            key = f"{name}@{corpus}"
            print(f"probe {key} ...", flush=True)
            t0 = time.perf_counter()
            try:
                p = probe_one(name, d, timeout)
            except subprocess.TimeoutExpired:
                results[key] = {"status": "fail", "detail": f"timeout > {timeout}s"}
                print(f"  TIMEOUT > {timeout}s", flush=True)
                continue
            wall = round(time.perf_counter() - t0, 1)
            line = [l for l in p.stdout.splitlines() if l.startswith("PROBE_RESULT ")]
            if p.returncode == 0 and line:
                r = json.loads(line[-1].split(" ", 1)[1])
                results[key] = {"status": "ok", **r, "wall_incl_session": wall}
                print(f"  ok rows={r['rows']} {r['sec']}s", flush=True)
            else:
                tail = (p.stderr or p.stdout)[-300:].replace("\n", " ")
                results[key] = {"status": "fail", "detail": tail}
                print(f"  FAIL {tail[:120]}", flush=True)

    lines = [
        "# SCALE_PROBE — Spark-side runs of the oracle-excluded entries at sf1.6",
        "",
        "Generated by `scripts/scale_probe_excluded.py`.  These entries are",
        "excluded from `sweep_sf16.py` because their DUCKDB ORACLE is",
        "infeasible at sf1.6 density; this table shows their SPARK side",
        "executing at that scale (rows materialized via count; exec time",
        "excludes session startup).  Dedup-density-sensitive entries run on",
        "both the shuffled corpus (inflated near-dup density) and the",
        "natural-density corpus.  Times are single-shot and swing 2-3x",
        "run-to-run on this host (see SCALING.md's best-of protocol) —",
        "the signal here is completion + row count, not the seconds.",
        "",
        "| entry | corpus | rows | exec sec |",
        "|---|---|---|---|",
    ]
    ok = fail = 0
    for key, r in results.items():
        name, corpus = key.split("@")
        if r["status"] == "ok":
            ok += 1
            lines.append(f"| {name} | {corpus} | {r['rows']} | {r['sec']} |")
        else:
            fail += 1
            lines.append(f"| {name} | {corpus} | FAIL | {r.get('detail','')[:80]} |")
    lines += [
        "",
        "Not probed — the Spark side IS the documented baseline/boundary",
        "(its scale path is a separate green entry):",
        "",
    ]
    for name, why in SPARK_SIDE_BASELINE.items():
        lines.append(f"- **{name}** — {why}")
    lines.append("")
    sidecar.write_text(json.dumps(results, indent=1))
    (REPO / "SCALE_PROBE.md").write_text("\n".join(lines))
    print(f"\nwrote SCALE_PROBE.md: ok={ok} fail={fail} "
          f"baseline-documented={len(SPARK_SIDE_BASELINE)}")
    return 1 if fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
