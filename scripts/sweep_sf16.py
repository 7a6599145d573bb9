#!/usr/bin/env python
"""One-shot helper: oracle-check the whole registry against the
synthesized sf1.6 tables (scripts/scaling_curve.py --keep must have
run), excluding entries whose ORACLE SQL is infeasible at that
density (documented quadratic baselines and unbounded recursions —
the Spark side of those has separate at-scale evidence).  Chunked
subprocesses so one heavy query cannot wedge the sweep.

Usage: python scripts/sweep_sf16.py [chunk_timeout_sec]
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = "/tmp/spark_graft_scale/sf1.6"

#: oracle-side infeasible at sf1.6 density (reason in parentheses)
EXCLUDE = {
    "neardup_components": "DuckDB unbounded recursion on ~50-node near-cliques",
    "neardup_components_sql": "same, plus Spark UNION ALL walk explosion (documented)",
    "pagerank_neardup": "unrolled-CTE oracle over the dense pair graph",
    "neardup_triangle_count": "pair-graph triangle census oracle",
    "neardup_triangle_estimate": "sampled pair-graph triangle oracle (wedge join on kept edges)",
    "neardup_cluster_representative": "depends on components oracle",
    "neardup_source_overlap": "pair-graph oracle",
    "minhash_accuracy_report": "exact pairwise Jaccard oracle (df^2)",
    "dedup_ngram_jaccard": "naive all-shingles df^2 oracle",
    "dedup_jaccard_prefix_join": "same oracle as the naive join",
    "dedup_containment": "naive all-pairs containment oracle",
    "fuzzy_neardup_distance": "pairwise Levenshtein oracle",
    "duplicated_span_report": "per-doc span list_transform oracle at 80k docs",
    "embedding_near_dup": "n^2/2 cosine oracle (0.5B pairs)",
    "crossmodal_dedup_agreement": "naive all-shingles Jaccard + unrolled-Lloyd semdedup oracle",
    "dedup_ladder_report": "unions the df^2 Jaccard and unrolled-Lloyd rung oracles",
    "semdedup": "unrolled Lloyd iterations over 32k vectors in SQL",
    "semdedup_pairs": "same unrolled-Lloyd oracle as semdedup",
    "dedup_minhash_lsh": "12-permutation signature rebuild over 3.6M shingles in SQL",
    "dedup_incremental_minhash": "same signature rebuild",
    "dedup_simhash": "64-bit signature rebuild oracle",
    "eval_semantic_contamination": (
        "same 4-bit-pinned bucket join as knn_graph_lsh: ~5e7 DuckDB"
        " cosine rows at sf1.6; auto-bits production path probed"
        " Spark-side"
    ),
    "knn_graph_lsh": (
        "4-bit-pinned oracle form: bucket size grows ∝ n, so the DuckDB"
        " bucketed self-join materializes ~2e9 cosine rows (the"
        " semdedup fixed-knob trade); the auto-bits production path is"
        " what runs at scale and is probed Spark-side"
    ),
}


def main() -> int:
    timeout = int(sys.argv[1]) if len(sys.argv) > 1 else 560

    from storm_data_etl_service_spark.operators.registry import REGISTRY

    names = [n for n in REGISTRY if n not in EXCLUDE]
    chunks = [names[i : i + 18] for i in range(0, len(names), 18)]
    ok, fail, timed_out = [], [], []
    for ci, chunk in enumerate(chunks):
        print(f"chunk {ci + 1}/{len(chunks)}: {chunk[0]}..{chunk[-1]}", flush=True)
        try:
            p = subprocess.run(
                [sys.executable, str(REPO / "scripts/check_correctness.py"), *chunk],
                capture_output=True,
                text=True,
                env={**__import__("os").environ, "SPARK_GRAFT_CHECK_SF_DIR": SF_DIR},
                timeout=timeout,
            )
            seen = set()
            for line in p.stdout.splitlines():
                if line.startswith("  ok "):
                    name = line.split()[1]
                    ok.append(name)
                    seen.add(name)
                elif line.startswith("FAIL"):
                    name = line.split()[1].rstrip(":")
                    fail.append((name, line))
                    seen.add(name)
            for n in chunk:
                if n not in seen:
                    timed_out.append(n)
        except subprocess.TimeoutExpired as e:
            out = (e.stdout or b"").decode() if isinstance(e.stdout, bytes) else (e.stdout or "")
            seen = set()
            for line in out.splitlines():
                if line.startswith("  ok "):
                    ok.append(line.split()[1])
                    seen.add(line.split()[1])
                elif line.startswith("FAIL"):
                    name = line.split()[1].rstrip(":")
                    fail.append((name, line))
                    seen.add(name)
            for n in chunk:
                if n not in seen:
                    timed_out.append(n)
        for name, line in fail:
            print("  " + line, flush=True)

    print(f"\nok={len(ok)} fail={len(fail)} no-result={len(timed_out)} excluded={len(EXCLUDE)}")
    if timed_out:
        print("no-result (chunk timeout before reaching them):", ", ".join(timed_out))
    for name, line in fail:
        print("FAIL", name)
    return 1 if fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
