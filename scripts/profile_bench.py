#!/usr/bin/env python
"""Per-query stage-level profiler for the bench queries.

Runs each named query (or a default hot set) through the noop sink
exactly like bench.py, but with the Spark UI enabled, and pulls the
REST API's per-stage metrics for the query's jobs: executor run time,
shuffle read/write bytes, task counts.  This answers "where does the
wall time go" (guide §1.1/§7.1) without eyeballing a live UI.

Usage:
    python scripts/profile_bench.py [query ...] [--out FILE]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DEFAULT_QUERIES = [
    "dedup_ladder_report",
    "neardup_triangle_estimate",
    "dedup_jaccard_prefix_join",
    "dedup_containment",
    "duplicated_span_report",
    "minhash_band_calibration",
]


def api(port: int, path: str):
    with urllib.request.urlopen(f"http://localhost:{port}/api/v1/{path}") as r:
        return json.load(r)


def main():
    from storm_data_etl_service_spark.operators.registry import REGISTRY
    from storm_data_etl_service_spark.session import get_spark

    argv = sys.argv[1:]
    out_file = None
    if "--out" in argv:
        i = argv.index("--out")
        out_file = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    queries = argv or DEFAULT_QUERIES

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_SCAN_PARTITIONS", os.environ.get("SPARK_GRAFT_CPUS", "32"))
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    data_bytes = sum(f.stat().st_size for f in Path(sf_dir).rglob("*.parquet") if f.is_file())
    shuffle_parts = max(8, min(4 * int(cpus), data_bytes // (2 << 20)))
    spark = get_spark(
        app_name="profile_bench",
        shuffle_partitions=int(shuffle_parts),
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    port = int(spark.sparkContext.uiWebUrl.rsplit(":", 1)[1])
    app_id = spark.sparkContext.applicationId

    # codegen warmup
    for name in queries:
        REGISTRY[name].build(spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()

    report = {}
    for name in queries:
        sc = spark.sparkContext
        sc.setJobGroup(name, name)
        df = REGISTRY[name].build(spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        sc.setJobGroup("", "")
        jobs = [j for j in api(port, f"applications/{app_id}/jobs") if j.get("jobGroup") == name]
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        stages = []
        for sid in stage_ids:
            try:
                for att in api(port, f"applications/{app_id}/stages/{sid}"):
                    stages.append(
                        {
                            "stage": sid,
                            "name": att["name"].split("\n")[0][:80],
                            "tasks": att["numCompleteTasks"],
                            "exec_run_ms": att["executorRunTime"],
                            "cpu_ms": att.get("executorCpuTime", 0) // 1_000_000,
                            "input_mb": round(att["inputBytes"] / 1e6, 2),
                            "sh_read_mb": round(att["shuffleReadBytes"] / 1e6, 2),
                            "sh_write_mb": round(att["shuffleWriteBytes"] / 1e6, 2),
                            "submit": att.get("submissionTime"),
                            "complete": att.get("completionTime"),
                        }
                    )
            except Exception:
                continue
        stages.sort(key=lambda s: -s["exec_run_ms"])
        report[name] = {"wall_sec": round(wall, 3), "stages": stages}
        print(f"\n=== {name}: {wall:.3f}s, {len(stages)} stages ===")
        for s in stages[:12]:
            print(
                f"  run={s['exec_run_ms']:>6}ms cpu={s['cpu_ms']:>6}ms tasks={s['tasks']:>3} "
                f"in={s['input_mb']:>7}MB shR={s['sh_read_mb']:>7}MB shW={s['sh_write_mb']:>7}MB  {s['name']}"
            )
    if out_file:
        Path(out_file).write_text(json.dumps(report, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
