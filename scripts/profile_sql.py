#!/usr/bin/env python
"""Operator-level profiler: runs a query through the noop sink with the
UI enabled and dumps the SQL execution graph's per-node metrics
(the SQL-tab view, guide §7.1) — the direct map from wall time to plan
operator.

Usage: python scripts/profile_sql.py <query> [<query> ...]
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def api(port: int, path: str):
    with urllib.request.urlopen(f"http://localhost:{port}/api/v1/{path}") as r:
        return json.load(r)


def main():
    from storm_data_etl_service_spark.operators.registry import REGISTRY
    from storm_data_etl_service_spark.session import get_spark

    queries = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_SCAN_PARTITIONS", os.environ.get("SPARK_GRAFT_CPUS", "32"))
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    data_bytes = sum(f.stat().st_size for f in Path(sf_dir).rglob("*.parquet") if f.is_file())
    shuffle_parts = max(8, min(4 * int(cpus), data_bytes // (2 << 20)))
    spark = get_spark(
        app_name="profile_sql",
        shuffle_partitions=int(shuffle_parts),
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    port = int(spark.sparkContext.uiWebUrl.rsplit(":", 1)[1])
    app_id = spark.sparkContext.applicationId

    for name in queries:
        REGISTRY[name].build(spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()

    for name in queries:
        df = REGISTRY[name].build(spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        execs = api(port, f"applications/{app_id}/sql?length=1000&details=true&planDescription=false")
        ex = max(execs, key=lambda e: e["id"])
        print(f"\n===== {name}: wall {wall:.3f}s (exec id {ex['id']}, {ex['duration']}ms) =====")
        nodes = ex.get("nodes", [])
        rows = []
        for n in nodes:
            mets = {m["name"]: m["value"] for m in n.get("metrics", [])}
            interesting = {}
            for k, v in mets.items():
                if any(
                    s in k
                    for s in (
                        "time total",
                        "time in",
                        "sort time",
                        "build time",
                        "collect time",
                        "scan time",
                        "task total time",
                        "shuffle bytes written",
                        "records read",
                        "number of output rows",
                        "data size",
                    )
                ):
                    interesting[k] = v
            rows.append((n["nodeId"], n["nodeName"], interesting))
        for nid, nname, mets in rows:
            parts = []
            for k in (
                "time in aggregation build total (min, med, max (stageId: taskId))",
            ):
                pass
            compact = ", ".join(f"{k}={v}" for k, v in mets.items())
            print(f"  [{nid:>3}] {nname}: {compact}")
    spark.stop()


if __name__ == "__main__":
    main()
