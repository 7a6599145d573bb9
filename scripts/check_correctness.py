#!/usr/bin/env python
"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every ``queries()`` entry from ``__spark_entry__`` at sf0.01 and
compares against ``oracle_sql()`` in DuckDB: row count, sorted column
names, and order-insensitive exact value equality (the driver hashes
values, so we compare exactly — no tolerance).

Usage: python scripts/check_correctness.py [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys
from datetime import date, datetime
from decimal import Decimal

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_CHECK_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def normalize_result(col_names, rows):
    order = sorted(range(len(col_names)), key=lambda i: col_names[i])
    cols = [col_names[i] for i in order]
    data = sorted(
        (tuple(norm(r[i]) for i in order) for r in rows),
        key=lambda t: tuple((x is None, str(x)) for x in t),
    )
    return cols, data


def main():
    import duckdb

    import __spark_entry__ as entrymod
    from storm_data_etl_service_spark.session import get_spark

    only = set(sys.argv[1:])
    if os.environ.get("SPARK_GRAFT_ADVERSARIAL"):
        # simulate the grading driver's own session: plain defaults,
        # non-UTC timezone — builders must pin what they depend on
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("check_adversarial")
            .config("spark.sql.session.timeZone", "America/New_York")
            .config("spark.ui.enabled", "false")
            .config("spark.ui.showConsoleProgress", "false")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("WARN")
    else:
        spark = get_spark(
            app_name="check_correctness",
            extra_conf={"spark.ui.showConsoleProgress": "false"},
        )
    con = duckdb.connect()
    # keep oracle spill out of the repo (heavy recursive oracles can
    # write tens of GB of temp before finishing or being killed)
    con.execute("SET temp_directory='/tmp/duckdb_oracle_spill'")
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        # directory-layout tables (Spark writes a dir) need a glob
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        sdf = fn(spark, SF_DIR)
        srows = sdf.collect()
        scols, sdata = normalize_result(sdf.columns, [tuple(r) for r in srows])
        if name not in oracles:
            print(f"  {name:32s} rows-only: {len(srows)} rows")
            continue
        ddf = con.execute(oracles[name])
        dcols_raw = [d[0] for d in ddf.description]
        drows = ddf.fetchall()
        dcols, ddata = normalize_result(dcols_raw, drows)
        status = []
        if scols != dcols:
            status.append(f"COLS spark={scols} duck={dcols}")
        if len(sdata) != len(ddata):
            status.append(f"ROWCOUNT spark={len(sdata)} duck={len(ddata)}")
        elif sdata != ddata:
            ndiff = sum(1 for a, b in zip(sdata, ddata) if a != b)
            for a, b in zip(sdata, ddata):
                if a != b:
                    status.append(f"VALUES {ndiff}/{len(sdata)} differ; first: {a} != {b}")
                    break
        if status:
            failures.append(name)
            print(f"FAIL {name}: " + " | ".join(status))
        else:
            print(f"  ok {name:32s} ({len(sdata)} rows)")
    spark.stop()
    if failures:
        print(f"\n{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print("\nall queries match the oracle")


if __name__ == "__main__":
    main()
