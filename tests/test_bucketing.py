"""Bucketed co-located join: pre-bucketing both fact tables on the
join key removes the per-query shuffle entirely — the 100 TB answer
for repeatedly-joined fact tables (SURVEY "partitioning & shuffle"
posture).  The test proves the physical claim: the bucketed join plan
contains NO Exchange, and results equal the unbucketed join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from storm_data_etl_service_spark.schemas import load_tables

N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    spark.sql("DROP TABLE IF EXISTS orders_bkt")
    spark.sql("DROP TABLE IF EXISTS lineitem_bkt")
    (
        t["orders"]
        .write.bucketBy(N_BUCKETS, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("orders_bkt")
    )
    (
        t["lineitem"]
        .write.bucketBy(N_BUCKETS, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("lineitem_bkt")
    )
    yield
    spark.sql("DROP TABLE IF EXISTS orders_bkt")
    spark.sql("DROP TABLE IF EXISTS lineitem_bkt")


def test_bucketed_join_has_no_exchange(spark, sf_dir, bucketed_tables):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("orders_bkt").join(
            spark.table("lineitem_bkt"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:2000]

        # same join over the raw parquet DOES shuffle — the bucketing
        # is what removed it
        t = load_tables(spark, sf_dir, ("orders", "lineitem"))
        raw = t["orders"].join(
            t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey")
        )
        raw_plan = raw._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in raw_plan

        # and the results are identical
        assert joined.count() == raw.count()
        a = joined.agg(F.sum("l_extendedprice").cast("decimal(25,2)")).first()[0]
        b = raw.agg(F.sum("l_extendedprice").cast("decimal(25,2)")).first()[0]
        assert a == b
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucket_pruning_on_key_equality(spark, sf_dir, bucketed_tables):
    """An equality predicate on the bucket key must prune to ONE of
    the 8 buckets at scan time (SelectedBucketsCount in the scan
    node) — the read-side payoff of bucketing beyond join
    co-location."""
    # the auto-bucketed-scan heuristic turns bucketed reading off for
    # filter-only queries (no shuffle to avoid); pin it on so the
    # pruning path is exercised
    key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        df = spark.table("orders_bkt").filter(F.col("o_orderkey") == 42)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SelectedBucketsCount: 1 out of 8" in plan, plan[:1500]
        assert df.count() == 1
    finally:
        spark.conf.set(key, prev)


def test_analyze_table_stats_feed_cbo(spark, sf_dir):
    """Warehouse-ops surface: saveAsTable + ANALYZE ... COMPUTE
    STATISTICS makes rowCount/sizeInBytes available to the cost-based
    optimizer — at 100 TB these catalog stats are what lets the
    planner pick broadcast sides and join orders BEFORE runtime
    (AQE then corrects at shuffle boundaries)."""
    spark.sql("DROP TABLE IF EXISTS cbo_nation")
    spark.read.parquet(f"{sf_dir}/nation.parquet").write.saveAsTable("cbo_nation")
    try:
        spark.sql(
            "ANALYZE TABLE cbo_nation COMPUTE STATISTICS FOR COLUMNS n_nationkey"
        )
        det = spark.sql("DESCRIBE TABLE EXTENDED cbo_nation").collect()
        stats = [r for r in det if r["col_name"] == "Statistics"]
        assert stats and "rows" in stats[0]["data_type"], det
        coldet = spark.sql(
            "DESCRIBE TABLE EXTENDED cbo_nation n_nationkey"
        ).collect()
        info = {r["info_name"]: r["info_value"] for r in coldet}
        assert int(info["distinct_count"]) > 0
        assert info["max"] is not None
    finally:
        spark.sql("DROP TABLE IF EXISTS cbo_nation")
