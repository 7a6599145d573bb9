"""Physical-plan audits: assert the plans Catalyst produces are the
plans a 100 TB cluster needs — broadcasts on dimension joins, filter
pushdown into the parquet scan, column pruning, top-k without a full
sort, and a UDF-free enrichment path."""

from __future__ import annotations

import pytest

from storm_data_etl_service_spark.operators.registry import REGISTRY


def plan_of(name, spark, sf_dir) -> str:
    df = REGISTRY[name].build(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_dimension_joins_broadcast(spark, sf_dir):
    for q in ["q14_join_compare", "tpch_q5_regional_revenue", "tpch_q3_top_revenue_orders"]:
        plan = plan_of(q, spark, sf_dir)
        assert "BroadcastHashJoin" in plan, f"{q} lost its broadcast:\n{plan[:2000]}"


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = plan_of("q3_filter_eq_count", spark, sf_dir)
    assert "PushedFilters" in plan
    assert "l_returnflag" in plan.split("PushedFilters")[1][:200], (
        "l_returnflag filter not pushed to parquet:\n" + plan[:2000]
    )


def test_column_pruning(spark, sf_dir):
    plan = plan_of("tpch_q1_pricing_summary", spark, sf_dir)
    scan = plan[plan.index("ReadSchema") :][:400]
    assert "l_extendedprice" in scan
    # unused columns must not be read
    assert "l_partkey" not in scan and "l_suppkey" not in scan, scan


def test_topn_uses_take_ordered(spark, sf_dir):
    plan = plan_of("q9_topn", spark, sf_dir)
    assert "TakeOrderedAndProject" in plan, plan[:1500]


def test_enrichment_has_no_python_eval(spark, sf_dir):
    plan = plan_of("enrich_events", spark, sf_dir)
    assert "EvalPython" not in plan
    # '*(n)' prefixes mark whole-stage-codegen'd operators
    assert "WholeStageCodegen" in plan or "*(" in plan, plan[:1200]


#: The ONLY queries allowed to leave the JVM: opaque-media kernels
#: (no expression can decode bytes), the Misra-Gries candidate sketch
#: (genuinely imperative per-partition state), and the deliberate
#: Python-API demonstrations, each of whose docstrings steers hot
#: paths to the expression equivalent.
INTENTIONAL_PYTHON_OPS = [
    "multimodal_decode_stats",
    "image_resize_stats",
    "video_frame_sample",
    "heavy_hitter_bigrams",
    "token_spans_udtf",
    "user_resequence_pandas",
    # SemDeDup's blocked within-cell pair kernel (_cell_pairs_kernel):
    # vectorized across pairs, per-scalar fold order bit-identical to
    # the Column/DuckDB twin; avoids materializing pair rows with both
    # vectors in the cid shuffle.  Present in every consumer of
    # semdedup_pairs.
    "semdedup",
    "semdedup_pairs",
    "semdedup_auto",
    "crossmodal_dedup_agreement",
    "dedup_ladder_report",
    # kNN graph's per-bucket top-k kernel (_bucket_topk_kernel): the
    # same blocked, fold-order-exact vectorization contract as
    # _cell_pairs_kernel, keyed on the LSH bucket instead of the
    # k-means cell.
    "knn_graph_lsh",
    # Same kernel (k=1) keyed on LSH bucket for eval-vs-train nearest
    # search; the Arrow boundary is shared with knn_graph_lsh.
    "eval_semantic_contamination",
    # Matryoshka audit's per-bucket prefix-cosine kernel
    # (_matryoshka_bucket_kernel): snapshots of one incremental dim
    # loop, fold-order bit-identical to the Column twin; pair rows and
    # the ×4 width crossJoin never materialize.
    "matryoshka_truncation_audit",
]


def test_only_intentional_ops_use_python(spark, sf_dir):
    python_ops = []
    for name in REGISTRY:
        plan = plan_of(name, spark, sf_dir)
        if (
            "EvalPython" in plan
            or "MapInPandas" in plan
            or "FlatMapGroupsInPandas" in plan
        ):
            python_ops.append(name)
    assert sorted(python_ops) == sorted(INTENTIONAL_PYTHON_OPS), python_ops


def test_exact_dedup_has_partial_aggregation(spark, sf_dir):
    """Hash-groupBy dedup must partial-aggregate map-side (the whole
    point of groupBy-over-window for exact dedup at scale)."""
    plan = plan_of("dedup_exact", spark, sf_dir)
    assert plan.count("HashAggregate") >= 2, plan[:1500]


def test_semi_and_anti_joins_stay_semi(spark, sf_dir):
    """EXISTS / NOT EXISTS re-expressions must compile to semi/anti
    hash joins (no row expansion), and the Q22 anti join against
    filtered orders should broadcast the date-filtered build side."""
    # q4's EXISTS is decorrelated one step further than a semi join:
    # max(l_shipdate) per order (map-side-combined pre-agg, scan-pushed
    # l_shipdate bound) joined 1:1 — no 33 MB fact broadcast, no row
    # expansion (the agg key is unique).
    plan = plan_of("tpch_q4_priority_semijoin", spark, sf_dir)
    assert "max(l_shipdate" in plan, plan[:1500]
    assert "1996-01-01" in plan.split("Scan parquet")[1][:900], plan[:1500]
    plan = plan_of("tpch_q22_idle_customers", spark, sf_dir)
    assert "LeftAnti" in plan, plan[:1500]


def test_q17_threshold_is_single_pass_window(spark, sf_dir):
    """The decorrelated per-part threshold must come from ONE window
    pass over one scan — a join-back would scan lineitem twice, and
    at 100 TB the threshold table (partkey cardinality) can't
    broadcast, forcing a second fact shuffle."""
    plan = plan_of("tpch_q17_small_quantity_revenue", spark, sf_dir)
    assert "Window" in plan, plan[:1500]
    assert plan.count("Scan parquet") == 1, plan[:1500]


def test_q19_extracts_equi_key(spark, sf_dir):
    """The disjunctive predicate must not force a cartesian product:
    Catalyst extracts the common l_partkey = p_partkey equi-key."""
    plan = plan_of("tpch_q19_disjunctive_filter", spark, sf_dir)
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan, plan[:1500]
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_q21_decorrelates_to_single_fact_shuffle(spark, sf_dir):
    """The EXISTS/NOT-EXISTS self-join is decorrelated into three
    stacked windows sharing ONE l_orderkey exchange; lineitem is
    scanned once and both order/supplier joins broadcast — no
    semi/anti fact self-joins anywhere in the plan."""
    plan = plan_of("tpch_q21_waiting_suppliers", spark, sf_dir)
    assert "LeftSemi" not in plan and "LeftAnti" not in plan, plan[:2000]
    assert plan.count("Window") == 3, plan[:2000]
    assert plan.count("Exchange hashpartitioning(l_orderkey") == 1, plan[:2000]
    assert plan.count("Scan parquet") <= 3  # lineitem once + two dims


def test_q8_dimension_chain_broadcasts(spark, sf_dir):
    # part, supplier→nation, customer→nation→region must all broadcast;
    # the only shuffle joins are fact-fact.
    plan = plan_of("tpch_q8_market_share", spark, sf_dir)
    assert plan.count("BroadcastHashJoin") >= 3, plan[:2500]


def test_q13_outer_join_keeps_zero_order_customers(spark, sf_dir):
    df = REGISTRY["tpch_q13_customer_distribution"].build(spark, sf_dir)
    rows = {r["c_count"]: r["custdist"] for r in df.collect()}
    n_cust = spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    assert sum(rows.values()) == n_cust  # every customer lands in exactly one bucket


def test_join_skew_report_distributed_topk(spark, sf_dir):
    """Top-k over per-key counts must be TakeOrderedAndProject, not a
    global-window funnel through one partition."""
    plan = plan_of("join_skew_report", spark, sf_dir)
    assert "TakeOrderedAndProject" in plan, plan[:1500]


def test_join_hints_override_strategy(spark, sf_dir):
    """The engine exposes Spark's join-strategy hints: the same
    logical join compiles to SortMergeJoin, ShuffledHashJoin, or
    BroadcastHashJoin depending on the hint — the manual override
    for when a 100 TB planner knows better than the statistics."""
    from pyspark.sql import functions as F

    from storm_data_etl_service_spark.schemas import load_tables

    t = load_tables(spark, sf_dir)
    o = t["orders"].select("o_orderkey", "o_custkey")
    li = t["lineitem"].select("l_orderkey")

    def physical(hint):
        joined = li.join(o.hint(hint), li.l_orderkey == o.o_orderkey)
        return joined._jdf.queryExecution().executedPlan().toString()

    assert "SortMergeJoin" in physical("merge")
    assert "ShuffledHashJoin" in physical("shuffle_hash")
    assert "BroadcastHashJoin" in physical("broadcast")


def test_new_window_ops_single_exchange(spark, sf_dir):
    """linear_interpolate's forward and backward lookups are TWO
    running [unboundedPreceding, currentRow] Windows (forward and
    reverse sort) sharing ONE Exchange — never an unbounded-FOLLOWING
    frame, which Spark re-evaluates from scratch per row (O(rows²) per
    partition; measured 5.3 s of window CPU on the sf0.1 events
    table vs 0.2 s for the reversed running form).
    mad_outlier_stats' MAD window reuses the median window's
    partitioning (one Exchange before the final agg)."""
    plan = plan_of("linear_interpolate", spark, sf_dir)
    assert plan.count("Exchange") == 1, plan[:2000]
    assert plan.count("Window") == 2, plan[:2000]
    assert "unboundedfollowing" not in plan.lower(), plan[:2000]

    plan = plan_of("mad_outlier_stats", spark, sf_dir)
    # one exchange for the windows + the tiny final-aggregate exchange
    assert plan.count("Exchange hashpartitioning(event_type") <= 2, plan[:2000]


def test_zorder_interleave_stays_in_codegen(spark, sf_dir):
    """The 32-term Morton interleave must compile into whole-stage
    codegen (no Python, no interpreted projection fallback).  AQE
    hides codegen spans until execution, so materialize first and
    audit the final adaptive plan."""
    df = REGISTRY["zorder_cluster"].build(spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    # '*(n)' operator prefixes mark whole-stage-codegen stages
    import re

    assert re.search(r"\*\(\d+\) (HashAggregate|Project)", plan), plan[:1500]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_grouped_top1_aggregates_without_window(spark, sf_dir):
    """The struct-max argmax must avoid the ranking window entirely
    and partial-aggregate map-side: partial_max runs BELOW the
    priority exchange, so the shuffle carries one candidate per
    (task, group) instead of every row value-sorted per group."""
    plan = plan_of("grouped_top1_spender", spark, sf_dir)
    assert "Window" not in plan, plan[:1500]
    # segment between the priority exchange and the (priority, custkey)
    # exchange is the map side of the final aggregate
    map_side = plan.split("Exchange hashpartitioning(o_orderpriority")[1]
    assert "partial_max" in map_side, plan[:2000]


def test_aqe_converts_shuffle_join_to_broadcast_at_runtime(spark, sf_dir):
    """AQE runtime re-planning, proved: a build side whose size is
    statically unknowable (hash-suffix filter — no stats survive it)
    but tiny at runtime must come back as a BroadcastHashJoin in the
    final adaptive plan.  This is the mechanism the engine leans on at
    100 TB instead of hand-tuning every join's strategy."""
    from pyspark.sql import functions as F

    from storm_data_etl_service_spark.schemas import load_tables

    t = load_tables(spark, sf_dir)
    # selective-but-opaque predicate: ~1/16 of orders, unknown statically
    small = t["orders"].filter(
        F.substring(F.sha2(F.col("o_orderkey").cast("string"), 256), 1, 1) == "a"
    ).select("o_orderkey", "o_orderpriority")
    joined = t["lineitem"].join(small, F.col("l_orderkey") == F.col("o_orderkey"))
    joined.collect()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "BroadcastHashJoin" in plan, plan[:2500]
    assert "AQEShuffleRead" in plan or "BroadcastQueryStage" in plan, plan[:2500]


def test_dynamic_partition_pruning_on_file_source(spark, sf_dir):
    """Joining a day-partitioned fact to a selectively-filtered dim
    must plan a DPP subquery: the fact scan's PartitionFilters gain a
    dynamicpruningexpression, so only the dim's surviving days are
    read — at 100 TB this is the difference between scanning a year
    and scanning a month.  (Heuristic gotcha encoded here: the dim
    predicate must be `isLikelySelective` — a literal comparison;
    a bare boolean column does NOT trigger insertion.)"""
    import shutil
    import tempfile
    from pathlib import Path

    from pyspark.sql import functions as F

    wd = Path(tempfile.mkdtemp(prefix="dpp_"))
    try:
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        ev.withColumn("day", F.date_format("ts", "yyyy-MM-dd")).write.partitionBy(
            "day"
        ).mode("overwrite").parquet(str(wd / "ev"))
        spark.read.parquet(str(wd / "ev")).select("day").distinct().withColumn(
            "month", F.month("day")
        ).write.mode("overwrite").parquet(str(wd / "dim"))

        fact = spark.read.parquet(str(wd / "ev"))
        dim = spark.read.parquet(str(wd / "dim")).filter(F.col("month") == 6)
        j = fact.join(dim, "day").groupBy("event_type").count()

        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "dynamicpruningexpression" in plan.lower(), plan[:2000]

        # and the pruned result is still correct
        expect = (
            fact.filter(F.month("day") == 6).groupBy("event_type").count()
        )
        got = {(r["event_type"], r["count"]) for r in j.collect()}
        assert got == {(r["event_type"], r["count"]) for r in expect.collect()}
    finally:
        shutil.rmtree(wd, ignore_errors=True)


def test_new_ops_plan_shapes(spark, sf_dir):
    """Scale-property lock-in for the newer operators: broadcasts
    where dims are small, no cartesian products anywhere, and the
    MG recount gated by a broadcast semi-join."""
    plan = plan_of("geo_neighbor_search", spark, sf_dir)
    assert "BroadcastHashJoin" in plan, plan[:1500]
    assert "CartesianProduct" not in plan

    plan = plan_of("dedup_incremental_minhash", spark, sf_dir)
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan

    plan = plan_of("heavy_hitter_bigrams", spark, sf_dir)
    assert "LeftSemi" in plan, plan[:2000]  # broadcast-gated recount
    assert "BroadcastExchange" in plan

    plan = plan_of("label_top_terms", spark, sf_dir)
    assert plan.count("BroadcastHashJoin") >= 2, plan[:2000]

    plan = plan_of("cep_click_error_pattern", spark, sf_dir)
    # the two range frames stage separate Window nodes (different CASE
    # inputs) but share ONE exchange + sort — the scale property
    assert plan.count("Exchange hashpartitioning(user_id") == 1, plan[:2000]
    assert plan.count("Sort [user_id") == 1, plan[:2000]


def test_aqe_skew_join_splits_hot_partition(spark):
    """AQE skew mitigation, proved end-to-end: a join whose fact side
    is deliberately skewed (~95% of rows share one key) must come back
    with the hot shuffle partition SPLIT in the final adaptive plan
    (``skew=true`` on the join node), and the split must not change
    results.  Thresholds are lowered to make sf0.01 data look like a
    100 TB hot key; at production scale the defaults (256 MB partition,
    factor 5) fire on real skew.  This is the runtime half of the
    engine's skew posture — the compile-time half is salting
    (salted_skew_join / salted_group_sum, oracle-checked).

    Two gotchas this test encodes (both bit at sf scale and WILL bite
    a real cluster): (1) OptimizeSkewedJoin splits a hot reducer
    partition along MAPPER block boundaries, so a single-task map side
    (one small parquet file here; one giant unsplittable file at
    prod) is unsplittable — hence the repartition(16) producing a
    multi-mapper map side.  (2) The rule pattern-matches
    SMJ(Sort(ShuffleStage), Sort(ShuffleStage)): an aggregation
    between the shuffle and the join (e.g. a groupBy-derived dim)
    breaks the match, so the dim side here is a plain scan + union."""
    from pyspark.sql import functions as F

    sf_dir = "/root/testdata/sf0.01"  # big enough for KB-scale blocks
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.5",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "4KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "2KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").repartition(16)
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        # ~19/20 of fact rows land on key 0; dim has one row per key
        # (o_orderkey 0 excluded — it would collide with the hot key)
        fact = li.select(
            F.when(F.col("l_orderkey") % 20 != 0, F.lit(0))
            .otherwise(F.col("l_orderkey"))
            .cast("long")
            .alias("k"),
            "l_extendedprice",
        )
        dim = (
            orders.filter(
                (F.col("o_orderkey") % 20 == 0) & (F.col("o_orderkey") != 0)
            )
            .select(F.col("o_orderkey").cast("long").alias("k"), "o_orderpriority")
            .union(
                spark.createDataFrame(
                    [(0, "HOT")], "k long, o_orderpriority string"
                )
            )
        )
        joined = fact.join(dim, "k")
        agg = joined.agg(
            F.count("*").alias("n"),
            F.sum("l_extendedprice").cast("decimal(25,2)").alias("s"),
        )
        total = agg.collect()[0]

        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:3000]

        # the split join is a pure re-plan: row count and sum unchanged
        base = li.agg(
            F.count("*").alias("n"),
            F.sum("l_extendedprice").cast("decimal(25,2)").alias("s"),
        ).collect()[0]
        assert (total["n"], total["s"]) == (base["n"], base["s"])
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_salting_bounds_reducer_load(spark, sf_dir):
    """The compile-time skew artifact: on the maximally-skewed
    events.event_type key (5 values), the hottest reducer's share
    under the salted shuffle key (event_type, salt) must be a small
    fraction of the hottest share under the naive key — the
    load-balance guarantee salted_group_sum/salted_skew_join rely on.
    Result equality is covered by their oracles and
    test_salted_join_equals_plain_join; this pins the mechanism."""
    from pyspark.sql import functions as F

    n_salts = 8
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    naive = ev.groupBy("event_type").count()
    naive_max = max(r["count"] for r in naive.collect())
    salted = ev.groupBy(
        "event_type", (F.col("event_id") % n_salts).cast("int").alias("salt")
    ).count()
    salted_max = max(r["count"] for r in salted.collect())
    # deterministic event_id % 8 salt spreads each hot key near-evenly;
    # require at least a 4x hottest-cell reduction (exact 8x only in
    # the large-count limit — sf0.001's hot key holds ~200 rows)
    assert salted_max * (n_salts // 2) <= naive_max, (salted_max, naive_max)


def test_runtime_bloom_filter_reduces_fact_scan(spark):
    """Runtime semi-join reduction, proved: when a selective dim join
    cannot broadcast (threshold off), Spark injects a bloom filter
    built from the dim's join keys into the fact side — at 100 TB this
    prunes most fact rows BEFORE the shuffle instead of shipping them
    to a join that drops them.  Asserts might_contain lands on the
    fact side of the final plan and that filtering changed no results.
    (Thresholds lowered because the fact side is MB-scale here; the
    defaults — 10 MB creation side, 10 GB application side — are
    sized for exactly the 100 TB case.)"""
    from pyspark.sql import functions as F

    sf_dir = "/root/testdata/sf0.01"
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        sel = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
            "o_orderkey"
        )
        j = li.join(sel, li.l_orderkey == sel.o_orderkey).agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(25,2)")).alias("q"),
        )
        got = j.collect()[0]
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, plan[:2500]

        # reduction is transparent: same result as the broadcast plan
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
        want = j.collect()[0]
        assert (got["n"], got["q"]) == (want["n"], want["q"])
    finally:
        for k, v in confs.items():
            spark.conf.unset(k) if old[k] is None else spark.conf.set(k, old[k])


def test_global_rankings_are_distributed(spark, sf_dir):
    """Entity-cardinality global rankings (customer deciles, the
    Pareto curve, corpus growth deciles) must rank via the
    range-partitioned global row number, never an unpartitioned
    ntile/rank window that funnels the whole table into one
    partition.  The only SinglePartition exchange allowed is the
    per-partition OFFSETS window, whose input is n_parts rows
    (cluster-sized), recognizable by its _pid grouping.

    The ranking stage itself is materialized via localCheckpoint (so
    both its consumers see ONE physical partitioning — see the
    global_row_number docstring), which hides the range exchange from
    the final executed plan; its shape is asserted on the
    pre-checkpoint stage instead."""
    import pyspark.sql.functions as F

    from storm_data_etl_service_spark.operators.analytics import (
        _local_range_numbered,
    )

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    stage = _local_range_numbered(
        cust, [F.desc("c_acctbal"), F.asc("c_custkey")], 32
    )
    stage_plan = stage._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in stage_plan, stage_plan[:1500]
    assert "Exchange SinglePartition" not in stage_plan, stage_plan[:1500]

    for q in ["balance_deciles", "revenue_pareto_curve", "vocab_growth_curve"]:
        plan = plan_of(q, spark, sf_dir)
        assert "ntile" not in plan, f"{q} still uses a window ntile:\n{plan[:1500]}"
        # every SinglePartition exchange must sit under either the
        # _pid offsets computation (n_parts rows) or a keyless global
        # aggregate (1 row per upstream partition), never data-sized
        # input
        for seg in plan.split("Exchange SinglePartition")[1:]:
            head = seg[:600]
            assert (
                "_pid" in head
                or "HashAggregate(keys=[]" in head
                # the 10-row decile rollup feeding a cumulative window
                or "HashAggregate(keys=[decile" in head
            ), f"{q} has a data-sized single-partition exchange:\n{seg[:800]}"


def test_dedup_family_reuses_staging_exchange(spark, sf_dir):
    """The shingle/signature staging relations deliberately end in an
    exchange (``_ranked_shingles``'s groupBy; the explicit
    ``repartition(band, key)`` before the LSH self-join): every
    re-reference of the staging relation must then compile to a
    ReusedExchange — ONE evaluation of the tokenize/shingle/signature
    map work per query, however many consumers the plan has.  AQE only
    marks reuse when it materializes stages, so execute first and
    inspect the finalized adaptive plan."""
    import re

    exchange_rx = re.compile(
        r"Exchange (?:hash|range|Single)[^\n]*\[plan_id=(\d+)\]"
    )

    def _exchange_pids(plan):
        """(computed plan_ids, reused-reference plan_ids), shuffle
        kind only.  A ReusedExchange header line embeds the ORIGINAL
        exchange's description AND its plan_id, so classification must
        be by line, not by regex position."""
        computed, reused = [], []
        for ln in plan.splitlines():
            m = exchange_rx.search(ln)
            if not m:
                continue
            (reused if "ReusedExchange" in ln else computed).append(m.group(1))
        return computed, reused

    # Invariant per query: at least one ReusedExchange exists.  The
    # old hard floors (3 / 8) encoded a specific AQE stage-reuse count
    # and would flake on a Spark/AQE config change rather than signal
    # a regression; the load-bearing property is structural — asserted
    # below via plan_ids: a ReusedExchange header repeats the original
    # exchange's [plan_id=N], so "shared staging computed once" means
    # every reused plan_id maps to EXACTLY ONE computed exchange, and
    # "the ranked-shingles exchange is shared across consumers" means
    # SOME computed exchange carries >= 2 reuse references.
    # The `_ranked_shingles` relation is now a lazy localCheckpoint
    # (the ccnet/dsir staging pattern): its multi-consumer queries must
    # read the checkpointed RDD on every side and contain ZERO
    # instances of the tokenize pipeline above it (a `split(` in the
    # final plan would betray a recompute).  The non-checkpointed
    # signature staging (explicit repartition(band, key)) must still
    # compile its second consumer to a ReusedExchange.
    for q, staging in [
        ("dedup_minhash_lsh", "reuse"),          # self-join's second side
        ("dedup_jaccard_prefix_join", "ckpt"),   # ranked ckpt: prefix ×2 + ha + hb
        ("dedup_containment", "ckpt"),           # ranked ckpt: sub + super + ha + hb
        ("dedup_incremental_minhash", "reuse"),  # batch probe side
        ("dedup_ladder_report", "ckpt+reuse"),   # ranked ckpt + rung-3 band reuse
    ]:
        df = REGISTRY[q].build(spark, sf_dir)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("isFinalPlan=true") >= 1, plan[:500]
        plan = plan.split("== Initial Plan ==")[0]
        if "ckpt" in staging:
            assert plan.count("Scan ExistingRDD") >= 2, (
                f"{q}: ranked-shingles checkpoint not shared across "
                f"consumers:\n{plan[:3000]}"
            )
            assert "split(" not in plan, (
                f"{q}: tokenize pipeline recomputed above the "
                f"ranked-shingles checkpoint:\n{plan[:3000]}"
            )
        if "reuse" in staging:
            assert plan.count("ReusedExchange") >= 1, (
                f"{q} lost its staging-exchange reuse:\n{plan[:3000]}"
            )
        computed, reused = _exchange_pids(plan)
        for pid in set(reused):
            n = computed.count(pid)
            assert n == 1, (
                f"{q}: reused exchange plan_id={pid} computed {n} times "
                f"(shared staging must materialize once):\n{plan[:3000]}"
            )


def test_ccnet_surprisal_model_computed_once(spark, sf_dir):
    """The CCNet bucket assignment consumes its doc-level surprisal
    scores TWICE (histogram side + probe side).  A staging exchange
    can't be shared here — column pruning projects each consumer's
    column set below the exchange, so the plan instances differ —
    hence the scored frame is materialized via lazy localCheckpoint
    (the global_row_number pattern).  After execution, the finalized
    plan must read the checkpointed RDD on both sides and contain
    ZERO instances of the bigram-model pipeline (its tokenizing
    split() would otherwise appear — recomputing the dominant
    (doc, w1, w2) aggregation twice)."""
    df = REGISTRY["ccnet_perplexity_buckets"].build(spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") >= 2, plan[:1500]
    assert "split(" not in plan, plan[:1500]


def test_dsir_doc_bucket_table_computed_once(spark, sf_dir):
    """DSIR's (doc, bucket) count table feeds THREE consumers (raw
    model, target model, probe); like the CCNet scored frame, column
    pruning below an exchange would make the plan instances differ
    and recompute the bigram explode+agg per consumer — hence the
    lazy localCheckpoint.  The finalized plan must read the
    checkpointed RDD on every side and contain ZERO instances of the
    tokenizing pipeline (its split() would betray a recompute)."""
    df = REGISTRY["dsir_importance_weights"].build(spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") >= 3, plan[:1500]
    assert "split(" not in plan, plan[:1500]


def test_topk_windows_are_limit_bounded(spark, sf_dir):
    """The three single-partition ranking windows the bench tail warns
    about (zipf_slope_fit, bpe_first_merges, join_skew_report) must
    take their input from a TakeOrderedAndProject limit — K rows at
    any corpus size — never from the unbounded vocabulary/pair/key
    table.  In the plan string the Window node must sit ABOVE the
    TakeOrdered (parents print before children), proving the window
    consumes the limit output, not the other way round."""
    for q in ["zipf_slope_fit", "bpe_first_merges", "join_skew_report"]:
        plan = plan_of(q, spark, sf_dir)
        w = plan.find("Window")
        tk = plan.find("TakeOrderedAndProject")
        assert w != -1 and tk != -1, f"{q}: missing node:\n{plan[:1500]}"
        assert w < tk, (
            f"{q}: Window is not fed by the TakeOrdered limit:\n{plan[:1500]}"
        )
