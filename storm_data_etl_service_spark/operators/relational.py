"""Relational query operators Q1-Q17.

The reference's analytical query surface — everything its fixture
generator and cross-repo validator compute over the enriched data
(reference cmd/genmock/main.go:204-354, cmd/validate/main.go:111-538)
— re-expressed as DataFrame builders over the synthetic star schema
(FIXTURES.md §3 fixes the canonical mapping).

Scale notes are attached per operator: these run against Catalyst/AQE
so grouped counts get map-side partial aggregation, small dimensions
broadcast, and skewed shuffles re-split at runtime.  Determinism
notes: every ordered/limited query carries an explicit total-order
tiebreak (the reference relies on file order, which does not exist on
a cluster — SURVEY.md §7 hard part 3), and floating sums go through
a decimal cast so results are bit-stable under any partitioning /
addition order (a plain double sum is order-dependent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dsum(c, alias):
    """Order-insensitive double sum: cast to decimal, sum exactly,
    cast back.  Makes aggregate values reproducible across partition
    counts — required both for the DuckDB oracle hash-match and for
    run-to-run stability on a real cluster."""
    return F.sum(c.cast("decimal(25,6)")).cast("double").alias(alias)


# --- grouped counts (Q1, Q2) -------------------------------------------------

def q1_group_count(t) -> DataFrame:
    """Q1 — count by single key (reference cmd/genmock/main.go:204-226).
    Map-side combine then one shuffle on a low-cardinality key."""
    return t["orders"].groupBy("o_orderpriority").agg(F.count("*").alias("n"))


def q2_group_count_composite(t) -> DataFrame:
    """Q2 — count by composite key (reference cmd/genmock/main.go:215)."""
    return (
        t["customer"]
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count("*").alias("n"))
    )


# --- filtered counts (Q3-Q7) -------------------------------------------------

def q3_filter_eq_count(t) -> DataFrame:
    """Q3 — equality-predicate count (reference cmd/genmock/main.go:290-292).
    The filter pushes down to the parquet scan."""
    return (
        t["lineitem"].filter(F.col("l_returnflag") == "R").agg(F.count("*").alias("n"))
    )


def q4_filter_conj_count(t) -> DataFrame:
    """Q4 — conjunctive filter count (reference cmd/genmock/main.go:293-295)."""
    return (
        t["lineitem"]
        .filter(
            (F.col("l_returnflag") == "R")
            & (F.col("l_linestatus") == "F")
            & (F.col("l_discount") >= 0.05)
        )
        .agg(F.count("*").alias("n"))
    )


def q5_filter_in_count(t) -> DataFrame:
    """Q5 — IN-list filter count (reference cmd/genmock/main.go:296-298)."""
    return (
        t["orders"]
        .filter(F.col("o_orderstatus").isin("O", "F"))
        .agg(F.count("*").alias("n"))
    )


def q6_filter_threshold_count(t) -> DataFrame:
    """Q6 — threshold count (reference cmd/genmock/main.go:221-223)."""
    return t["lineitem"].filter(F.col("l_quantity") >= 30).agg(F.count("*").alias("n"))


def q7_bounding_box_count(t) -> DataFrame:
    """Q7 — 2-D box filter, the geo-bounding-box pattern
    (reference cmd/genmock/main.go:304-322)."""
    return (
        t["part"]
        .filter(
            (F.abs(F.col("p_size") - 25) <= 10)
            & (F.abs(F.col("p_retailprice") - 1500) <= 500)
        )
        .agg(F.count("*").alias("n"))
    )


# --- aggregates / ordering (Q8-Q11) -----------------------------------------

def q8_filtered_max(t) -> DataFrame:
    """Q8 — max with filter (reference cmd/genmock/main.go:346-353)."""
    return (
        t["lineitem"]
        .filter(F.col("l_returnflag") == "R")
        .agg(F.max("l_extendedprice").alias("max_price"))
    )


def q9_topn(t) -> DataFrame:
    """Q9 — top-N groups by count (reference cmd/genmock/main.go:252-281).
    Explicit key tiebreak: the reference's ranking relies on stable
    iteration order, which a cluster does not have.  Catalyst compiles
    orderBy+limit to TakeOrderedAndProject — no full sort at scale."""
    return (
        t["customer"]
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("c_nationkey"))
        .limit(5)
    )


def q9_grouped_topk(t) -> DataFrame:
    """Q9b — grouped top-k via ranking window (per-state county ranking
    in the reference, cmd/genmock/main.go:268-281).  One shuffle on the
    partition key; row_number needs a total order per group."""
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        t["customer"]
        .select("c_custkey", "c_nationkey", "c_acctbal")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
    )


def q10_first_row(t) -> DataFrame:
    """Q10 — first-match lookup with a pinned total order
    (reference cmd/genmock/main.go:325-344 relies on file order)."""
    return t["orders"].orderBy("o_orderkey").limit(1)


def q11_conditional_count(t) -> DataFrame:
    """Q11 — total + conditional non-null count
    (reference cmd/genmock/main.go:217-220, 236-243)."""
    return t["events"].agg(
        F.count("*").alias("n_total"),
        F.count(F.when(F.col("value") > 250, 1)).alias("n_high_value"),
    )


# --- dedup (Q12 / D8) --------------------------------------------------------

def q12_dup_detect(t) -> DataFrame:
    """Q12 — duplicate detection by key
    (reference cmd/validate/main.go:357-373)."""
    return (
        t["events"]
        .groupBy("user_id", "event_type")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
    )


def q12_dedup_first_wins(t) -> DataFrame:
    """D8 — deterministic first-wins dedup: rank by an explicit
    arrival-order column (event_id ≙ kafka offset) within each key
    (reference cmd/validate/main.go:357-391; SURVEY.md §7 hard part 3).
    Single shuffle on the dedup key; at scale this is the idempotent-
    replay compaction."""
    w = Window.partitionBy("user_id", "event_type").orderBy("event_id")
    return (
        t["events"]
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("event_id", "user_id", "event_type", "value")
    )


# --- joins / set ops (Q13-Q15, Q17) -----------------------------------------

def q13_anti_join(t) -> DataFrame:
    """Q13 — referential cross-check as anti-join
    (reference cmd/validate/main.go:298-313).  Catalyst picks
    sort-merge for two large sides; AQE converts to broadcast when the
    right side turns out small."""
    return t["orders"].join(
        t["lineitem"], t["orders"].o_orderkey == t["lineitem"].l_orderkey, "left_anti"
    )


def q14_join_compare(t) -> DataFrame:
    """Q14 — key-equi join for record-level comparison
    (reference cmd/validate/main.go:379-462).  Nation is a dimension —
    broadcast explicitly; no shuffle of the fact side."""
    return (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "c_name", "n_name", "c_acctbal")
    )


def q15_except_all(t) -> DataFrame:
    """Q15 — dataset parity diff as a multiset difference
    (reference cmd/validate/main.go:228-252)."""
    region = t["region"]
    return region.exceptAll(region.filter(F.col("r_regionkey") < 3))


def q16_domain_violations(t) -> DataFrame:
    """Q16a — enum-membership violation count
    (reference cmd/validate/main.go:467-538)."""
    return (
        t["orders"]
        .filter(~F.col("o_orderstatus").isin("O", "F", "P"))
        .agg(F.count("*").alias("n"))
    )


def q16_crossfield_check(t) -> DataFrame:
    """Q16b — cross-field implication violations: (value>0) must match
    props presence (reference mag>0 ⇔ severity non-null,
    cmd/validate/main.go:528-536)."""
    return (
        t["events"]
        .filter((F.col("value") > 0) != F.col("props").isNotNull())
        .agg(F.count("*").alias("n"))
    )


def q17_count_parity(t) -> DataFrame:
    """Q17 — per-group count parity across two sources
    (reference cmd/validate/main.go:268-285).  Compares even/odd user
    halves; keeps groups whose counts differ (null-safe inequality)."""
    ev = t["events"]
    a = ev.filter(F.col("user_id") % 2 == 0).groupBy("event_type").agg(
        F.count("*").alias("n_a")
    )
    b = ev.filter(F.col("user_id") % 2 == 1).groupBy("event_type").agg(
        F.count("*").alias("n_b")
    )
    return (
        a.join(b, "event_type", "full_outer")
        .filter(~F.col("n_a").eqNullSafe(F.col("n_b")))
        .select("event_type", "n_a", "n_b")
    )


# --- time bucketing (P13 generalized) ---------------------------------------

def p13_hourly_rollup(t) -> DataFrame:
    """P13 — tumbling-hour rollup (reference
    internal/domain/transform.go:309-315 generalized to an agg).
    One shuffle on the bucket; decimal-sum for bit-stable values."""
    return (
        t["events"]
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("bucket"))
        .agg(F.count("*").alias("n"), _dsum(F.col("value"), "sum_value"))
    )


# --- deterministic content IDs (P5 generalized) ------------------------------

def p5_deterministic_id(t) -> DataFrame:
    """P5 — deterministic sha256 content IDs over an arbitrary table
    (reference internal/domain/transform.go:134-142 generalized).
    Pure projection; printf-style float formatting keeps the pre-image
    engine-portable."""
    pre = F.concat_ws(
        "|",
        F.col("event_type"),
        F.col("user_id").cast("string"),
        F.format_string("%.4f", F.col("value")),
    )
    return t["events"].select(
        "event_id", F.substring(F.sha2(pre, 256), 1, 16).alias("content_id")
    )


# --- temporal joins (beyond reference) ---------------------------------------

def asof_join_last_click(t) -> DataFrame:
    """As-of join: for every purchase, the latest click by the same
    user at-or-before the purchase time.

    Spark has no ASOF JOIN operator; the idiomatic re-expression is a
    running ``last(..., ignorenulls)`` over a per-user time-ordered
    window — one shuffle on user_id, no join at all.  The DuckDB
    oracle uses its native ``ASOF JOIN``, so two completely different
    physical strategies must agree value-for-value."""
    ev = t["events"]
    click_ts = F.when(F.col("event_type") == "click", F.col("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ev.withColumn("last_click_ts", F.last(click_ts, ignorenulls=True).over(w))
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.col("ts").alias("purchase_ts"),
            "last_click_ts",
        )
    )


def range_join_pairs(t) -> DataFrame:
    """Range join: ordered pairs of same-user events within a
    5-minute window — the equi-key (user_id) carries the shuffle, the
    range predicate prunes within each key group."""
    ev = t["events"].select("event_id", "user_id", "ts")
    a, b = ev.alias("a"), ev.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.ts") > F.col("a.ts"))
            & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 5 MINUTES")),
        )
        .select(
            F.col("a.event_id").alias("id_a"),
            F.col("b.event_id").alias("id_b"),
            F.col("a.user_id").alias("user_id"),
        )
    )


# --- headline join/agg queries (bench anchors) -------------------------------

def tpch_q1_pricing_summary(t) -> DataFrame:
    """TPC-H Q1-style pricing summary: scan-heavy agg with 8 aggregates
    over lineitem.  Partial aggregation reduces 60k/600k/... rows to 6
    groups map-side; the shuffle is negligible at any scale.  Averages
    are derived from the decimal-stable sums so values are
    partitioning-independent."""
    li = t["lineitem"].filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    agg = li.groupBy("l_returnflag", "l_linestatus").agg(
        _dsum(F.col("l_quantity"), "sum_qty"),
        _dsum(F.col("l_extendedprice"), "sum_base_price"),
        _dsum(disc_price, "sum_disc_price"),
        _dsum(charge, "sum_charge"),
        _dsum(F.col("l_discount"), "sum_disc"),
        F.count("*").alias("count_order"),
    )
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        "sum_qty",
        "sum_base_price",
        "sum_disc_price",
        "sum_charge",
        (F.col("sum_qty") / F.col("count_order")).alias("avg_qty"),
        (F.col("sum_base_price") / F.col("count_order")).alias("avg_price"),
        (F.col("sum_disc") / F.col("count_order")).alias("avg_disc"),
        "count_order",
    )


def tpch_q3_top_revenue_orders(t) -> DataFrame:
    """TPC-H Q3-style shipping priority: selective dimension filter,
    two joins, agg, top-10.  customer(BUILDING) is filtered before the
    join (predicate pushdown) and broadcast; lineitem only shuffles on
    l_orderkey."""
    cust = t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
    orders = t["orders"].filter(F.col("o_orderdate") < F.lit("1999-01-01"))
    li = t["lineitem"].filter(F.col("l_shipdate") > F.lit("1996-01-01"))
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_dsum(revenue, "revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def tpch_q6_forecast_revenue(t) -> DataFrame:
    """TPC-H Q6-style forecast revenue: pure filter+sum — the query
    whose entire cost is the scan, so it measures pushdown + codegen
    throughput.  All three predicates reach the parquet reader."""
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(_dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"))


def tpch_q5_regional_revenue(t) -> DataFrame:
    """TPC-H Q5-style regional revenue: 5-table star join.  The entire
    dimension chain region→nation→customer stays broadcast; only
    orders⨝lineitem shuffles — the plan a 1000-executor cluster wants."""
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    dims = (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .select("c_custkey", "n_name")
    )
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(dims), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("n_name")
        .agg(_dsum(revenue, "revenue"))
    )


def tpch_q4_priority_semijoin(t) -> DataFrame:
    """TPC-H Q4-style order-priority check: the EXISTS correlated
    subquery re-expressed as a left-semi join with a non-equi residual
    (l_shipdate > o_orderdate).  Semi join never materializes lineitem
    columns, so the shuffle carries only the join key — at 100 TB the
    probe side streams through without row expansion."""
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-04-01"))
    )
    # EXISTS(lineitem with l_shipdate > o_orderdate) ⇔ the ORDER'S MAX
    # l_shipdate > o_orderdate, so the probe side pre-aggregates to one
    # (l_orderkey, max_shipdate) row per order with map-side combine
    # BEFORE any join (guide: aggregate before you shuffle).  The raw
    # semi-join form made the planner build a 33 MB broadcast of the
    # 600 k-row lineitem projection (the non-equi residual kept it from
    # shrinking); the pre-agg is ~1/4 the rows and 2 narrow columns,
    # and at cluster scale it replaces the full fact semi-join shuffle
    # with a partial-aggregated one.  The join is 1:1 (agg key unique),
    # so inner-join + residual ≡ the semi join exactly.
    # l_shipdate > o_orderdate ≥ window-start, so lineitems shipping at
    # or before the window start can never witness the EXISTS — the
    # date filter is pushed into the parquet scan and shrinks the agg
    # input before the shuffle.
    li_max = (
        t["lineitem"]
        .filter(F.col("l_shipdate") > F.lit("1996-01-01"))
        .groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("_max_shipdate"))
    )
    return (
        orders.join(li_max, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("_max_shipdate") > F.col("o_orderdate"))
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


def tpch_q12_priority_by_linestatus(t) -> DataFrame:
    """TPC-H Q12-style conditional aggregation after a fact-fact join:
    integer CASE sums (exact, order-independent) classify order
    priority per linestatus.  Only (l_orderkey, l_linestatus) survive
    the scan → minimal shuffle width."""
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.select("l_orderkey", "l_linestatus")
        .join(
            t["orders"].select("o_orderkey", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(hi, 0).otherwise(1)).alias("low_line_count"),
        )
    )


def tpch_q14_promo_revenue(t) -> DataFrame:
    """TPC-H Q14-style promo-revenue ratio: broadcast the 2k-row part
    dimension into the filtered lineitem scan, conditional decimal
    sums, one-row output.  The ratio is derived from the two stable
    sums so it is partitioning-independent."""
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01"))
        & (F.col("l_shipdate") < F.lit("1997-04-01"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    agg = (
        li.join(
            F.broadcast(t["part"].select("p_partkey", "p_type")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .agg(
            _dsum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0), "promo_revenue"),
            _dsum(rev, "total_revenue"),
        )
    )
    return agg.select(
        "promo_revenue",
        "total_revenue",
        ((F.lit(100.0) * F.col("promo_revenue")) / F.col("total_revenue")).alias(
            "promo_pct"
        ),
    )


def tpch_q17_small_quantity_revenue(t) -> DataFrame:
    """TPC-H Q17-style small-quantity revenue: the correlated scalar
    subquery (0.2 * avg qty per part) decorrelated into an unbounded
    window aggregate over l_partkey — ONE scan and ONE shuffle of a
    3-column projection.  The join-back alternative needs two scans,
    and at 100 TB the per-part threshold table has partkey cardinality
    (billions of rows), so it cannot broadcast and would shuffle the
    fact twice; the window form was also measured ~25% faster at
    sf0.1.  The threshold is the same decimal-sum/count expression on
    both engines so the < compare is bit-identical."""
    w = Window.partitionBy("l_partkey")
    threshold = (
        F.sum(F.col("l_quantity").cast("decimal(25,6)")).over(w).cast("double")
        / F.count("*").over(w)
    ) * 0.2
    return (
        t["lineitem"]
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .withColumn("qty_threshold", threshold)
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(_dsum(F.col("l_extendedprice"), "sum_small_qty_price"))
        .select((F.col("sum_small_qty_price") / 7.0).alias("avg_yearly"))
    )


def tpch_q18_large_orders(t) -> DataFrame:
    """TPC-H Q18-style large-volume orders: HAVING on a grouped fact
    becomes filter-after-agg; the surviving handful of order keys then
    joins orders and customer (both effectively broadcast relative to
    the fact).  Explicit (o_totalprice DESC, o_orderkey) total order."""
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(_dsum(F.col("l_quantity"), "sum_qty"))
        .filter(F.col("sum_qty") > 300.0)
    )
    return (
        big.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(t["customer"].select("c_custkey", "c_name")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty"
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


def tpch_q19_disjunctive_filter(t) -> DataFrame:
    """TPC-H Q19-style disjunctive predicate join: three OR'd
    brand/size/quantity branches evaluated after a broadcast hash join
    with part.  Catalyst extracts the common l_partkey equi-key; the
    disjunction stays as a residual filter inside codegen."""
    li = t["lineitem"]
    joined = li.join(
        F.broadcast(t["part"].select("p_partkey", "p_brand", "p_size")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    q = F.col("l_quantity")
    branch = (
        ((F.col("p_brand") == "Brand#11") & F.col("p_size").between(1, 5) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#14") & F.col("p_size").between(1, 10) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#17") & F.col("p_size").between(1, 15) & q.between(20, 30))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return joined.filter(branch).agg(_dsum(rev, "revenue"))


def tpch_q22_idle_customers(t) -> DataFrame:
    """TPC-H Q22-style idle high-balance customers: global-average
    scalar subquery via a 1-row broadcast cross join, then an
    anti-join against recent orders to keep customers with no
    purchases since mid-2000.  Anti join ships only o_custkey after
    the date filter pushes down; the aggregate is per-nation."""
    cust = t["customer"]
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(25,6)")).cast("double")
            / F.count("*")
        ).alias("avg_bal")
    )
    recent = t["orders"].filter(F.col("o_orderdate") >= F.lit("2000-07-01")).select(
        "o_custkey"
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            _dsum(F.col("c_acctbal"), "totacctbal"),
        )
    )


# --- full TPC-H shape completion ---------------------------------------------
# The remaining 11 of the 22 TPC-H query shapes (SURVEY.md §2.5 notes the
# reference itself has none of these; they are north-star bench anchors).
# The synthetic schema (TESTDATA.md) has no partsupp table and no
# commit/receipt dates, so Q2/Q9/Q11/Q16/Q20/Q21 are faithful structural
# variants over the columns that exist — same plan shape (correlated min,
# outer-join distribution, scalar-subquery threshold, distinct-agg,
# agg→semi-join, EXISTS+NOT-EXISTS self-join), different cost columns.


def tpch_q2_min_cost_supplier(t) -> DataFrame:
    """TPC-H Q2-style min-cost supplier: the correlated MIN subquery
    (cheapest offer per part) decorrelated into an unbounded MIN
    window over p_partkey — one scan of the offers, one shuffle (same
    argument as tpch_q17: the per-part min table has part cardinality
    at scale, so a join-back can't broadcast).  Unit price is
    l_extendedprice/l_quantity (no partsupp in this schema); IEEE-754
    division is bit-identical across engines so the equality compare
    is exact.  Part and supplier dims broadcast."""
    parts = t["part"].filter(
        (F.col("p_size") <= 5) & (F.col("p_type") == "SMALL")
    ).select("p_partkey", "p_name")
    offers = (
        t["lineitem"]
        .filter(F.col("l_quantity") > 0)
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "p_partkey",
            "p_name",
            "l_suppkey",
            (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
        )
    )
    min_price = F.min("unit_price").over(Window.partitionBy("p_partkey"))
    supp = t["supplier"].join(
        F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey")
    )
    return (
        offers.withColumn("min_price", min_price)
        .filter(F.col("unit_price") == F.col("min_price"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "unit_price")
        .orderBy(F.desc("s_acctbal"), F.asc("p_partkey"), F.asc("s_name"))
        .limit(100)
    )


def tpch_q7_volume_shipping(t) -> DataFrame:
    """TPC-H Q7-style volume shipping between two nations.  Both
    nation filters apply to the 25-row dim BEFORE the fact join, so
    the customer side shrinks ~12× before its shuffle; supplier side
    is broadcast.  Group keys (supp_nation, cust_nation, year)."""
    nations = t["nation"].filter(F.col("n_name").isin("NATION_1", "NATION_2"))
    supp = (
        t["supplier"]
        .join(F.broadcast(nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        t["customer"]
        .join(F.broadcast(nations), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(_dsum(rev, "revenue"))
    )


def tpch_q8_market_share(t) -> DataFrame:
    """TPC-H Q8-style national market share: one nation's fraction of
    regional revenue per year.  Conditional decimal sums make the
    ratio partitioning-independent; every dimension (part, supplier,
    customer-nation-region chain) broadcasts, so the only shuffles
    are lineitem⨝orders and the 2-row final aggregate."""
    parts = t["part"].filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    supp = (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust_region = (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .select("c_custkey")
    )
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t["lineitem"]
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust_region, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            _dsum(
                F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(0.0),
                "nation_revenue",
            ),
            _dsum(rev, "total_revenue"),
        )
        .select(
            "o_year",
            "nation_revenue",
            "total_revenue",
            (F.col("nation_revenue") / F.col("total_revenue")).alias("mkt_share"),
        )
    )


def tpch_q9_product_type_profit(t) -> DataFrame:
    """TPC-H Q9-style product profit by (nation, year).  The schema
    has no partsupp.ps_supplycost, so cost is proxied by
    0.1 * p_retailprice * l_quantity — the plan keeps Q9's shape: a
    LIKE-filtered part dim and the supplier→nation chain broadcast
    into the fact, orders joined only for the year column."""
    parts = t["part"].filter(F.col("p_name").like("%widget%")).select(
        "p_partkey", "p_retailprice"
    )
    supp = (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.1) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        t["lineitem"]
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            t["orders"].select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(_dsum(amount, "sum_profit"))
    )


def tpch_q10_returned_items(t) -> DataFrame:
    """TPC-H Q10-style returned-item report: top-20 customers by lost
    revenue in one quarter.  The date filter shrinks orders before
    the fact join; customer attributes join AFTER the per-customer
    aggregate, so the shuffle carries (custkey, revenue) pairs, not
    full customer rows."""
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-04-01"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_cust = (
        t["lineitem"]
        .filter(F.col("l_returnflag") == "R")
        .join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_custkey")
        .agg(_dsum(rev, "revenue"))
    )
    cust = t["customer"].join(
        F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey")
    )
    return (
        per_cust.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


def tpch_q11_important_values(t) -> DataFrame:
    """TPC-H Q11-style important stock: per-part value restricted to
    two nations' suppliers, kept only where value exceeds a global
    fraction — the HAVING-against-scalar-subquery shape.  The global
    total is a 1-row broadcast; both aggregates reuse the same
    l_partkey shuffle partitioning (no partsupp: value = sum of
    extended price shipped)."""
    supp = t["supplier"].filter(F.col("s_nationkey").isin(0, 1)).select("s_suppkey")
    values = (
        t["lineitem"]
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(_dsum(F.col("l_extendedprice"), "part_value"))
    )
    total = values.agg(
        F.sum(F.col("part_value").cast("decimal(25,6)")).cast("double").alias("total_value")
    )
    return (
        values.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.col("total_value") * 0.001)
        .select("l_partkey", "part_value")
        .orderBy(F.desc("part_value"), F.asc("l_partkey"))
    )


def tpch_q13_customer_distribution(t) -> DataFrame:
    """TPC-H Q13-style customer order-count distribution: LEFT OUTER
    join keeps zero-order customers, first aggregate counts orders
    per customer, second aggregates the distribution.  The second
    groupBy runs over one row per customer — tiny — and the outer
    join's null rows become c_count=0 exactly as COUNT(col) skips
    nulls in both engines."""
    orders = t["orders"].filter(F.col("o_orderpriority") != "1-URGENT").select(
        "o_orderkey", "o_custkey"
    )
    per_cust = (
        t["customer"]
        .select("c_custkey")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def tpch_q15_top_supplier(t) -> DataFrame:
    """TPC-H Q15-style top supplier: quarterly revenue per supplier,
    then equality against the scalar MAX.  Revenue stays DECIMAL
    through the max-equality compare (exact, partition-independent)
    and is cast to double only in the output projection."""
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-10-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(25,6)")
    revenue = li.groupBy("l_suppkey").agg(F.sum(rev).alias("total_rev_dec"))
    max_rev = revenue.agg(F.max("total_rev_dec").alias("max_rev"))
    return (
        revenue.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_rev_dec") == F.col("max_rev"))
        .join(
            F.broadcast(t["supplier"].select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_rev_dec").cast("double").alias("total_revenue"),
        )
        .orderBy(F.asc("s_suppkey"))
    )


def tpch_q16_supplier_part_counts(t) -> DataFrame:
    """TPC-H Q16-style supplier counts per part attribute: distinct
    (part, supplier) pairs come from lineitem (no partsupp), negative-
    balance suppliers are excluded by anti-join (the NOT IN shape),
    then COUNT(DISTINCT) per (brand, type, size).  The distinct-pair
    projection collapses the fact table before the dimension join."""
    bad_supp = t["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey")
    pairs = (
        t["lineitem"]
        .select("l_partkey", "l_suppkey")
        .distinct()
        .join(bad_supp, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
    )
    parts = t["part"].filter(
        (F.col("p_brand") != "Brand#11")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    return (
        pairs.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.desc("supplier_cnt"), F.asc("p_brand"), F.asc("p_type"), F.asc("p_size")
        )
    )


def tpch_q20_excess_shippers(t) -> DataFrame:
    """TPC-H Q20-style promotion-candidate suppliers: suppliers whose
    1997 shipments of red parts exceed the per-supplier average — the
    agg→scalar-threshold→semi-join chain (no partsupp availqty, so
    the threshold is the cross-supplier mean, scale-free at any SF).
    Supplier rows are only materialized for the survivors."""
    red = t["part"].filter(F.col("p_name").like("red%")).select("p_partkey")
    shipped = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
        )
        .join(F.broadcast(red), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(_dsum(F.col("l_quantity"), "red_qty"))
    )
    avg_qty = shipped.agg(
        (
            F.sum(F.col("red_qty").cast("decimal(25,6)")).cast("double")
            / F.count("*")
        ).alias("avg_qty")
    )
    qualified = shipped.crossJoin(F.broadcast(avg_qty)).filter(
        F.col("red_qty") > F.col("avg_qty")
    )
    return (
        t["supplier"]
        .join(
            qualified.select("l_suppkey"),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .select("s_suppkey", "s_name")
        .orderBy(F.asc("s_suppkey"))
    )


def tpch_q21_waiting_suppliers(t) -> DataFrame:
    """TPC-H Q21-style blamed suppliers: on failed multi-supplier
    orders, the supplier who shipped LAST (EXISTS another supplier on
    the order; NOT EXISTS one shipping later) — the schema has no
    commit/receipt dates, so lateness is re-expressed on l_shipdate.
    Both correlated quantifiers are decorrelated into stacked
    unbounded windows over l_orderkey (the q17/q2 window pattern
    applied to a SELF-join): EXISTS ⇔ the order has >1 distinct
    supplier; NOT EXISTS a later OTHER-supplier shipment ⇔ the max
    shipdate among other suppliers is <= mine, derived from (max
    shipdate, the supplier set achieving it, and the max excluding
    that top supplier).  The three windows share one partitioning, so
    ONE fact shuffle replaces the semi-join + anti-join's three — at
    cluster scale the self-join's two extra fact exchanges are
    exactly what saturates the network."""
    failed = t["orders"].filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    li = t["lineitem"].select("l_orderkey", "l_suppkey", "l_shipdate")
    l1 = li.join(
        F.broadcast(failed), F.col("l_orderkey") == F.col("o_orderkey")
    ).select("l_orderkey", "l_suppkey", "l_shipdate")

    w = Window.partitionBy("l_orderkey")
    staged = (
        l1.select(
            "*",
            F.max("l_shipdate").over(w).alias("_m1"),
            F.size(F.collect_set("l_suppkey").over(w)).alias("_n_supp"),
        )
        .withColumn(
            "_top_supps",
            F.collect_set(
                F.when(F.col("l_shipdate") == F.col("_m1"), F.col("l_suppkey"))
            ).over(w),
        )
        .withColumn(
            "_m2_excl",
            F.max(
                F.when(
                    F.col("l_suppkey") != F.element_at(F.col("_top_supps"), 1),
                    F.col("l_shipdate"),
                )
            ).over(w),
        )
    )
    max_other = F.when(
        (F.size(F.col("_top_supps")) > 1)
        | (F.element_at(F.col("_top_supps"), 1) != F.col("l_suppkey")),
        F.col("_m1"),
    ).otherwise(F.col("_m2_excl"))
    waiting = staged.filter(
        (F.col("_n_supp") > 1)
        & F.coalesce(max_other <= F.col("l_shipdate"), F.lit(True))
    )
    return (
        waiting.groupBy("l_suppkey")
        .agg(F.count("*").alias("numwait"))
        .join(
            F.broadcast(t["supplier"].select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(25)
    )


def full_outer_reconcile(t) -> DataFrame:
    """Cross-source reconciliation via FULL OUTER join — the one join
    type the rest of the suite doesn't exercise (generalizes the
    reference's Q15 dataset-parity check, cmd/validate/main.go:228-252,
    to sources with asymmetric coverage).  Two derived views of orders
    (keys ∤3 vs keys ∤5, right side floor-truncated on keys ∤7)
    full-outer-join on the key; every row classifies as match /
    mismatch / left_only / right_only and the report aggregates counts
    plus total absolute drift.

    Scale: both sides shuffle once on the same key; the classifier is
    a null-pattern CASE inside codegen; the final aggregate is 4 rows.
    """
    o = t["orders"]
    left = o.filter(F.col("o_orderkey") % 3 != 0).select(
        F.col("o_orderkey").alias("l_key"), F.col("o_totalprice").alias("l_price")
    )
    right = o.filter(F.col("o_orderkey") % 5 != 0).select(
        F.col("o_orderkey").alias("r_key"),
        F.when(
            F.col("o_orderkey") % 7 == 0, F.floor("o_totalprice").cast("double")
        )
        .otherwise(F.col("o_totalprice"))
        .alias("r_price"),
    )
    status = (
        F.when(F.col("l_key").isNull(), "right_only")
        .when(F.col("r_key").isNull(), "left_only")
        .when(F.col("l_price") == F.col("r_price"), "match")
        .otherwise("mismatch")
    )
    return (
        left.join(right, F.col("l_key") == F.col("r_key"), "full_outer")
        .select(
            status.alias("status"),
            F.coalesce(
                F.abs(F.col("l_price") - F.col("r_price")), F.lit(0.0)
            ).alias("drift"),
        )
        .groupBy("status")
        .agg(F.count("*").alias("n"), _dsum(F.col("drift"), "total_drift"))
    )


def q1_group_count_pipe_sql(spark, t) -> DataFrame:
    """Q1 via Spark 4's SQL pipe syntax — the same grouped count as
    ``q1_group_count`` written as a linear `|>` dataflow.  Pipe SQL
    compiles to the identical Catalyst plan (same partial-agg +
    single shuffle); the entry demonstrates the engine's third query
    surface next to DataFrame and classic SQL."""
    t["orders"].createOrReplaceTempView("orders_pipe")
    return spark.sql(
        """
FROM orders_pipe
|> AGGREGATE count(*) AS n GROUP BY o_orderpriority
"""
    )


def join_size_estimate(t) -> DataFrame:
    """Pre-join cardinality prediction: |orders ⋈ lineitem| computed
    from the two sides' per-key count tables — sum over join keys of
    n_left × n_right.  The 100 TB planning diagnostic that decides
    whether a join is safe to run at all (and companion to
    join_skew_report's per-key view): two cheap keyed aggregates and
    a vocabulary-sized join instead of materializing the join.

    Exact, not a sketch — so the test asserts it equals the real join
    count; at scale the same query over approx_count sketches trades
    exactness for one fewer shuffle."""
    o = t["orders"].groupBy("o_orderkey").agg(F.count("*").alias("n_o"))
    li = (
        t["lineitem"]
        .groupBy(F.col("l_orderkey").alias("o_orderkey"))
        .agg(F.count("*").alias("n_l"))
    )
    return o.join(li, "o_orderkey").agg(
        F.sum(F.col("n_o") * F.col("n_l")).alias("est_join_rows"),
        F.count("*").alias("n_matching_keys"),
        F.max(F.col("n_o") * F.col("n_l")).alias("max_key_fanout"),
    )


GEO_CELL_DEG = 0.5   # grid cell size (degrees)
GEO_RADIUS_DEG = 0.3  # match radius (degrees, squared-degree metric)
GEO_N_SITES = 200     # query-site count in the canonical entry


def _event_points(t) -> DataFrame:
    """Deterministic synthetic coordinates for the events table (the
    driver tables carry no geo columns; the derivation is shared
    verbatim with the DuckDB oracle).  Mirrors the reference's
    lat/lon domain (storm reports, reference
    internal/domain/event.go:53-56)."""
    return t["events"].select(
        "event_id",
        (25.0 + (F.col("user_id") % 100) * 0.1
         + (F.col("event_id") % 7) * 0.01).alias("lat"),
        (-100.0 + (F.col("user_id") % 73) * 0.15
         + (F.col("event_id") % 11) * 0.01).alias("lon"),
    )


def geo_neighbor_search(t) -> DataFrame:
    """Spatial lookup join: for each of the first GEO_N_SITES event
    sites, every event within GEO_RADIUS_DEG — the scale form of the
    reference's bounding-box scan (Q7, cmd/genmock/main.go:304-322):
    instead of scanning all points per query, both sides key into a
    GEO_CELL_DEG grid and each query probes only its 3×3 neighbor
    cells (radius < cell size guarantees no misses).

    At 100 TB: the point side shuffles once on the cell key; query
    sites explode ×9 and broadcast; the refine predicate is pure
    arithmetic (squared-degree metric — deterministic in both
    engines, unlike haversine's libm trig; swap in haversine on a
    real cluster where exactness-vs-oracle isn't the contract).
    """
    pts = _event_points(t)
    cell_lat = F.floor(F.col("lat") / GEO_CELL_DEG)
    cell_lon = F.floor(F.col("lon") / GEO_CELL_DEG)
    data = pts.select(
        F.col("event_id").alias("point_id"),
        F.col("lat").alias("plat"),
        F.col("lon").alias("plon"),
        cell_lat.alias("clat"),
        cell_lon.alias("clon"),
    )
    sites = (
        pts.filter(F.col("event_id") < GEO_N_SITES)
        .select(
            F.col("event_id").alias("site_id"),
            F.col("lat").alias("slat"),
            F.col("lon").alias("slon"),
            cell_lat.alias("sclat"),
            cell_lon.alias("sclon"),
        )
        .withColumn("dlat", F.explode(F.array(*[F.lit(d) for d in (-1, 0, 1)])))
        .withColumn("dlon", F.explode(F.array(*[F.lit(d) for d in (-1, 0, 1)])))
        .select(
            "site_id", "slat", "slon",
            (F.col("sclat") + F.col("dlat")).alias("clat"),
            (F.col("sclon") + F.col("dlon")).alias("clon"),
        )
    )
    d2 = (
        (F.col("plat") - F.col("slat")) * (F.col("plat") - F.col("slat"))
        + (F.col("plon") - F.col("slon")) * (F.col("plon") - F.col("slon"))
    )
    return (
        F.broadcast(sites)
        .join(data, ["clat", "clon"])
        .filter(F.col("point_id") != F.col("site_id"))
        .withColumn("d2", d2)
        .filter(F.col("d2") <= F.lit(GEO_RADIUS_DEG * GEO_RADIUS_DEG))
        .select("site_id", "point_id", "d2")
    )  # no distinct: a point lives in exactly one cell, pairs are unique
