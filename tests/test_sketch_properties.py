"""Property-based tests for the sketch kernels: mechanical
exploration of the guarantees the operators' docstrings claim.
Pure-Python (no Spark jobs per example), so hypothesis can run
hundreds of cases."""

from __future__ import annotations

from collections import Counter
from contextlib import contextmanager

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from storm_data_etl_service_spark.operators import text as X


@contextmanager
def _capacity(cap: int):
    saved = X.HH_CAPACITY
    X.HH_CAPACITY = cap
    try:
        yield
    finally:
        X.HH_CAPACITY = saved


def _run_mg(batches, cap):
    with _capacity(cap):
        frames = (pd.DataFrame({"token": b}) for b in batches)
        out = list(X._mg_candidates(frames))
    assert len(out) == 1
    return set(out[0]["token"])


@given(
    data=st.lists(
        st.lists(st.integers(min_value=0, max_value=30), max_size=200),
        min_size=1,
        max_size=6,
    ),
    cap=st.integers(min_value=1, max_value=12),
)
@settings(max_examples=200, deadline=None)
def test_mg_candidates_superset_guarantee(data, cap):
    """Misra-Gries invariant: after any batch split, the candidate set
    contains EVERY token with global frequency > N/(C+1) — the
    property that makes the exact-recount filter lossless."""
    batches = [[f"t{v}" for v in b] for b in data]
    survivors = _run_mg(batches, cap)
    counts = Counter(tok for b in batches for tok in b)
    n = sum(counts.values())
    must_survive = {tok for tok, c in counts.items() if c * (cap + 1) > n}
    assert must_survive <= survivors, (
        f"lost heavy hitters {must_survive - survivors} (N={n}, C={cap})"
    )
    # the sketch never retains more than C counters after a compress,
    # and never more than the true vocabulary
    assert len(survivors) <= max(cap, len(counts))


@given(
    tokens=st.lists(
        st.integers(min_value=0, max_value=10), min_size=1, max_size=300
    ),
    n_splits=st.integers(min_value=1, max_value=5),
    cap=st.integers(min_value=2, max_value=8),
)
@settings(max_examples=100, deadline=None)
def test_mg_threshold_filter_is_split_invariant(tokens, n_splits, cap):
    """The final answer (candidates recounted exactly, thresholded at
    N/(C+1)) must be IDENTICAL for every way of splitting the stream
    into batches — the partitioning-independence the operator's
    docstring promises."""
    toks = [f"t{v}" for v in tokens]
    counts = Counter(toks)
    n = len(toks)
    expect = {tok for tok, c in counts.items() if c * (cap + 1) > n}
    for split in range(n_splits):
        step = max(1, len(toks) // (split + 1))
        batches = [toks[i : i + step] for i in range(0, len(toks), step)]
        survivors = _run_mg(batches, cap)
        answer = {tok for tok in survivors if counts[tok] * (cap + 1) > n}
        assert answer == expect


def test_float_ops_are_partitioning_independent(spark, sf_dir):
    """The repo-wide determinism claim (SCALE.md rule 5), verified
    mechanically: float-producing operators must return BIT-IDENTICAL
    rows when every input table is adversarially repartitioned —
    decimal routing / fixed-point quantization / ordered folds are
    load-bearing, not decorative."""
    from storm_data_etl_service_spark.operators import analytics as A
    from storm_data_etl_service_spark.operators import similarity as S
    from storm_data_etl_service_spark.operators import text as X
    from storm_data_etl_service_spark.schemas import load_tables

    base = load_tables(spark, sf_dir)
    skewed = {name: base[name].repartition(3) for name in
              ("documents", "embeddings", "events", "lineitem", "orders")}

    def norm(row):
        return tuple(
            tuple(x) if isinstance(x, list) else x for x in row
        )

    ops = [
        A.correlation_stats,
        A.salted_group_sum,
        S.embedding_label_centroids,
        S.label_separability_report,
        X.bigram_surprisal_scores,
        X.rare_token_share,
    ]
    for op in ops:
        a = {norm(r) for r in op(base).collect()}
        b = {norm(r) for r in op(skewed).collect()}
        assert a == b, f"{op.__name__} diverged under repartitioning"


def test_global_ntile_matches_window_ntile(spark):
    """with_global_ntile must equal F.ntile over an unpartitioned
    window for every bucket-count and size shape: N < n, N = n,
    N % n != 0, duplicate sort values broken by a unique key."""
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    from storm_data_etl_service_spark.operators.analytics import (
        with_global_ntile,
    )

    rows = [(i, (i * 7919) % 13) for i in range(97)]
    df = spark.createDataFrame(rows, "id long, v long")
    for n, limit in ((10, 97), (4, 97), (10, 7), (10, 10), (3, 96)):
        d = df.limit(limit)
        order = [F.desc("v"), F.asc("id")]
        got = {
            r["id"]: r["b"]
            for r in with_global_ntile(d, n, order, "b").collect()
        }
        want = {
            r["id"]: r["b"]
            for r in d.select(
                "id", F.ntile(n).over(Window.orderBy(*order)).alias("b")
            ).collect()
        }
        assert got == want, (n, limit)


def test_containment_prefix_filter_equals_naive(spark):
    """The asymmetric prefix-filter containment join must produce
    exactly the naive all-pairs result (100% recall, no extras) on a
    corpus with planted subsets, supersets, near-misses, and
    high-frequency boilerplate shingles — at the default threshold AND
    at looser/tighter ones, since prefix length and the directed size
    gate are derived from the parameter (a hardcoded-0.9 regression
    silently drops pairs at threshold 0.8)."""
    import pyspark.sql.functions as F

    from storm_data_etl_service_spark.operators.dedup import (
        _doc_shingles,
        dedup_containment,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    docs = []
    for i in range(30):
        body = base + " ".join(f"w{i}x{j}" for j in range(i % 7))
        docs.append((i, body))
    docs.append((100, base))                      # subset of all base+suffix docs
    docs.append((101, base + "mu nu xi"))         # superset of 100
    docs.append((102, "unrelated words only here completely different text"))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    t = {"documents": df}

    # naive reference: all-pairs array_intersect (exact at any threshold)
    sh = _doc_shingles(t).cache()
    a = sh.select(F.col("doc_id").alias("da"), F.col("shingles").alias("sa"))
    b = sh.select(F.col("doc_id").alias("db"), F.col("shingles").alias("sb"))
    pairs = a.crossJoin(b).filter(F.col("da") != F.col("db"))
    c = F.size(F.array_intersect("sa", "sb")).cast("double")

    counts = {}
    for threshold in (0.9, 0.8, 0.6, 1.0):
        got = {
            (r["doc_sub"], r["doc_super"])
            for r in dedup_containment(t, threshold=threshold).collect()
        }
        naive = {
            (r["da"], r["db"])
            for r in pairs.filter(c / F.size("sa") >= threshold).collect()
        }
        assert got == naive, f"threshold={threshold}"
        counts[threshold] = len(got)
    assert counts[0.9], "fixture must plant at least one containment pair"
    assert counts[0.6] > counts[0.9], (
        "looser threshold must admit MORE pairs — otherwise the 0.8/0.6 "
        "legs aren't exercising recall beyond the 0.9 prefix"
    )

    import pytest as _pytest

    with _pytest.raises(ValueError):
        dedup_containment(t, threshold=0.0)


def test_shingles_zip_slices_match_reference(spark):
    """The zip-of-slices shingle builder must equal a plain Python
    sliding-window reference on edge shapes: short docs, repeated
    tokens, multi-space runs."""
    import pyspark.sql.functions as F

    from storm_data_etl_service_spark.operators.dedup import shingles_col
    from storm_data_etl_service_spark.operators.text import tokens_col

    texts = [
        "",
        "one",
        "one two",
        "one two three",
        "a a a a a",
        "x  y   z  x y z",
        "p q r s t u v w",
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(texts)], "i long, text string")
    got = {
        r["i"]: r["sh"]
        for r in df.select(
            "i",
            shingles_col(tokens_col(F.col("text"))).alias("sh"),
        ).collect()
    }
    for i, s in enumerate(texts):
        toks = s.split()
        want = list(dict.fromkeys(
            " ".join(toks[j : j + 3]) for j in range(len(toks) - 2)
        )) if len(toks) >= 3 else []
        assert got[i] == want, (i, s, got[i], want)
