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
