"""Embedding similarity search over the ``embeddings`` table.

Beyond-reference surface (BASELINE.json north star): brute-force
cosine top-k as the exact baseline, an LSH-bucketed variant as the
scale path, and a cosine near-dup threshold scan.

All dot products / norms are sequential left folds over
double-cast arrays, which both Spark (``aggregate``) and the DuckDB
oracle (``list_reduce``) evaluate in identical IEEE order — results
are bit-equal, so ranking needs no tolerance, only the vec_id
tiebreak.

Scale design: brute force is O(Q·N·d) — correct baseline, fine when
the query set is small and broadcast.  The LSH variant buckets
vectors by random-hyperplane sign bits so candidate generation is a
map + one shuffle on the bucket key; recall is tunable via tables ×
bits.  (A full IVF needs iterative k-means — out of expression reach,
by design; the bucketed path covers the same scale role.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

TOPK = 10
N_QUERIES = 5  # vec_id < 5 are the query vectors in the canonical query
NEAR_DUP_COSINE = 0.95

#: Random-hyperplane LSH: planes are deterministic sha256-derived
#: pseudo-vectors so both engines (and every cluster run) agree.
LSH_PLANES = 8


def _vec(c: Column) -> Column:
    return c.cast("array<double>")


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def ann_cosine_topk(t) -> DataFrame:
    """Exact brute-force cosine top-k: the N_QUERIES query vectors ×
    all vectors, ranked per query.

    The query side is broadcast (tiny); the data side streams — no
    shuffle until the per-query top-k window, which AQE keeps small
    because the ranked input is already (query, cosine)-narrow.
    """
    emb = t["embeddings"].select("vec_id", _vec(F.col("embedding")).alias("v"))
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    pairs = (
        F.broadcast(q)
        .crossJoin(emb)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            cosine(F.col("qv"), F.col("v")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOPK)
        .select("query_id", "vec_id", "cosine", "rk")
    )


def embedding_near_dup(t) -> DataFrame:
    """All vector pairs with cosine ≥ NEAR_DUP_COSINE (exact n²/2 scan
    — the correctness baseline; the LSH buckets below prune it at
    scale)."""
    emb = t["embeddings"].select("vec_id", _vec(F.col("embedding")).alias("v"))
    a, b = emb.alias("a"), emb.alias("b")
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cosine(F.col("a.v"), F.col("b.v")).alias("cosine"),
        )
        .filter(F.col("cosine") >= NEAR_DUP_COSINE)
    )


EMBEDDING_DIM = 64


def plane_components(plane: int, dim: int = EMBEDDING_DIM) -> list[float]:
    """Deterministic pseudo-random hyperplane: component i is
    sha256("p{plane}|{i}")'s first 8 hex chars as a fraction in
    [-0.5, 0.5).  Computed driver-side once — they are constants —
    and embedded as literals in both the Spark plan and the DuckDB
    oracle, which therefore agree bit-for-bit."""
    import hashlib

    out = []
    for i in range(1, dim + 1):
        h = int(hashlib.sha256(f"p{plane}|{i}".encode()).hexdigest()[:8], 16)
        out.append(h / 4294967296.0 - 0.5)
    return out


def lsh_bucket_col(v: Column, n_planes: int = LSH_PLANES) -> Column:
    """Sign-bit bucket string over deterministic random hyperplanes —
    the map-only half of bucketed ANN."""
    bits = []
    for p in range(n_planes):
        plane = F.array(*[F.lit(c) for c in plane_components(p)])
        proj = F.aggregate(
            F.zip_with(v, plane, lambda x, c: x * c),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def ann_lsh_buckets(t) -> DataFrame:
    """Per-vector LSH bucket assignment (the scale path's shuffle key):
    vectors in the same bucket are candidate neighbors.  Output is the
    oracle-checked contract (vec_id → bucket)."""
    emb = t["embeddings"].select("vec_id", _vec(F.col("embedding")).alias("v"))
    return emb.select("vec_id", lsh_bucket_col(F.col("v")).alias("bucket"))


#: Probe with a 4-bit bucket prefix: coarser buckets → enough
#: candidates per query at test scale; at production scale you tune
#: bits (and multi-probe neighboring buckets) for the recall target.
SEARCH_PREFIX_BITS = 4


def _probe_prefixes(qpfx: Column, bits: int = SEARCH_PREFIX_BITS) -> Column:
    """Multi-probe expansion: the query's own bucket plus every bucket
    at hamming distance 1 (flip each bit once).  Standard remedy for
    hyperplane-LSH recall on near-orthogonal data — probing 1+bits
    buckets instead of 1 trades a small candidate-set growth for a
    large recall gain."""
    flips = []
    for i in range(1, bits + 1):
        flipped = F.when(F.substring(qpfx, i, 1) == "1", "0").otherwise("1")
        flips.append(
            F.concat(F.substring(qpfx, 1, i - 1), flipped, F.substring(qpfx, i + 1, bits - i))
        )
    return F.array(qpfx, *flips)


def ann_lsh_search(t) -> DataFrame:
    """Bucketed ANN search — the scale path end-to-end: queries hash to
    a bucket prefix and multi-probe its hamming-1 neighborhood;
    candidates come from those buckets only (an equi-join on the
    prefix instead of a cross join), then exact cosine ranks them.

    Versus brute force: the data side is scanned once and shuffled on
    a bucket key; the per-query candidate set is (1+bits)·|bucket| ≪ N.
    Approximate by construction — recall is bounded in the unit test
    against `ann_cosine_topk`."""
    emb = t["embeddings"].select("vec_id", _vec(F.col("embedding")).alias("v"))
    bucketed = emb.select(
        "vec_id",
        "v",
        F.substring(lsh_bucket_col(F.col("v")), 1, SEARCH_PREFIX_BITS).alias("pfx"),
    )
    q = bucketed.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.explode(_probe_prefixes(F.col("pfx"))).alias("probe_pfx"),
    )
    cands = (
        F.broadcast(q)
        .join(bucketed, F.col("pfx") == F.col("probe_pfx"))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "vec_id", cosine(F.col("qv"), F.col("v")).alias("cosine")
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        cands.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("query_id", "vec_id", "cosine", "rk")
    )
