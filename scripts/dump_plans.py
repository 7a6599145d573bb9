#!/usr/bin/env python
"""Regenerate PLANS.md: formatted physical plans of the headline
queries with scale annotations.  Run after changing any operator:
``python scripts/dump_plans.py``."""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.01"

ANNOTATED = {
    "enrich_events": (
        "Single WholeStageCodegen projection pipeline — the entire P1-P14 "
        "chain compiles into one generated function over the scan; no "
        "shuffle, no Python. Scales linearly with input splits."
    ),
    "tpch_q1_pricing_summary": (
        "Scan → partial HashAggregate (map-side combine to 6 groups) → "
        "single tiny shuffle → final aggregate. The filter is pushed into "
        "the parquet scan and only the 7 needed columns are read."
    ),
    "tpch_q5_regional_revenue": (
        "5-table star join: the region→nation→customer dimension chain "
        "stays broadcast (BroadcastHashJoin), so the only shuffle is "
        "orders⨝lineitem on the order key."
    ),
    "q9_topn": (
        "TakeOrderedAndProject: per-partition top-5 then merge — no "
        "global sort at any scale."
    ),
    "q13_anti_join": (
        "Left-anti join; Catalyst/AQE picks broadcast when the build side "
        "is small at runtime, sort-merge when both sides are large."
    ),
    "dedup_minhash_lsh": (
        "Map-only signatures (one sha256 per shingle + integer "
        "permutations) → explode to (band, key) → one explicit "
        "repartition on (band, key) that BOTH self-join sides consume "
        "(the second as a ReusedExchange, so the signature map work "
        "runs once). This is the near-dup scale path."
    ),
    "session_window_agg": (
        "Session windows: one shuffle on user_id with an in-shuffle sort; "
        "the merge happens inside the aggregation operator."
    ),
    "multimodal_decode_stats": (
        "Arrow-batched MapInPandas after column pruning (only "
        "media_id/kind/data cross the Arrow boundary) — one of exactly "
        "three queries allowed off the JVM (see "
        "tests/test_plans.py::INTENTIONAL_PYTHON_OPS)."
    ),
    "salted_group_sum": (
        "Two-phase skew-resistant aggregation: (key, salt) partials fan "
        "the 5 hot keys across reducers; the final merge is tiny."
    ),
    "tpch_q4_priority_semijoin": (
        "EXISTS compiled to a LeftSemi hash join with the non-equi "
        "residual (l_shipdate > o_orderdate) evaluated inside the join — "
        "the probe side streams through without row expansion, and only "
        "the two join columns of lineitem are scanned."
    ),
    "tpch_q17_small_quantity_revenue": (
        "Correlated scalar subquery decorrelated into an unbounded "
        "window over l_partkey: ONE scan, ONE shuffle of a 3-column "
        "projection. The join-back form scans twice and its threshold "
        "table (partkey cardinality) can't broadcast at 100 TB."
    ),
    "tpch_q19_disjunctive_filter": (
        "Disjunctive brand/size/quantity predicate: Catalyst extracts the "
        "common l_partkey equi-key for a BroadcastHashJoin and keeps the "
        "OR-branches as a codegen'd residual filter — no nested-loop "
        "fallback."
    ),
    "tpch_q22_idle_customers": (
        "Scalar-subquery average via 1-row broadcast cross join, then a "
        "LeftAnti hash join against date-filtered orders: the anti join "
        "ships only o_custkey after pushdown."
    ),
    "salted_skew_join": (
        "Replicated-dim salted join: the dim explodes ×8 salts (still "
        "tiny), the skewed fact splits each hot key across 8 reducers, "
        "and the rejoin key (event_type, salt) is near-uniform."
    ),
    "corpus_curation_pipeline": (
        "Gate → content-hash dedup window → split-hash projection → "
        "final agg: one scan, one shuffle on the content hash, one "
        "low-cardinality agg shuffle — the minimal-shuffle curation job."
    ),
    "ann_ivf_search": (
        "IVF probe: K-row centroid table broadcast twice (assign + "
        "probe), candidate join shuffles only on cid, per-query top-k "
        "window on the pruned candidate set (~nprobe/K of the corpus)."
    ),
    "tpch_q21_waiting_suppliers": (
        "EXISTS/NOT-EXISTS self-join decorrelated into three stacked "
        "windows sharing ONE l_orderkey exchange (max shipdate, its "
        "supplier set, the max excluding that top supplier) — lineitem "
        "is scanned and shuffled once where the semi+anti formulation "
        "shuffles it three times; ~35% faster at sf0.1."
    ),
    "tpch_q8_market_share": (
        "7-table join with one fact-fact shuffle: part, supplier→nation "
        "and the customer→nation→region chain all broadcast; the "
        "conditional-ratio aggregate reduces to one row per year before "
        "the final exchange."
    ),
    "tpch_q13_customer_distribution": (
        "LEFT OUTER join on o_custkey, first aggregate collapses to one "
        "row per customer (map-side partial), second aggregate runs over "
        "order-count cardinality (~tens of rows) — the classic "
        "two-level distribution shape."
    ),
    "tfidf_top_terms": (
        "One explode feeds both aggregates; doc-frequency collapses to "
        "vocabulary cardinality and broadcasts back onto (doc, term) "
        "counts with the 1-row corpus-size scalar; per-doc top-k is a "
        "window over each doc's own terms — no global sort anywhere."
    ),
    "dedup_containment": (
        "Asymmetric prefix filter: each doc's ~10% rarest shingles "
        "(sub role) join the full shingle table (super role) with a "
        "directed integer-exact size gate, so the df² blowup of the "
        "naive all-shingles self-join lives exactly in the shingles "
        "the prefix excludes; exact array_intersect verification runs "
        "only on surviving candidate pairs. 100% recall, no knobs. "
        "Prefix, super side, and verification arrays all derive from "
        "ONE ranked-shingles exchange (ReusedExchange), so the "
        "tokenize/shingle map work is evaluated once per query."
    ),
    "duplicated_span_report": (
        "Rolling 10-token windows built as a zip of 10 shifted array "
        "slices (the element_at-over-sequence form re-evaluates the "
        "inlined token tree per access — O(tokens²), measured 13×), "
        "then ONE partial-agg'd shuffle keyed on the span; the "
        "first-occurrence argmin rides the aggregation as a packed "
        "BIGINT, never a sort."
    ),
    "neardup_triangle_count": (
        "Twin-class contraction before triangle enumeration: one "
        "groupBy builds closed neighborhoods, one groupBy on the "
        "exact neighborhood array forms twin classes (a k-copy "
        "template family = a k-clique = one class), broadcast joins "
        "map edges onto class ids, and the x<y<z two-join wedge "
        "enumeration runs on the weighted QUOTIENT — within-family "
        "wedges (Θ(k³) per family) are replaced by closed-form "
        "per-class terms. Measured at the degenerate sf1.6 density: "
        "4.7e9 wedges → 2.7e9, timeout → completing; the DOULION "
        "sampled twin (neardup_triangle_estimate) cuts wedge work p² "
        "when even the quotient is wedge-bound."
    ),
    "balance_deciles": (
        "Distributed exact global ranking: range-partitioned sort, "
        "per-partition row_number, per-partition counts cumulated "
        "into broadcast start offsets; ntile/percent_rank/cume_dist "
        "all derive from the one global row number. The unpartitioned "
        "ranking-window form would move every customer into a single "
        "partition."
    ),
    "revenue_pareto_curve": (
        "Customer revenue (decimal-exact) → distributed global ntile "
        "(range sort + broadcast offsets, see balance_deciles) → "
        "10-group rollup with the grand total broadcast as one row. "
        "No data-sized single-partition window anywhere "
        "(plan-asserted)."
    ),
    "full_outer_reconcile": (
        "Both derived views shuffle once on the shared key into a "
        "full-outer SortMergeJoin; the null-pattern classifier and "
        "drift arithmetic run inside codegen; final aggregate is 4 rows."
    ),
    "linear_interpolate": (
        "Both the backward (last non-null) and forward (first non-null) "
        "frames share one (user_id, ts) sort, and Catalyst fuses them "
        "into a SINGLE Window operator — one exchange, one sort, four "
        "frame-bounded accumulators; the interpolation arithmetic runs "
        "in codegen above it."
    ),
    "mad_outlier_stats": (
        "Two unbounded percentile windows over the same partitioning: "
        "the MAD window consumes the median window's output without "
        "re-shuffling (one exchange total) — the join-back alternative "
        "would shuffle the fact table twice and couldn't broadcast a "
        "per-type median table at high type cardinality."
    ),
    "zorder_cluster": (
        "The 32-term Morton interleave is pure codegen bit arithmetic "
        "in the scan projection; the per-prefix stats are a two-phase "
        "distinct aggregate on the shifted curve key. In production the "
        "curve value feeds repartitionByRange + sortWithinPartitions "
        "before the parquet write (file-level min/max on BOTH source "
        "dimensions → 2-D data skipping)."
    ),
    "heavy_hitter_bigrams": (
        "Two bounded passes: MapInPandas emits per-partition Misra-Gries "
        "candidates (≤C rows each), BroadcastExchange gates the recount "
        "semi-join, and the final count is a partial-aggregated groupBy "
        "over survivors only — the token stream is never shuffled by value."
    ),
    "dedup_incremental_minhash": (
        "The band-key index builds map-only (signature + explode), the new "
        "batch filters via the broadcast 1-row split threshold, and the only "
        "pair work is the band-bucket equi-join against the batch — corpus "
        "cost is index scan, not re-pairing. The index is explicitly "
        "repartitioned on (band, key) before the split so the batch "
        "probe side reuses the same exchange (one signature pass)."
    ),
    "embedding_quantize_int8": (
        "posexplode → tiny groupBy(dim) for scales → broadcast back across "
        "the exploded scan → one more groupBy(dim). Dimension-parallel: "
        "shuffle keys number EMBEDDING_DIM, payloads are partial aggregates."
    ),
    "geo_neighbor_search": (
        "Grid-cell spatial join: the ×9-exploded query sites broadcast, the "
        "point side scans once into the cell-key hash join, and the refine "
        "predicate stays in codegen arithmetic — candidates are bounded by "
        "the 3×3 neighborhood instead of all-pairs distances."
    ),
    "cep_click_error_pattern": (
        "CEP on window frames: both next-event minima are RANGE[0,1h] "
        "frames over ONE user_id exchange + sort; the pattern predicate is "
        "a projection — no self-joins, no candidate-pair blowup."
    ),
    "bigram_surprisal_scores": (
        "The LM is two aggregate tables derived from the same (doc,w1,w2) "
        "count relation that scoring probes; both broadcast back over it "
        "(vocabulary-sized), so the corpus stream shuffles once into the "
        "count table and once into per-doc sums — both map-side combined."
    ),
    "centroid_similarity_matrix": (
        "Centroid components stay exploded as (label, dim) rows; the "
        "pair join aligns on dim and the dot/norm moments reduce "
        "map-side — K centroids never materialize driver-side, so the "
        "same plan serves 10 labels or 10^5 clusters."
    ),
    "bloom_dedup_report": (
        "Bloom membership pre-screen: the 1-row split boundary "
        "broadcasts (justified BNLJ), the existing corpus folds to a "
        "distinct (bit) relation, and the batch probes it with a "
        "bit-keyed join AQE sizes at runtime — at production m the "
        "index is a bitmap broadcast and the probe is map-side."
    ),
    "quality_linear_score": (
        "ZERO-shuffle linear classifier: tokenize, feature-concat, and "
        "the integer-weight aggregate fold are one projection over the "
        "scan — the whole hashed-feature gate pipelines with the read, "
        "full column pruning intact."
    ),
    "mixture_sample_assign": (
        "Source-cardinality rate table (one partial-agg'd count "
        "shuffle + the documented agg-cardinality window) broadcasts "
        "back; the epoch assignment itself is a map-only projection "
        "with a sha256 draw — no corpus shuffle."
    ),
    "embedding_exact_dedup": (
        "Per-dim scales from ONE 64-expression map-side aggregate "
        "(never a posexplode of n x d rows), broadcast as a single "
        "array row; coding is a zip_with projection and the only "
        "corpus shuffle is the groupBy on the 32-byte code key."
    ),
    "knn_graph_lsh": (
        "Members + probers shuffle once on the bucket key into the "
        "blocked Arrow top-k kernel (FlatMapGroupsInPandas); only "
        "<= k partial edges per (vector, bucket) reach the final "
        "ranking window. Auto prefix width holds bucket size — and "
        "per-bucket quadratic work — constant as n grows."
    ),
    "global_shuffle_order": (
        "Two-level deterministic global ordering: the per-shard "
        "row_number window sorts every hash shard in parallel, and the "
        "only SinglePartition exchange is the n_shards-row cumulative "
        "offsets (cluster-sized, broadcast back). Reproduces a global "
        "ORDER BY row_number bit-exactly with no data-sized funnel; "
        "layout is stable across cluster sizes."
    ),
    "length_bucket_batches": (
        "Map-only bucket/stream assignment (bit-length bucketing, hash "
        "streams), then both windows partition on (bucket, stream) — "
        "parallelism n_buckets x n_streams, raised by the stream knob "
        "at scale — before a two-level aggregation to the per-bucket "
        "padding report."
    ),
    "stratified_sample": (
        "Salted two-level per-stratum top-k: level one keeps the k "
        "hash-smallest per (source, salt) window so a giant stratum "
        "never serializes into one task; level two ranks only the "
        "sample-sized survivors (<= n_salts * k rows per source)."
    ),
    "curriculum_order": (
        "Equi-depth difficulty bands from the distributed global "
        "ranking (range repartition + per-partition numbering + "
        "cluster-sized offsets), a 1-row count broadcast for the "
        "integer band arithmetic, then per-band shuffle windows in "
        "parallel — band is the leading sort key, so the two-level "
        "position equals the single global window it replaces."
    ),
    "epoch_stream_order": (
        "Mixture copies materialize as expression fan-out (explode "
        "over sequence(0, n_copies-1)) — no Python, no driver loop; "
        "each copy gets an independent hash key so up-sampled repeats "
        "spread across the epoch, then the same two-level hash-shard "
        "layout as global_shuffle_order."
    ),
}


def main():
    from storm_data_etl_service_spark.operators.registry import REGISTRY
    from storm_data_etl_service_spark.session import get_spark

    spark = get_spark(
        app_name="dump_plans",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    out = [
        "# PLANS — physical plans of the headline queries",
        "",
        "Generated by `scripts/dump_plans.py` (`.explain(\"formatted\")`"
        f" at {SF_DIR}).  Each plan is annotated with why it is the",
        "plan a 1000-executor / 100 TB cluster wants.",
        "",
    ]
    for name, note in ANNOTATED.items():
        df = REGISTRY[name].build(spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        # keep the operator tree + first detail blocks, bounded
        head = plan.split("\n\n")[0]
        out += [f"## {name}", "", note, "", "```", head.strip(), "```", ""]
    Path("PLANS.md").write_text("\n".join(out))
    print(f"wrote PLANS.md ({len(ANNOTATED)} plans)")
    spark.stop()


if __name__ == "__main__":
    main()
