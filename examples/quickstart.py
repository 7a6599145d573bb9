#!/usr/bin/env python
"""Quickstart: the reference's whole workflow on this engine, end to
end, in one script.

    python examples/quickstart.py [sf_dir]

1. enrich raw storm reports (the reference's ETL transform, P1-P14);
2. answer the downstream analytical queries (genmock stats report);
3. run the training-data surface the reference never had: dedup
   ladder, corpus datasheet, similarity search, quality gates.

Every result printed here is also oracle-checked against DuckDB by
``scripts/check_correctness.py`` — this script is the human-readable
tour, not the proof.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    from pyspark.sql import functions as F

    from storm_data_etl_service_spark.functions.enrich import enrich
    from storm_data_etl_service_spark.operators.registry import REGISTRY
    from storm_data_etl_service_spark.session import get_spark
    from storm_data_etl_service_spark.sources.storm_fixture import (
        BASE_TS,
        spark_fixture_df,
    )

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="quickstart")

    print("== 1. Enrichment (reference transform, pure expressions) ==")
    enriched = enrich(spark_fixture_df(spark))
    enriched.select(
        "id", "event_type", "measurement.magnitude", "measurement.severity",
        "location.state", "source_office",
    ).show(5, truncate=False)

    print("== 2. Reference analytics (genmock stats report) ==")
    REGISTRY["storm_stats_report"].build(spark, sf_dir).orderBy(
        "metric", "key"
    ).show(30, truncate=False)

    print("== 3. Dedup ladder over the documents corpus ==")
    REGISTRY["dedup_ladder_report"].build(spark, sf_dir).orderBy("rung").show()

    print("== 4. Corpus datasheet ==")
    REGISTRY["corpus_dataset_card"].build(spark, sf_dir).show(truncate=False)

    print("== 5. Similarity search (exact cosine top-3 for query 0) ==")
    REGISTRY["ann_cosine_topk"].build(spark, sf_dir).filter(
        (F.col("query_id") == 0) & (F.col("rk") <= 3)
    ).show()

    print("== 6. Quality gates (surprisal outliers) ==")
    REGISTRY["bigram_surprisal_scores"].build(spark, sf_dir).orderBy(
        F.desc("avg_surprisal")
    ).show(5)

    spark.stop()


if __name__ == "__main__":
    main()
