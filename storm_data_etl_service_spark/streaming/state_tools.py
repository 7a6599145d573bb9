"""Checkpoint state introspection — read a live streaming query's
state store as DataFrames.

The reference's only observability is counter metrics (D9,
internal/observability/metrics.go); Spark additionally exposes the
STATE itself through the ``statestore`` / ``state-metadata`` batch
sources: what keys a streaming aggregation is holding, how big the
stores are, which operators own them.  This is the tool that answers
"why is this pipeline's state growing?" on a production cluster
without stopping the query — the state files are read like any other
data source, partition-parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_state_keys(
    spark: SparkSession, checkpoint: str, batch_id: int | None = None
) -> DataFrame:
    """Flattened (key struct, value struct, partition_id) rows of a
    streaming operator's state store at ``checkpoint`` (latest batch
    by default, or pinned via ``batch_id`` for drift comparisons)."""
    r = spark.read.format("statestore")
    if batch_id is not None:
        r = r.option("batchId", batch_id)
    return r.load(checkpoint)


def state_store_summary(spark: SparkSession, checkpoint: str) -> DataFrame:
    """Per-operator state inventory: operator name, store name,
    partition count, batch-id range — joined with the live key count
    per store.  The first chart on a streaming-state dashboard."""
    md = spark.read.format("state-metadata").load(checkpoint)
    counts = (
        read_state_keys(spark, checkpoint)
        .agg(F.count("*").alias("n_state_rows"))
    )
    return md.select(
        "operatorId",
        "operatorName",
        "stateStoreName",
        "numPartitions",
        "minBatchId",
        "maxBatchId",
    ).crossJoin(F.broadcast(counts))


def progress_state_report(query) -> list[dict]:
    """Per-operator state/lateness counters from a streaming query's
    recent progress — numRowsDroppedByWatermark is the D2-adjacent
    metric the engine keeps that the reference cannot (it has no
    event-time semantics): how many rows arrived too late to change
    a closed window.  One dict per (batch, stateful operator)."""
    out = []
    for p in query.recentProgress:
        for op in p.get("stateOperators", []):
            out.append(
                {
                    "batch_id": p["batchId"],
                    "operator": op.get("operatorName"),
                    "n_state_rows": op.get("numRowsTotal"),
                    "n_updated": op.get("numRowsUpdated"),
                    "n_dropped_late": op.get("numRowsDroppedByWatermark"),
                    "watermark": p.get("eventTime", {}).get("watermark"),
                }
            )
    return out
