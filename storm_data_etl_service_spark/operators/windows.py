"""Time-window aggregation operators over the ``events`` stream table.

Generalizes the reference's single windowing primitive — the
hour-truncated tumbling bucket (P13, reference
internal/domain/transform.go:309-315) — to Spark's full windowing
surface: tumbling, sliding, and session windows, each usable
identically in batch and Structured Streaming (the streaming variants
add watermarks; see streaming/windows.py).

Scale notes: each is a single shuffle on (window-key[, group-key]) with
map-side partial aggregation; session windows additionally need a
per-key sort, which Spark does inside the shuffle — no extra stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from storm_data_etl_service_spark.operators.relational import _dsum


def tumbling_window_agg(t) -> DataFrame:
    """6-hour tumbling windows: count + stable sum per window."""
    w = F.window(F.col("ts"), "6 hours")
    return (
        t["events"]
        .groupBy(w.alias("w"))
        .agg(F.count("*").alias("n"), _dsum(F.col("value"), "sum_value"))
        .select(
            F.col("w.start").alias("bucket_start"),
            F.col("w.end").alias("bucket_end"),
            "n",
            "sum_value",
        )
    )


def sliding_window_agg(t) -> DataFrame:
    """2-hour windows sliding by 1 hour — each event contributes to
    exactly two windows (the windowing fan-out is the plan's only row
    expansion; the shuffle key is the window start)."""
    w = F.window(F.col("ts"), "2 hours", "1 hour")
    return (
        t["events"]
        .groupBy(w.alias("w"))
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("bucket_start"),
            F.col("w.end").alias("bucket_end"),
            "n",
        )
    )


def session_window_agg(t) -> DataFrame:
    """Per-user session windows with a 5-minute inactivity gap:
    session end = last event + gap (Spark ``session_window``
    semantics; the DuckDB oracle reproduces them with a lag-based
    islands computation)."""
    w = F.session_window(F.col("ts"), "5 minutes")
    return (
        t["events"]
        .groupBy("user_id", w.alias("w"))
        .agg(F.count("*").alias("n"), _dsum(F.col("value"), "sum_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n",
            "sum_value",
        )
    )
