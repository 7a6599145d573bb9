"""Static schemas for the storm-report data model.

Mirrors the reference's code-declared Go structs (reference
internal/domain/event.go:11-89): all-string raw CSV records, a Kafka
message envelope, and the nested enriched ``StormEvent`` contract.
"""

from __future__ import annotations

from pyspark.sql import types as T

#: Raw SPC CSV row shipped as flat JSON — all 11 fields are strings;
#: numeric parsing (with unparseable→0.0 semantics) is the engine's
#: job (reference internal/domain/event.go:11-23).
RAW_CSV_SCHEMA = T.StructType(
    [
        T.StructField("Time", T.StringType()),
        T.StructField("Size", T.StringType()),
        T.StructField("F_Scale", T.StringType()),
        T.StructField("Speed", T.StringType()),
        T.StructField("Location", T.StringType()),
        T.StructField("County", T.StringType()),
        T.StructField("State", T.StringType()),
        T.StructField("Lat", T.StringType()),
        T.StructField("Lon", T.StringType()),
        T.StructField("Comments", T.StringType()),
        T.StructField("EventType", T.StringType()),
    ]
)

#: Kafka message envelope (reference internal/domain/event.go:26-35).
#: In Structured Streaming the Kafka source exposes these columns
#: natively; this schema exists for file-based test streams that fake
#: the envelope.
RAW_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("headers", T.MapType(T.StringType(), T.StringType())),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
    ]
)

GEO_SCHEMA = T.StructType(
    [
        T.StructField("lat", T.DoubleType()),
        T.StructField("lon", T.DoubleType()),
    ]
)

MEASUREMENT_SCHEMA = T.StructType(
    [
        T.StructField("magnitude", T.DoubleType()),
        T.StructField("unit", T.StringType()),
        T.StructField("severity", T.StringType()),  # nullable
    ]
)

LOCATION_SCHEMA = T.StructType(
    [
        T.StructField("raw", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("distance", T.DoubleType()),  # nullable
        T.StructField("direction", T.StringType()),  # nullable
        T.StructField("state", T.StringType()),
        T.StructField("county", T.StringType()),
    ]
)

#: Enriched event — the sink wire contract
#: (reference internal/domain/event.go:76-89).
STORM_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("geo", GEO_SCHEMA),
        T.StructField("measurement", MEASUREMENT_SCHEMA),
        T.StructField("event_time", T.TimestampType()),
        T.StructField("location", LOCATION_SCHEMA),
        T.StructField("comments", T.StringType()),
        T.StructField("source_office", T.StringType()),
        T.StructField("time_bucket", T.TimestampType()),
        T.StructField("processed_at", T.TimestampType()),
    ]
)

#: Synthetic star-schema tables used by the correctness/bench harness.
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_tables(spark, sf_dir: str, names=TESTDATA_TABLES):
    """Read the synthetic parquet tables as a dict of DataFrames.

    Plain ``spark.read.parquet`` so Catalyst gets pushdown/pruning on
    the scans; no caching here — callers decide persistence.
    """
    return {name: spark.read.parquet(f"{sf_dir}/{name}.parquet") for name in names}
