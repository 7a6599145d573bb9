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


#: Columns stored as parquet TIMESTAMP(NANOS) in the synthetic tables.
#: Spark has no nanosecond timestamp type; we read them as raw int64
#: (``nanosAsLong``) and truncate to microseconds — *integer* division,
#: because double division would round where DuckDB truncates.
_NANO_TS_COLUMNS = {"events": ("ts",)}


#: Dimension tables that never benefit from a bench-mode fan-out.
_SMALL_TABLES = {"region", "nation", "supplier", "part", "customer"}

#: Fan-out key per fact table: hash-repartitioning on a deterministic
#: key instead of round-robin (a) skips the per-row local sort every
#: round-robin exchange pays (``spark.sql.execution.sortBeforeRepartition``
#: — needed there so retried map tasks reproduce the same row→partition
#: assignment; hash of a stored column is retry-deterministic for free),
#: which runs in the SERIAL single-row-group scan stage of the bench
#: files, and (b) leaves the table hash-clustered on its natural key so
#: downstream aggregations/joins/windows keyed the same way satisfy
#: their distribution requirement without a second exchange.
_REPARTITION_KEYS = {
    "lineitem": "l_orderkey",
    "orders": "o_orderkey",
    "events": "user_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}


def _read_table(spark, sf_dir: str, name: str):
    import os

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    types = {f.name: f.dataType for f in df.schema.fields}
    for c in _NANO_TS_COLUMNS.get(name, ()):
        # Only applies when the generator wrote TIMESTAMP(NANOS) read as
        # int64; newer data writes micros and needs no conversion.
        if isinstance(types.get(c), T.LongType):
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    ntz = [f.name for f in df.schema.fields if isinstance(f.dataType, T.TimestampNTZType)]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    # The synthetic tables are single-file/single-row-group parquet, so
    # a scan yields ONE input partition and serializes the scan stage.
    # SPARK_GRAFT_SCAN_PARTITIONS opts into a post-scan repartition for
    # local benchmarking; real multi-file datasets parallelize at the
    # scan and don't need (or want) this extra shuffle.
    # SPARK_GRAFT_FANOUT picks the fan-out layout: "key" (default)
    # hash-clusters each fact table on its natural key — the layout a
    # production deployment would write the tables in — while
    # "roundrobin" leaves them unclustered (the r1–r6 fixture shape).
    # The bench protocol block names the active layout so the
    # measured numbers carry their layout assumption explicitly: the
    # key-clustered read removes the downstream exchange that an
    # unclustered 100 TB parquet layout would pay.
    scan_parts = int(os.environ.get("SPARK_GRAFT_SCAN_PARTITIONS", "0"))
    if scan_parts > 0 and name not in _SMALL_TABLES:
        fanout = os.environ.get("SPARK_GRAFT_FANOUT", "key")
        key = _REPARTITION_KEYS.get(name) if fanout == "key" else None
        df = df.repartition(scan_parts, F.col(key)) if key else df.repartition(scan_parts)
    return df


class LazyTables(dict):
    """Dict of table-name → DataFrame, read on first access so a query
    only pays schema/IO setup for the tables it actually touches."""

    def __init__(self, spark, sf_dir: str, names=TESTDATA_TABLES):
        super().__init__()
        self._spark = spark
        self._sf_dir = sf_dir
        self._names = set(names)

    def __missing__(self, name):
        if name not in self._names:
            raise KeyError(name)
        df = _read_table(self._spark, self._sf_dir, name)
        self[name] = df
        return df


def ensure_session_confs(spark) -> None:
    """Pin the runtime confs the engine's semantics depend on.

    Called from every query builder because the grading driver runs
    them under ITS OWN SparkSession: a non-UTC session timezone would
    shift every collected timestamp against the (naive, UTC) DuckDB
    oracle, and nano-parquet reads fail without ``nanosAsLong``.
    All three are runtime-settable SQL confs.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")


def load_tables(spark, sf_dir: str, names=TESTDATA_TABLES):
    """Lazily read the synthetic parquet tables as a dict of DataFrames.

    Plain ``spark.read.parquet`` so Catalyst gets pushdown/pruning on
    the scans; no caching here — callers decide persistence.  Two
    timestamp normalizations (cheap projections on top of the scan):

    * TIMESTAMP(NANOS) columns arrive as int64 via ``nanosAsLong`` and
      are truncated to microsecond timestamps;
    * TIMESTAMP_NTZ columns (parquet ``isAdjustedToUTC=false``) are
      cast to TimestampType — the session TZ is pinned UTC, so wall
      values are unchanged and all engine surfaces use one type.
    """
    ensure_session_confs(spark)
    return LazyTables(spark, sf_dir, names)


def register_views(spark, sf_dir: str, names=TESTDATA_TABLES) -> None:
    """Register every synthetic table as a temp view so the whole
    engine surface is drivable from plain ``spark.sql`` — the ANSI-SQL
    twin of ``load_tables`` (temp views over lazy scans: Catalyst still
    sees the parquet relation, so pushdown/pruning are unaffected).

    This is the "switch path" for users coming from a SQL-first stack:
    every query in the registry has a documented SQL equivalent (its
    DuckDB oracle), and most run verbatim under Spark SQL against
    these views.
    """
    tables = load_tables(spark, sf_dir, names)
    for name in names:
        tables[name].createOrReplaceTempView(name)
