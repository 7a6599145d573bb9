"""Structured-Streaming ETL pipeline: the reference's Kafka→Kafka
micro-batch loop (reference internal/pipeline/pipeline.go:63-159,
operators D1-D9 in SURVEY.md §2.3) on Spark's streaming engine.

Semantics mapping:

* D1 micro-batch driver    → the Structured Streaming engine itself
  (trigger interval ≙ BATCH_FLUSH_INTERVAL, maxOffsetsPerTrigger ≙
  BATCH_SIZE);
* D2 poison-pill routing   → corrupt-record split in ``foreachBatch``:
  malformed records are counted and written to a dead-letter sink,
  the batch continues, and the checkpoint advances past them —
  exactly the reference's warn-log + skip + commit policy
  (reference docs/Architecture.md:110-114);
* D3 commit-after-load     → checkpoint WAL/commit-log ordering: the
  offset range is committed only after the batch's sink write
  returns, giving the same at-least-once contract;
* D8 idempotent replay     → deterministic IDs (P5) + first-wins
  dedup by (id, arrival order) inside each batch; cross-batch
  replays are absorbed downstream by the deterministic IDs, the
  reference's own design (docs/Architecture.md:99-102);
* D6 readiness / D9 metrics→ foreachBatch-updated counters
  (consumed/produced/errors) with a readiness latch that flips after
  the first successful batch;
* D7 graceful shutdown     → ``stop()`` on the query handle drains
  the in-flight batch before returning.

The enrichment applied per batch is the *same* expression-only
``enrich()`` used in batch mode — nothing is reimplemented.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from storm_data_etl_service_spark.functions.enrich import (
    enrich,
    flatten,
    parse_raw_events,
)
from storm_data_etl_service_spark.schemas import RAW_EVENT_SCHEMA


def kafka_source(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    batch_size: int = 50,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """S1 — Kafka micro-batch source (reference
    internal/adapter/kafka/reader.go:22-72): consumer-group reads,
    earliest start, per-trigger batch bound."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("maxOffsetsPerTrigger", str(batch_size))
        .option("includeHeaders", "true")
        .load()
    )


def file_source(spark: SparkSession, path: str) -> DataFrame:
    """File-based test source: JSON-lines files of Kafka-envelope rows
    (one micro-batch per trigger).  Lets the D2/D3/D8 semantics be
    exercised without a broker."""
    return spark.readStream.schema(RAW_EVENT_SCHEMA).json(path)


def split_poison(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """D2 — parse the envelope payload and fork valid / dead-letter."""
    return split_parsed(parse_raw_events(raw))


def split_parsed(parsed: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Fork an already-parsed envelope frame into valid / dead-letter
    (factored out so ``_process_batch`` can persist the parse once and
    derive both forks from the cache — single parse per micro-batch)."""
    poison = parsed.filter(F.col("is_poison")).select(
        F.col("value").cast("string").alias("raw_value"),
        "topic",
        "partition",
        "offset",
        "timestamp",
    )
    valid = (
        parsed.filter(~F.col("is_poison"))
        .select(
            "parsed.*",
            F.col("timestamp").alias("kafka_timestamp"),
            F.col("offset").alias("kafka_offset"),
        )
        .drop("_corrupt_record")
    )
    return valid, poison


def dedup_stream_within_watermark(
    enriched: DataFrame, event_time_col: str = "event_time", delay: str = "1 hour"
) -> DataFrame:
    """D8 (cross-batch) — streaming dedup by deterministic ID with
    bounded state: replays arriving within the watermark delay are
    dropped by the engine's dedup state store; older replays fall
    through to the reference's own downstream answer (idempotent IDs,
    docs/Architecture.md:99-102).  State size is bounded by the
    watermark — the requirement for an unbounded stream."""
    return enriched.withWatermark(event_time_col, delay).dropDuplicatesWithinWatermark(
        ["id"]
    )


def dedup_first_wins(enriched: DataFrame, order_col: str = "kafka_offset") -> DataFrame:
    """D8 — deterministic first-wins dedup by id: rank by the explicit
    arrival-order column (the reference's 'first occurrence' is file
    order, which does not exist under parallelism — SURVEY.md §7)."""
    w = Window.partitionBy("id").orderBy(F.col(order_col).asc())
    return (
        enriched.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )


def kafka_sink_frame(enriched: DataFrame) -> DataFrame:
    """S3/S5 — shape the enriched event for the Kafka sink: key = id,
    value = byte-exact Go-marshaled wire JSON (declaration key order +
    full ``omitempty`` semantics incl. empty-string ``comments``/
    ``source_office``, see functions/wire.py), headers event_type +
    processed_at (reference internal/adapter/kafka/writer.go:55-68)."""
    from storm_data_etl_service_spark.functions.wire import storm_wire_json

    payload = storm_wire_json(enriched)
    headers = F.array(
        F.struct(F.lit("event_type").alias("key"), F.col("event_type").cast("binary").alias("value")),
        F.struct(
            F.lit("processed_at").alias("key"),
            F.date_format("processed_at", "yyyy-MM-dd'T'HH:mm:ssX").cast("binary").alias("value"),
        ),
    )
    return enriched.select(
        F.col("id").cast("binary").alias("key"),
        payload.alias("value"),
        headers.alias("headers"),
    )


@dataclass
class PipelineMetrics:
    """D6/D9 — consumed/produced/error counters + readiness latch
    (reference internal/observability/metrics.go:20-66,
    pipeline.go:37-60).  Updated from ``foreachBatch`` after each
    batch's sink write returns, so ``ready`` flips exactly when the
    reference's atomic readiness bool does: after the first
    successfully processed batch (reference pipeline.go:116)."""

    consumed: int = 0
    produced: int = 0
    transform_errors: int = 0
    batches: int = 0
    ready: bool = False
    _lock: threading.Lock = field(default_factory=threading.Lock, repr=False)

    def record_batch(self, consumed: int, produced: int, errors: int) -> None:
        with self._lock:
            self.consumed += consumed
            self.produced += produced
            self.transform_errors += errors
            self.batches += 1
            self.ready = True


class StormStreamPipeline:
    """The end-to-end pipeline: source → parse/split → enrich →
    first-wins dedup → sink + dead-letter, with metrics.

    ``sink_writer(df, batch_id)`` and ``dlq_writer(df, batch_id)`` are
    injected (parquet dir, Kafka frame, memory table...) mirroring the
    reference's consumer-defined Extractor/Loader interfaces
    (reference internal/pipeline/pipeline.go:16-28) that made its
    pipeline unit-testable.
    """

    def __init__(
        self,
        raw_stream: DataFrame,
        sink_writer,
        dlq_writer=None,
        metrics: PipelineMetrics | None = None,
        processed_at=None,
    ):
        self.raw_stream = raw_stream
        self.sink_writer = sink_writer
        self.dlq_writer = dlq_writer
        self.metrics = metrics or PipelineMetrics()
        self.processed_at = processed_at

    def _process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """Single-pass micro-batch kernel: the raw envelope is parsed
        ONCE into a persisted frame (poison count + DLQ write are cache
        scans, not re-parses), and the produced count piggybacks on the
        sink write itself via ``DataFrame.observe`` — exactly one
        enrich+dedup execution per batch, no standalone ``.count()``
        actions recomputing the plan (the reference counts in-process
        for free, internal/pipeline/pipeline.go:104-153)."""
        from pyspark.sql import Observation

        parsed = parse_raw_events(batch_df).persist()
        try:
            valid, poison = split_parsed(parsed)
            n_poison = poison.count()  # cache scan — parse ran once above
            if n_poison and self.dlq_writer is not None:
                self.dlq_writer(poison, batch_id)
            enriched = enrich(
                valid, processed_at=self.processed_at, passthrough=("kafka_offset",)
            )
            deduped = dedup_first_wins(enriched).drop("kafka_offset")
            obs = Observation(f"sink_batch_{batch_id}")
            observed = deduped.observe(obs, F.count(F.lit(1)).alias("n_out"))
            self.sink_writer(observed, batch_id)
            n_out = obs.get["n_out"]
        finally:
            parsed.unpersist()
        self.metrics.record_batch(
            consumed=n_out + n_poison, produced=n_out, errors=n_poison
        )

    def start(
        self,
        checkpoint_dir: str,
        trigger: dict | None = None,
        query_name: str = "storm_etl",
    ):
        """Run the stream; D3 at-least-once comes from the checkpoint:
        offsets WAL'd before the batch, committed after the sink write
        (our ``foreachBatch`` raises on sink failure, so the offset
        range is retried — never skipped)."""
        writer = (
            self.raw_stream.writeStream.queryName(query_name)
            .option("checkpointLocation", checkpoint_dir)
            .foreachBatch(self._process_batch)
        )
        trigger = trigger or {"availableNow": True}
        return writer.trigger(**trigger).start()


def retry_with_backoff(
    fn,
    base_ms: int = 200,
    cap_ms: int = 5000,
    max_attempts: int = 6,
    sleep=None,
):
    """D4 — exponential backoff: 200 ms → ×2 → cap 5 s, reset on
    success (reference internal/pipeline/pipeline.go:68-71,164-173).

    Spark already retries *tasks* (``spark.task.maxFailures``); this
    wraps driver-side sink calls in ``foreachBatch`` where the
    reference's extract/load retry loop lives.  Returns a wrapped
    callable with the same signature."""
    import time as _time

    do_sleep = sleep or _time.sleep

    def wrapped(*args, **kwargs):
        delay = base_ms
        for attempt in range(max_attempts):
            try:
                return fn(*args, **kwargs)
            except Exception:
                if attempt == max_attempts - 1:
                    raise
                do_sleep(delay / 1000.0)
                delay = min(delay * 2, cap_ms)

    return wrapped


def stop_gracefully(query, timeout_ms: int = 10_000) -> bool:
    """D7 — graceful shutdown: drain the in-flight micro-batch within
    the deadline, then stop (reference cmd/etl/main.go:37-68,
    SHUTDOWN_TIMEOUT).  Returns True if the query terminated inside
    the deadline."""
    query.stop()
    return query.awaitTermination(timeout_ms / 1000.0)


def parquet_sink(out_dir: str):
    """Simple exactly-once-per-batch parquet sink for tests/batch jobs."""

    def write(df: DataFrame, batch_id: int) -> None:
        flatten(df).write.mode("append").parquet(out_dir)

    return write


def parquet_dlq(dlq_dir: str):
    def write(df: DataFrame, batch_id: int) -> None:
        df.write.mode("append").parquet(dlq_dir)

    return write


def incremental_dedup_batch_fn(index_dir: str, matches_dir: str):
    """foreachBatch kernel for STREAMING corpus dedup against a
    persisted LSH index — the production loop around
    ``operators.dedup.dedup_incremental_minhash``:

    per micro-batch of documents (doc_id, text):
      1. compute the batch's (doc_id, band, key) LSH rows (map-only);
      2. shuffle-join them against the parquet index accumulated by
         every PREVIOUS batch → candidate matches (new doc, old doc),
         PLUS a self-join of the batch's own bands → earlier-in-batch
         matches (matched_doc_id < doc_id) — the same contract as
         ``dedup_incremental_minhash``, so a duplicate pair arriving
         inside one micro-batch is still caught;
      3. append matches to ``matches_dir`` and the batch's own band
         keys to ``index_dir`` — so later batches (and later runs:
         the index is durable) dedup against everything before them.

    The index read is gated on an explicit filesystem existence check
    (Hadoop FS, so any supported scheme works), NOT a blanket except:
    a corrupt or transiently-unreadable index raises and fails the
    batch, which the streaming checkpoint then retries — silently
    dropping that batch's matches is the one wrong outcome.

    At 100 TB the index is a bucketed table on (band, key); per-batch
    cost scales with the batch, never the corpus.  Exactly-once comes
    from the streaming checkpoint (reprocessed batches re-derive the
    same deterministic band keys; downstream consumers drop duplicate
    (doc_id, matched_doc_id) rows by key).
    """
    from pyspark.sql import functions as F

    from storm_data_etl_service_spark.operators.dedup import lsh_band_keys

    def _index_exists(spark) -> bool:
        jpath = spark._jvm.org.apache.hadoop.fs.Path(index_dir)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        return bool(fs.exists(jpath))

    def process(batch_df, batch_id: int) -> None:
        spark = batch_df.sparkSession
        bands = lsh_band_keys({"documents": batch_df}).persist()
        try:
            # within-batch: earlier-in-batch partner wins, i.e. the
            # matched_doc_id < doc_id contract of
            # dedup_incremental_minhash — so a duplicate pair arriving
            # in ONE micro-batch is caught, not just across batches
            matches = (
                bands.select("band", "key", F.col("doc_id").alias("matched_doc_id"))
                .join(bands, ["band", "key"])
                .filter(F.col("matched_doc_id") < F.col("doc_id"))
                .select("doc_id", "matched_doc_id")
            )
            if _index_exists(spark):
                # cross-batch: anything already indexed is from an
                # earlier batch — a valid partner regardless of id order
                matches = matches.unionByName(
                    spark.read.parquet(index_dir)
                    .withColumnRenamed("doc_id", "matched_doc_id")
                    .join(bands, ["band", "key"])
                    .filter(F.col("matched_doc_id") != F.col("doc_id"))
                    .select("doc_id", "matched_doc_id")
                )
            matches.distinct().write.mode("append").parquet(matches_dir)
            bands.write.mode("append").parquet(index_dir)
        finally:
            bands.unpersist()

    return process


def bloom_gate_batch_fn(bits_dir: str, verdicts_dir: str):
    """foreachBatch kernel for the STREAMING Bloom membership gate —
    the production loop around ``operators.dedup.bloom_dedup_report``:

    per micro-batch of documents (doc_id, text):
      1. hash each document's content and derive its k Bloom bit
         positions (map-only);
      2. probe the durable bit set accumulated by every previous
         batch → ``bloom_hit`` (all k bits present: possibly seen —
         the exact confirm happens downstream against the content
         store, which a Bloom gate exists to avoid hitting for the
         definitely-new majority);
      3. catch exact duplicates WITHIN the batch via a self-join on
         the content hash (``dup_of_in_batch`` = earliest partner),
         since the index only covers batches before this one;
      4. write verdicts to a batch_id-keyed partition directory and
         append the batch's distinct new bits to the index — later
         batches (and later runs: the bits are durable) gate against
         everything before them.

    The index read is gated on a filesystem existence check, not a
    blanket except (same rationale as ``incremental_dedup_batch_fn``:
    a transiently-unreadable index must fail-and-retry the batch, not
    silently pass everything as new).  State is O(m bits) forever —
    the whole point versus the LSH index's per-document rows; at
    100 TB the (bit) relation compacts to an m/8-byte bitmap merged
    by OR and broadcast to executors.  Checkpoint retries are
    REPLAY-STABLE on both relations: each writes (overwrite) its own
    ``batch_id=N`` partition, and the probe reads only partitions
    with ``batch_id < N`` — so a batch replayed after its bits commit
    (verdict commit failed last time) still probes exactly the
    pre-batch index and rewrites byte-identical verdicts, instead of
    flipping its own first-seen docs to ``bloom_hit`` by seeing its
    own bits.
    """
    from pyspark.sql import functions as F

    from storm_data_etl_service_spark.operators.dedup import (
        BLOOM_HASHES,
        bloom_bit_positions,
    )

    def _bits_exist(spark) -> bool:
        jpath = spark._jvm.org.apache.hadoop.fs.Path(bits_dir)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        return bool(fs.exists(jpath))

    def process(batch_df, batch_id: int) -> None:
        spark = batch_df.sparkSession
        hashed = batch_df.select(
            "doc_id", F.sha2(F.col("text"), 256).alias("h")
        ).persist()
        try:
            probes = hashed.select(
                "doc_id", F.explode(bloom_bit_positions(F.col("h"))).alias("bit")
            )
            if _bits_exist(spark):
                # ONLY earlier batches' bits: a replayed batch must not
                # probe against bits it appended itself last attempt
                idx = (
                    spark.read.parquet(bits_dir)
                    .filter(F.col("batch_id") < batch_id)
                    .select("bit")
                    .distinct()
                    .withColumn("_set", F.lit(1))
                )
                n_set = (
                    probes.join(idx, "bit", "left")
                    .groupBy("doc_id")
                    .agg(F.count("_set").alias("n_set"))
                )
            else:
                n_set = hashed.select("doc_id", F.lit(0).alias("n_set"))
            within = (
                hashed.join(
                    hashed.select(F.col("doc_id").alias("earlier_id"), "h"), "h"
                )
                .filter(F.col("earlier_id") < F.col("doc_id"))
                .groupBy("doc_id")
                .agg(F.min("earlier_id").alias("dup_of_in_batch"))
            )
            (
                hashed.join(n_set, "doc_id")
                .join(within, "doc_id", "left")
                .select(
                    "doc_id",
                    (F.col("n_set") == BLOOM_HASHES).alias("bloom_hit"),
                    "dup_of_in_batch",
                )
                .write.mode("overwrite")
                .parquet(f"{verdicts_dir}/batch_id={batch_id}")
            )
            probes.select("bit").distinct().write.mode("overwrite").parquet(
                f"{bits_dir}/batch_id={batch_id}"
            )
        finally:
            hashed.unpersist()

    return process
