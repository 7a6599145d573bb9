"""Config parsing (reference internal/config/config_test.go style) and
validation-harness tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from storm_data_etl_service_spark.config import Config
from storm_data_etl_service_spark.functions.enrich import enrich, flatten
from storm_data_etl_service_spark.operators.validate import (
    check_etl_integrity,
    check_record_compare,
    check_schema_alignment,
    check_source_parity,
)
from storm_data_etl_service_spark.sources.storm_fixture import (
    FROZEN_CLOCK,
    spark_fixture_df,
)


# --- config ------------------------------------------------------------------

def test_config_defaults():
    cfg = Config.load(env={})
    assert cfg.kafka_brokers == ["kafka:9092"]
    assert cfg.kafka_source_topic == "raw-weather-reports"
    assert cfg.kafka_sink_topic == "transformed-weather-data"
    assert cfg.batch_size == 50
    assert cfg.batch_flush_interval_ms == 500
    assert cfg.shutdown_timeout_ms == 10_000


@pytest.mark.parametrize(
    "env,err",
    [
        ({"BATCH_SIZE": "0"}, "BATCH_SIZE"),
        ({"BATCH_SIZE": "1001"}, "BATCH_SIZE"),
        ({"BATCH_FLUSH_INTERVAL": "abc"}, "BATCH_FLUSH_INTERVAL"),
        ({"KAFKA_BROKERS": " , "}, "KAFKA_BROKERS"),
        ({"LOG_LEVEL": "loud"}, "LOG_LEVEL"),
        ({"SHUTDOWN_TIMEOUT": "-5s"}, "SHUTDOWN_TIMEOUT"),
    ],
)
def test_config_validation_errors(env, err):
    with pytest.raises(ValueError, match=err):
        Config.load(env=env)


def test_config_parsing_and_spark_mapping():
    cfg = Config.load(
        env={
            "KAFKA_BROKERS": "b1:9092, b2:9092",
            "BATCH_SIZE": "200",
            "BATCH_FLUSH_INTERVAL": "2s",
        }
    )
    assert cfg.kafka_brokers == ["b1:9092", "b2:9092"]
    opts = cfg.kafka_source_options()
    assert opts["maxOffsetsPerTrigger"] == "200"
    assert opts["kafka.bootstrap.servers"] == "b1:9092,b2:9092"
    assert cfg.trigger == {"processingTime": "2000 milliseconds"}
    assert cfg.kafka_sink_options()["kafka.acks"] == "all"


# --- validation harness ------------------------------------------------------

@pytest.fixture(scope="module")
def enriched(spark):
    return enrich(
        spark_fixture_df(spark), processed_at=F.lit(FROZEN_CLOCK).cast("timestamp")
    ).cache()


def test_source_parity_detects_injected_diff(spark):
    a = spark.range(10).withColumnRenamed("id", "k")
    b = a.filter(F.col("k") != 7)
    rep = check_source_parity(a, b)
    assert not rep.passed
    assert rep.violations == {"rows_only_in_a": 1, "rows_only_in_b": 0}
    assert check_source_parity(a, a).passed


def test_etl_integrity_clean_and_dirty(spark, enriched):
    raw = spark_fixture_df(spark)
    keys = raw.select(
        F.when(
            F.col("EventType").isin("hail", "wind", "tornado"), F.col("EventType")
        )
        .otherwise("")
        .alias("event_type"),
        F.col("State").alias("state"),
    )
    etl_keys = enriched.select("event_type", F.col("location.state").alias("state"))
    rep = check_etl_integrity(keys, etl_keys, enriched)
    assert rep.passed, rep.violations
    # drop a type from the ETL side -> missing + parity violations
    broken = enriched.filter(F.col("event_type") != "tornado")
    rep2 = check_etl_integrity(
        keys, etl_keys.filter(F.col("event_type") != "tornado"), broken
    )
    assert rep2.violations["source_records_missing_from_etl"] > 0
    assert rep2.violations["per_type_count_mismatches"] > 0


def test_record_compare_tolerance(spark, enriched):
    flat = flatten(enriched)
    assert check_record_compare(flat, flat).passed
    # sub-tolerance perturbation passes; larger fails
    eps = flat.withColumn("geo_lat", F.col("geo_lat") + 1e-12)
    assert check_record_compare(flat, eps).passed
    off = flat.withColumn("geo_lat", F.col("geo_lat") + 0.001)
    rep = check_record_compare(flat, off)
    assert rep.violations["field_mismatch_geo_lat"] > 0


def test_schema_alignment_clean_and_dirty(spark, enriched):
    assert check_schema_alignment(enriched).passed
    # break the severity implication: severe with zero magnitude
    broken = enriched.withColumn(
        "measurement",
        F.struct(
            F.lit(0.0).alias("magnitude"),
            F.col("measurement.unit").alias("unit"),
            F.lit("severe").alias("severity"),
        ),
    )
    rep = check_schema_alignment(broken)
    assert rep.violations["severity_magnitude_implication"] > 0


def test_register_views_sql_surface(spark, sf_dir):
    """The SQL twin: registry oracle SQL (minus DuckDB-only syntax)
    runs under spark.sql against the registered views and agrees with
    the DataFrame builders."""
    from pyspark.sql import functions as F

    from storm_data_etl_service_spark.operators.registry import REGISTRY
    from storm_data_etl_service_spark.schemas import register_views

    register_views(spark, sf_dir)
    # a portable-ANSI oracle: Q5 star join runs verbatim on Spark SQL
    sql = REGISTRY["tpch_q5_regional_revenue"].oracle
    via_sql = {
        r["n_name"]: r["revenue"] for r in spark.sql(sql).collect()
    }
    via_df = {
        r["n_name"]: r["revenue"]
        for r in REGISTRY["tpch_q5_regional_revenue"].build(spark, sf_dir).collect()
    }
    assert via_sql == via_df
    # and a grouped-count query
    sql2 = REGISTRY["q1_group_count"].oracle
    assert spark.sql(sql2).count() == REGISTRY["q1_group_count"].build(spark, sf_dir).count()
