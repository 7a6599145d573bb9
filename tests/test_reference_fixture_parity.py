"""Behavior parity against the reference's own 271-record golden
fixture (reference data/mock/storm_reports_240426_combined.json —
raw SPC reports for 2024-04-26).

Mirrors the assertions of reference
internal/pipeline/mock_data_test.go:21-57 (per-type counts 79 hail /
149 tornado / 43 wind, unit domains, ID prefixes, state/county
passthrough) and internal/integration/kafka_pipeline_test.go:248-271
(golden first-hail record).  Skipped when the reference checkout is
not present — the in-repo edge-case fixture (sources/storm_fixture.py)
covers the same transform matrix either way.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

REF_FIXTURE = "/root/reference/data/mock/storm_reports_240426_combined.json"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_FIXTURE), reason="reference fixture not available"
)


@pytest.fixture(scope="module")
def enriched(spark):
    from storm_data_etl_service_spark.functions.enrich import enrich
    from storm_data_etl_service_spark.schemas import RAW_CSV_SCHEMA, ensure_session_confs
    from storm_data_etl_service_spark.sources.storm_fixture import BASE_TS, FROZEN_CLOCK

    ensure_session_confs(spark)
    raw = (
        spark.read.option("multiLine", True)
        .schema(RAW_CSV_SCHEMA)
        .json(REF_FIXTURE)
        .withColumn("kafka_timestamp", F.lit(BASE_TS).cast("timestamp"))
    )
    df = enrich(raw, processed_at=F.lit(FROZEN_CLOCK).cast("timestamp"))
    df.cache()
    yield df
    df.unpersist()


def test_per_type_counts(enriched):
    counts = {r["event_type"]: r["count"] for r in enriched.groupBy("event_type").count().collect()}
    assert counts == {"hail": 79, "tornado": 149, "wind": 43}


def test_units_per_type(enriched):
    units = {
        (r["event_type"], r["measurement"]["unit"])
        for r in enriched.select("event_type", "measurement").collect()
    }
    assert units == {("hail", "in"), ("tornado", "f_scale"), ("wind", "mph")}


def test_id_prefix_invariant(enriched):
    bad = enriched.filter(
        ~F.col("id").startswith(F.concat(F.col("event_type"), F.lit("-")))
    ).count()
    assert bad == 0
    # 16 hex chars after the type prefix
    malformed = enriched.filter(
        ~F.col("id").rlike(r"^(hail|wind|tornado)-[0-9a-f]{16}$")
    ).count()
    assert malformed == 0


def test_golden_first_hail_record(enriched):
    row = enriched.filter(F.col("id") == "hail-5d91dda0f56ba124").collect()
    assert len(row) == 1
    r = row[0]
    assert r["event_type"] == "hail"
    assert r["measurement"]["magnitude"] == 1.25
    assert r["measurement"]["unit"] == "in"
    assert r["measurement"]["severity"] == "moderate"
    assert r["source_office"] == "SJT"
    assert r["location"]["name"] == "Chappel"
    assert r["location"]["distance"] == 8.0
    assert r["location"]["direction"] == "ESE"
    assert r["location"]["state"] == "TX"
    assert r["location"]["county"] == "San Saba"
    assert r["time_bucket"].isoformat().startswith("2024-04-26T15:00:00")


def test_magnitude_severity_crossfield(enriched):
    # mag > 0 <=> severity non-null, for known types (reference
    # cmd/validate/main.go:520-538)
    viol = enriched.filter(
        (F.col("measurement.magnitude") > 0)
        != F.col("measurement.severity").isNotNull()
    ).count()
    assert viol == 0


def test_state_county_passthrough(enriched):
    assert enriched.filter(F.col("location.state") == "").count() == 0
    assert enriched.filter(F.col("location.county") == "").count() == 0
