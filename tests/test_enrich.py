"""Per-operator enrichment tests mirroring the reference's table-driven
unit tests (reference internal/domain/transform_test.go) plus the
golden-record spot check (reference
internal/integration/kafka_pipeline_test.go:144-153)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from storm_data_etl_service_spark.functions.enrich import enrich
from storm_data_etl_service_spark.sources.storm_fixture import (
    BASE_TS,
    FROZEN_CLOCK,
    spark_fixture_df,
)


@pytest.fixture(scope="module")
def enriched(spark):
    df = enrich(spark_fixture_df(spark), processed_at=F.lit(FROZEN_CLOCK).cast("timestamp"))
    rows = df.collect()
    return {r["id"]: r for r in rows}, rows


def test_golden_first_hail_record(enriched):
    by_id, _ = enriched
    r = by_id["hail-5d91dda0f56ba124"]
    assert r["event_type"] == "hail"
    assert r["geo"]["lat"] == 31.02 and r["geo"]["lon"] == -98.44
    assert r["measurement"]["magnitude"] == 1.25
    assert r["measurement"]["unit"] == "in"
    assert r["measurement"]["severity"] == "moderate"
    assert r["event_time"] == datetime(2024, 4, 26, 15, 10)
    assert r["location"]["raw"] == "8 ESE Chappel"
    assert r["location"]["name"] == "Chappel"
    assert r["location"]["distance"] == 8.0
    assert r["location"]["direction"] == "ESE"
    assert r["location"]["state"] == "TX"
    assert r["location"]["county"] == "San Saba"
    assert r["source_office"] == "SJT"
    assert r["time_bucket"] == datetime(2024, 4, 26, 15, 0)
    assert r["processed_at"] == FROZEN_CLOCK


def _by_office(rows, office):
    # helper: fixture comments embed a unique office code per row
    out = [r for r in rows if r["comments"].find(f"({office})") >= 0]
    return out


def test_severity_boundaries(enriched):
    _, rows = enriched
    sev = {
        (r["event_type"], r["measurement"]["magnitude"]): r["measurement"]["severity"]
        for r in rows
    }
    # hail thresholds 0.75 / 1.5 / 2.5 (rescaled from hundredths)
    assert sev[("hail", 0.74)] == "minor"
    assert sev[("hail", 0.75)] == "moderate"
    assert sev[("hail", 1.5)] == "severe"
    assert sev[("hail", 2.5)] == "extreme"
    assert sev[("hail", 3.0)] == "extreme"
    # wind thresholds 50 / 74 / 96
    assert sev[("wind", 49.0)] == "minor"
    assert sev[("wind", 50.0)] == "moderate"
    assert sev[("wind", 74.0)] == "severe"
    assert sev[("wind", 96.0)] == "extreme"
    # tornado ladder <=1 / ==2 / <=4 / else
    assert sev[("tornado", 1.0)] == "minor"
    assert sev[("tornado", 2.0)] == "moderate"
    assert sev[("tornado", 4.0)] == "severe"
    assert sev[("tornado", 5.0)] == "extreme"


def test_unk_magnitude_is_zero_null_severity(enriched):
    _, rows = enriched
    unk_tornado = [r for r in rows if r["location"]["county"] == "Pittsburg"][0]
    assert unk_tornado["measurement"]["magnitude"] == 0.0
    assert unk_tornado["measurement"]["severity"] is None
    assert unk_tornado["measurement"]["unit"] == "f_scale"


def test_magnitude_rescale_only_hundredths(enriched):
    _, rows = enriched
    mags = {r["location"]["raw"]: r["measurement"]["magnitude"] for r in rows if r["event_type"] == "hail"}
    assert mags["8 ESE Chappel"] == 1.25  # 125 hundredths -> inches
    assert mags["2 N Austin"] == 1.25  # already inches, untouched
    assert mags["Waco"] == 0.75  # boundary 75 -> 0.75


def test_hhmm_parsing(enriched):
    _, rows = enriched
    times = {r["location"]["raw"]: r["event_time"] for r in rows}
    assert times["Anthon"] == datetime(2024, 4, 26, 9, 30)  # "930" zero-padded
    assert times["Hays"] == BASE_TS  # hour 25 invalid
    assert times["Colby"] == BASE_TS  # minute 99 invalid
    assert times["Goodland"] == BASE_TS  # empty time
    assert times["6 NNE Paris"] == datetime(2024, 4, 26, 15, 10)  # RFC 3339


def test_unknown_event_type(enriched):
    _, rows = enriched
    flood = [r for r in rows if r["location"]["raw"] == "Reno"][0]
    assert flood["event_type"] == ""
    assert "-" not in flood["id"] and len(flood["id"]) == 16
    assert flood["measurement"]["unit"] == ""
    assert flood["measurement"]["magnitude"] == 0.0
    assert flood["measurement"]["severity"] is None


def test_source_office_regex(enriched):
    _, rows = enriched
    offices = {r["location"]["raw"]: r["source_office"] for r in rows}
    assert offices["8 ESE Chappel"] == "SJT"
    assert offices["Fargo"] == ""  # lowercase rejected
    assert offices["Minot"] == ""  # not at end of string
    assert offices["Bismarck"] == ""  # 2 letters too short


def test_location_parse(enriched):
    _, rows = enriched
    locs = {r["location"]["raw"]: r["location"] for r in rows}
    austin = locs["5.2 NW AUSTIN"]
    assert (austin["name"], austin["distance"], austin["direction"]) == ("AUSTIN", 5.2, "NW")
    anthon = locs["Anthon"]
    assert (anthon["name"], anthon["distance"], anthon["direction"]) == ("Anthon", None, None)
    empty = locs[""]
    assert (empty["name"], empty["distance"], empty["direction"]) == ("", None, None)
    amarillo = locs["10.5 WSW Amarillo"]
    assert (amarillo["name"], amarillo["distance"], amarillo["direction"]) == (
        "Amarillo", 10.5, "WSW",
    )


def test_bad_coords_zero(enriched):
    _, rows = enriched
    bad = [r for r in rows if r["location"]["raw"] == "Pierre"][0]
    assert bad["geo"]["lat"] == 0.0 and bad["geo"]["lon"] == 0.0


def test_id_determinism_and_uniqueness(spark):
    df1 = enrich(spark_fixture_df(spark), processed_at=F.lit(FROZEN_CLOCK).cast("timestamp"))
    df2 = enrich(spark_fixture_df(spark), processed_at=F.lit(FROZEN_CLOCK).cast("timestamp"))
    ids1 = sorted(r["id"] for r in df1.select("id").collect())
    ids2 = sorted(r["id"] for r in df2.select("id").collect())
    assert ids1 == ids2
    assert len(set(ids1)) == len(ids1)


def test_time_bucket_hour_truncation(enriched):
    _, rows = enriched
    buckets = {r["location"]["raw"]: r["time_bucket"] for r in rows}
    assert buckets["8 ESE Chappel"] == datetime(2024, 4, 26, 15, 0)
    assert buckets["Anthon"] == datetime(2024, 4, 26, 9, 0)
    assert buckets["Goodland"] == datetime(2024, 4, 26, 0, 0)


def test_no_udfs_in_plan(spark):
    """The enrichment chain must be expression-only (WholeStageCodegen)."""
    df = enrich(spark_fixture_df(spark))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
