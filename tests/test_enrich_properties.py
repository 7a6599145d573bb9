"""Property-based enrichment tests: hypothesis-generated raw records
run through the Spark chain and compared field-by-field against an
independent pure-Python model of the reference semantics
(reference internal/domain/transform.go).  Goes beyond the
reference's table-driven cases (SURVEY.md §5) by exploring the input
space mechanically."""

from __future__ import annotations

import hashlib
import math
import re
from datetime import datetime, timedelta

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from storm_data_etl_service_spark.functions.enrich import enrich
from storm_data_etl_service_spark.schemas import RAW_CSV_SCHEMA
from storm_data_etl_service_spark.sources.storm_fixture import BASE_TS, FROZEN_CLOCK

OFFICE_RE = re.compile(r"\(([A-Z]{3,5})\)\s*$")
LOCATION_RE = re.compile(r"^(\d+(?:\.\d+)?)\s+([NSEW]{1,3})\s+(.+)$")


# --- pure-Python model (independent re-implementation) -----------------------

def _parse_float_or_zero(s: str) -> float:
    try:
        return float(s.strip()) if s.strip() else 0.0
    except ValueError:
        return 0.0


def _fmt_g(v: float) -> str:
    return str(int(v)) if v == math.floor(v) and abs(v) < 1e15 else str(v)


def model_enrich(rec: dict, base_ts: datetime) -> dict:
    et = rec["EventType"] if rec["EventType"] in ("hail", "wind", "tornado") else ""
    if et == "hail":
        mag_str = rec["Size"].strip()
    elif et == "tornado":
        mag_str = re.sub(r"^(EF|F)", "", rec["F_Scale"].strip())
    elif et == "wind":
        mag_str = rec["Speed"].strip()
    else:
        mag_str = ""
    mag_str = mag_str.strip()
    raw_mag = 0.0 if mag_str.upper() == "UNK" else _parse_float_or_zero(mag_str)
    lat = _parse_float_or_zero(rec["Lat"])
    lon = _parse_float_or_zero(rec["Lon"])
    unit = {"hail": "in", "wind": "mph", "tornado": "f_scale"}.get(et, "")
    mag = raw_mag / 100 if (et == "hail" and unit == "in" and raw_mag >= 10) else raw_mag

    t = rec["Time"].strip()
    if t == "":
        event_time = base_ts
    else:
        try:
            event_time = datetime.strptime(t, "%Y-%m-%dT%H:%M:%SZ")
        except ValueError:
            if re.fullmatch(r"\d{3,4}", t):
                padded = t.zfill(4)
                hh, mm = int(padded[:2]), int(padded[2:])
                if hh <= 23 and mm <= 59:
                    event_time = base_ts.replace(
                        hour=hh, minute=mm, second=0, microsecond=0
                    )
                else:
                    event_time = base_ts
            else:
                event_time = base_ts

    pre = "|".join(
        [et, rec["State"], f"{lat:.4f}", f"{lon:.4f}", t, _fmt_g(raw_mag)]
    )
    digest = hashlib.sha256(pre.encode()).hexdigest()[:16]
    rec_id = digest if et == "" else f"{et}-{digest}"

    if mag == 0 or et == "":
        severity = None
    elif et == "hail":
        severity = (
            "minor" if mag < 0.75 else "moderate" if mag < 1.5
            else "severe" if mag < 2.5 else "extreme"
        )
    elif et == "wind":
        severity = (
            "minor" if mag < 50 else "moderate" if mag < 74
            else "severe" if mag < 96 else "extreme"
        )
    else:
        severity = (
            "minor" if mag <= 1 else "moderate" if mag == 2
            else "severe" if mag <= 4 else "extreme"
        )

    m = OFFICE_RE.search(rec["Comments"].strip())
    office = m.group(1) if m else ""
    lm = LOCATION_RE.match(rec["Location"])
    if lm:
        loc = (lm.group(3).strip(), float(lm.group(1)), lm.group(2))
    else:
        loc = (rec["Location"], None, None)

    return {
        "id": rec_id,
        "event_type": et,
        "lat": lat,
        "lon": lon,
        "magnitude": mag,
        "unit": unit,
        "severity": severity,
        "event_time": event_time,
        "loc_name": loc[0],
        "loc_distance": loc[1],
        "loc_direction": loc[2],
        "office": office,
        "time_bucket": event_time.replace(minute=0, second=0, microsecond=0),
    }


# --- strategies --------------------------------------------------------------

times = st.one_of(
    st.integers(0, 2500).map(lambda n: f"{n:03d}"),
    st.integers(0, 9999).map(lambda n: f"{n:04d}"),
    st.just(""),
    st.just("2024-04-26T15:10:00Z"),
    st.text(alphabet="0123456789:T-Z", min_size=1, max_size=8),
)
# plain decimals only: engines agree on shortest-form rendering in
# [0.001, 1e7), and lat/lon keep <=2 decimals so %.4f never rounds
mags = st.one_of(
    st.just(""),
    st.just("UNK"),
    st.just("unk"),
    st.integers(0, 9999).map(str),
    st.integers(1, 999).map(lambda n: f"{n/100:.2f}"),
    st.sampled_from(["EF0", "EF3", "F2", "EF5", "garbage"]),
)
coords = st.one_of(
    st.just(""),
    st.just("bad"),
    st.integers(-17999, 17999).map(lambda n: f"{n/100:.2f}"),
)
locations = st.one_of(
    st.just(""),
    st.just("Anthon"),
    st.builds(
        lambda d, c, n: f"{d} {c} {n}",
        st.integers(1, 99),
        st.sampled_from(["N", "SE", "ESE", "WSW", "NNW"]),
        st.sampled_from(["Springfield", "AUSTIN", "Ft Worth"]),
    ),
    st.text(alphabet="ABC 123.", max_size=12),
)
comments = st.one_of(
    st.just(""),
    st.just("report (SJT)"),
    st.just("report (sjt)"),
    st.just("report (TOOLONGG)"),
    st.just("(FWD) leading"),
    st.text(alphabet="abc (XYZ).", max_size=20),
)
event_types = st.sampled_from(["hail", "wind", "tornado", "flood", ""])

records = st.fixed_dictionaries(
    {
        "Time": times,
        "Size": mags,
        "F_Scale": mags,
        "Speed": mags,
        "Location": locations,
        "County": st.sampled_from(["Tarrant", "San Saba", ""]),
        "State": st.sampled_from(["TX", "OK", "NE", ""]),
        "Lat": coords,
        "Lon": coords,
        "Comments": comments,
        "EventType": event_types,
    }
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(batch=st.lists(records, min_size=1, max_size=25))
def test_enrichment_matches_model(spark, batch):
    rows = [tuple(r[c] for c in RAW_CSV_SCHEMA.fieldNames()) for r in batch]
    df = spark.createDataFrame(rows, schema=RAW_CSV_SCHEMA).withColumn(
        "kafka_timestamp", F.lit(BASE_TS).cast("timestamp")
    )
    got = enrich(df, processed_at=F.lit(FROZEN_CLOCK).cast("timestamp")).collect()
    assert len(got) == len(batch)
    for rec, row in zip(batch, got):
        exp = model_enrich(rec, BASE_TS)
        ctx = f"record={rec}"
        assert row["id"] == exp["id"], ctx
        assert row["event_type"] == exp["event_type"], ctx
        assert row["geo"]["lat"] == pytest.approx(exp["lat"]), ctx
        assert row["geo"]["lon"] == pytest.approx(exp["lon"]), ctx
        assert row["measurement"]["magnitude"] == pytest.approx(exp["magnitude"]), ctx
        assert row["measurement"]["unit"] == exp["unit"], ctx
        assert row["measurement"]["severity"] == exp["severity"], ctx
        assert row["event_time"] == exp["event_time"], ctx
        assert row["location"]["name"] == exp["loc_name"], ctx
        assert row["location"]["distance"] == (
            pytest.approx(exp["loc_distance"]) if exp["loc_distance"] is not None else None
        ), ctx
        assert row["location"]["direction"] == exp["loc_direction"], ctx
        assert row["source_office"] == exp["office"], ctx
        assert row["time_bucket"] == exp["time_bucket"], ctx
