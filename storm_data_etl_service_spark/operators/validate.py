"""Cross-dataset validation harness: the reference's 4-phase validator
(reference cmd/validate/main.go:111-538) as DataFrame assertions.

Each phase returns violation counts computed distributively (no
collects of full datasets — only the final scalar counts reach the
driver), so the same harness that gates a 271-record fixture gates a
100 TB backfill.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FLOAT_TOL = 1e-9  # reference cmd/validate/main.go:542-544


@dataclass
class ValidationReport:
    phase: str
    violations: dict[str, int] = field(default_factory=dict)

    @property
    def passed(self) -> bool:
        return all(v == 0 for v in self.violations.values())


def check_source_parity(a: DataFrame, b: DataFrame) -> ValidationReport:
    """Phase 1 (Q15) — multiset equality of two datasets
    (reference cmd/validate/main.go:228-252)."""
    return ValidationReport(
        "source_parity",
        {
            "rows_only_in_a": a.exceptAll(b).count(),
            "rows_only_in_b": b.exceptAll(a).count(),
        },
    )


def check_etl_integrity(
    source_keys: DataFrame, etl_keys: DataFrame, enriched: DataFrame
) -> ValidationReport:
    """Phase 2 (Q12/Q13/Q17) — referential completeness, duplicate IDs,
    per-type count parity (reference cmd/validate/main.go:257-347).

    ``source_keys`` / ``etl_keys``: one row per record with the same
    composite-key columns (the reference uses
    type|state|lat|lon|time, cmd/validate/main.go:298-313); the first
    key column must be ``event_type`` for the parity check."""
    key_cols = source_keys.columns
    missing = source_keys.join(etl_keys, key_cols, "left_anti").count()
    dup_ids = (
        enriched.groupBy("id").count().filter(F.col("count") > 1).count()
    )
    type_parity = (
        source_keys.groupBy("event_type")
        .agg(F.count("*").alias("n_src"))
        .join(
            enriched.groupBy("event_type").agg(F.count("*").alias("n_etl")),
            "event_type",
            "full_outer",
        )
        .filter(~F.col("n_src").eqNullSafe(F.col("n_etl")))
        .count()
    )
    return ValidationReport(
        "etl_integrity",
        {
            "source_records_missing_from_etl": missing,
            "duplicate_ids": dup_ids,
            "per_type_count_mismatches": type_parity,
        },
    )


def check_record_compare(a: DataFrame, b: DataFrame) -> ValidationReport:
    """Phase 3 (Q14) — record-level field equality over an id equi-join
    with float tolerance 1e-9 (reference cmd/validate/main.go:379-462).
    Works on the flattened contract columns."""
    an = a.select([F.col(c).alias(f"a_{c}") for c in a.columns])
    bn = b.select([F.col(c).alias(f"b_{c}") for c in b.columns])
    # full-outer on id: one join + ONE aggregation job yields every
    # per-field mismatch count and both anti-join counts (a per-field
    # count() loop would re-execute the join once per field)
    joined = an.join(bn, an["a_id"] == bn["b_id"], "full_outer")
    aggs = [
        F.count(F.when(F.col("a_id").isNull(), 1)).alias("ids_only_in_b"),
        F.count(F.when(F.col("b_id").isNull(), 1)).alias("ids_only_in_a"),
    ]
    both = F.col("a_id").isNotNull() & F.col("b_id").isNotNull()
    field_names = []
    for c in a.columns:
        if c == "id" or c not in b.columns:
            continue
        ac, bc = F.col(f"a_{c}"), F.col(f"b_{c}")
        if dict(a.dtypes)[c] == "double":
            mismatch = ~(ac.eqNullSafe(bc) | (F.abs(ac - bc) <= FLOAT_TOL))
        else:
            mismatch = ~ac.eqNullSafe(bc)
        field_names.append(c)
        aggs.append(F.count(F.when(both & mismatch, 1)).alias(f"field_mismatch_{c}"))
    row = joined.agg(*aggs).first()
    violations = {k: row[k] for k in row.asDict()}
    return ValidationReport("record_compare", violations)


def check_schema_alignment(enriched: DataFrame) -> ValidationReport:
    """Phase 4 (Q16) — enum membership, required fields, ID-prefix
    invariant, cross-field implications
    (reference cmd/validate/main.go:467-538)."""
    et = F.col("event_type")
    unit = F.col("measurement.unit")
    sev = F.col("measurement.severity")
    mag = F.col("measurement.magnitude")
    checks = {
        "bad_event_type": ~et.isin("hail", "wind", "tornado", ""),
        "bad_unit": ~unit.isin("in", "mph", "f_scale", ""),
        "bad_severity": sev.isNotNull()
        & ~sev.isin("minor", "moderate", "severe", "extreme"),
        "empty_id": F.length("id") == 0,
        "id_prefix_mismatch": (et != "")
        & ~F.col("id").startswith(F.concat(et, F.lit("-"))),
        "severity_magnitude_implication": (et != "")
        & ((mag > 0) != sev.isNotNull()),
        "empty_state": (et != "") & (F.length("location.state") == 0),
    }
    agg = enriched.agg(
        *[
            F.count(F.when(cond, 1)).alias(name)
            for name, cond in checks.items()
        ]
    ).first()
    return ValidationReport("schema_alignment", {k: agg[k] for k in checks})


def run_all(
    source_a: DataFrame,
    source_b: DataFrame,
    source_keys: DataFrame,
    etl_keys: DataFrame,
    enriched: DataFrame,
    flattened_a: DataFrame,
    flattened_b: DataFrame,
) -> list[ValidationReport]:
    """All 4 phases in the reference's order; exit status = every
    report.passed (reference cmd/validate/main.go:145-150)."""
    return [
        check_source_parity(source_a, source_b),
        check_etl_integrity(source_keys, etl_keys, enriched),
        check_record_compare(flattened_a, flattened_b),
        check_schema_alignment(enriched),
    ]
