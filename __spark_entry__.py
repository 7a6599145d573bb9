"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship 5-table star-join query at
sf0.001.  ``queries()`` / ``oracle_sql()`` expose every implemented
operator from SURVEY.md §2 (plus beyond-reference training-data
operators) for the DuckDB-oracle correctness gate.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from storm_data_etl_service_spark.operators.registry import REGISTRY

    return REGISTRY["tpch_q5_regional_revenue"].build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from storm_data_etl_service_spark.operators.registry import REGISTRY

    return {name: spec.build for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted keys get a weaker
    rows-only check (non-SQL-expressible operators)."""
    from storm_data_etl_service_spark.operators.registry import REGISTRY

    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }
