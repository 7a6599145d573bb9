"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference's pipeline is stateless per record (SURVEY.md §3.1); a
100 TB streaming deployment also needs arbitrary per-key state that
Spark's built-in windowed aggregations can't express (running
profiles, cross-batch counters with custom merge logic).  This module
provides that shape: state lives in the state store keyed by the
group, each micro-batch hands the kernel the key's new rows as pandas
DataFrames, and the kernel emits updated rows + persists its state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

RUNNING_TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("max_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
        T.StructField("mx", T.DoubleType()),
    ]
)


def user_running_totals(events: DataFrame) -> DataFrame:
    """Per-user running count/sum/max maintained across micro-batches.

    The kernel is a closure (pickled by value — workers need no repo
    import path).  State is one tuple per user; each batch folds the
    user's new rows into it and emits the refreshed totals.
    """

    def kernel(key, pdfs, state):
        n, total, mx = state.get if state.exists else (0, 0.0, float("-inf"))
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            if len(pdf):
                mx = max(mx, float(pdf["value"].max()))
        state.update((n, total, mx))
        import pandas as pd

        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total],
                "max_value": [mx],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        kernel,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )
