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


USER_PROFILE_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("n_event_types", T.LongType()),
        T.StructField("top_type", T.StringType()),
    ]
)


def user_profile_tws(events: DataFrame) -> DataFrame:
    """Per-user behavioural profile via ``transformWithStateInPandas``
    — Spark 4's arbitrary-state streaming API (the successor to
    applyInPandasWithState): typed state handles live in the state
    store per key, so cross-batch profiles scale with the state store
    (RocksDB on a real cluster), not with executor memory.

    Demonstrates both state shapes a curation/analytics stream needs:
    a ValueState for scalar running totals and a MapState keyed by
    event type for the per-type histogram (emitting the distinct-type
    count and the count-argmax top type, tie-broken lexically).

    Requires the RocksDB state store provider and ``google.protobuf``
    (the TWS JVM<->Python state protocol is protobuf-framed); the test
    suite skips it where protobuf is absent.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class ProfileProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState(
                "totals", "n BIGINT, total DOUBLE"
            )
            self._by_type = handle.getMapState(
                "by_type", "event_type STRING", "n BIGINT"
            )

        def handleInputRows(self, key, rows, timer_values):
            import pandas as pd

            if self._totals.exists():
                n, total = self._totals.get()
            else:
                n, total = 0, 0.0
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
                for et, c in pdf["event_type"].value_counts().items():
                    prev = (
                        self._by_type.getValue((et,))[0]
                        if self._by_type.containsKey((et,))
                        else 0
                    )
                    self._by_type.updateValue((et,), (prev + int(c),))
            self._totals.update((n, float(total)))
            hist = {k[0]: v[0] for k, v in self._by_type.iterator()}
            # count-desc, then lexical asc tiebreak
            top = sorted(hist.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [float(total)],
                    "n_event_types": [len(hist)],
                    "top_type": [top],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=ProfileProcessor(),
        outputStructType=USER_PROFILE_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
