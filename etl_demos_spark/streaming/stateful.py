"""Custom stateful streaming operators via applyInPandasWithState.

The escape hatch for semantics F.window/session_window can't express —
arbitrary per-key state machines over a stream (the reference has no
streaming at all; this is engine capability for the events surface).

Example operator: per-user running event count + last-seen timestamp with
idle-timeout finalization — the minimal shape of "custom sessionizer with
state", demonstrating state schema, timeout handling, and Arrow-batched
group processing. State is per-key and partitioned by the groupBy key, so
it scales horizontally like any shuffle.

Note on the Spark 4.x successor API: ``transformWithStateInPandas``
(typed ValueState/ListState/MapState handles + timers, RocksDB-backed)
is the forward path for new stateful operators; it was probed in this
environment and its streaming Python runner fails at init for lack of
the ``google.protobuf`` package (container has no installer), so this
module stays on ``applyInPandasWithState``, which expresses the same
per-key state machines.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("last_ts", TimestampType()),
        StructField("finalized", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [StructField("n_events", LongType()), StructField("last_ts_us", LongType())]
)


def _update_user_counts(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        n, last_us = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "last_ts": [pd.Timestamp(last_us, unit="us")],
                "finalized": [1],
            }
        )
        return

    n, last_us = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        if len(pdf):
            last_us = max(last_us, int(pdf["ts"].astype("int64").max() // 1000))
    state.update((n, last_us))
    state.setTimeoutDuration(30 * 60 * 1000)  # 30 min processing-time idle
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "last_ts": [pd.Timestamp(last_us, unit="us")],
            "finalized": [0],
        }
    )


def user_running_counts(stream_df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Apply the stateful per-user counter to a streaming events frame.

    The state function reads the literal column name ``ts`` (Arrow
    worker code can't see this wrapper's parameters), so a non-default
    ``ts_col`` is renamed here at the boundary — without this the
    executor dies with a KeyError on the first micro-batch."""
    import pyspark.sql.functions as F

    df = stream_df
    if ts_col != "ts":
        df = df.withColumnRenamed(ts_col, "ts")
        ts_col = "ts"
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        df.groupBy("user_id")
        .applyInPandasWithState(
            _update_user_counts,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
