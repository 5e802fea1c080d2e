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
    StringType,
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


# ---------------------------------------------------------------------------
# Temporal pattern detection: "A followed by B within T" per key
# ---------------------------------------------------------------------------

RESPONSE_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("a_ts", TimestampType()),
        StructField("b_ts", TimestampType()),
    ]
)

# pending "first" events awaiting their response, as epoch-micros packed
# into a comma string: applyInPandasWithState state columns must be
# Spark-SQL types, and a LongType array is not addressable incrementally
# — the pending set is bounded by |A per key within T| anyway (expired
# as soon as the key's max seen ts passes a_ts + T)
RESPONSE_STATE_SCHEMA = StructType([StructField("pending_us", StringType())])


def _make_response_updater(first: str, then: str, within_us: int):
    def update(key: tuple, pdfs, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            # idle key: the timeout is >= the match window (set below),
            # so by the time it fires, any 'then' that could still close
            # a pending 'first' has had at least `within` of wall time to
            # arrive — drop the state so dead keys don't accumulate
            state.remove()
            return
        pending: list[int] = []
        if state.exists:
            (packed,) = state.get
            pending = [int(x) for x in packed.split(",") if x]
        matches: list[tuple[int, int]] = []
        events: list[tuple[int, int]] = []  # (ts_us, is_then)
        max_ts = 0
        for pdf in pdfs:
            ets = pdf["event_type"]
            tss = pdf["ts"].astype("int64") // 1000  # ns → us
            for et, t_us in zip(ets, tss):
                if et == first:
                    events.append((int(t_us), 0))
                elif et == then:
                    events.append((int(t_us), 1))
        # event-time order within the batch; A sorts before B on a tie
        # so an equal-timestamp B does NOT match (strict b_ts > a_ts,
        # the batch twin's contract)
        for t_us, is_then in sorted(events):
            max_ts = max(max_ts, t_us)
            if is_then:
                # match every pending A whose window covers this B;
                # each A pairs with its FIRST B (processing in event-
                # time order makes this B that first), then retires
                still = []
                for a_us in pending:
                    if a_us < t_us <= a_us + within_us:
                        matches.append((a_us, t_us))
                    elif t_us <= a_us:
                        still.append(a_us)  # B at/before A: keep waiting
                    # a_us + within_us < t_us → expired, drop
                pending = still
            elif t_us not in pending:
                # duplicate 'first' events at the same timestamp collapse
                # to ONE pending entry — the batch twin groups by
                # (key, a_ts), so multiplicity must not fan out matches
                pending.append(t_us)
        # expire pending As the key's max seen ts has passed
        pending = [a for a in pending if max_ts <= a + within_us]
        if pending:
            state.update((",".join(str(x) for x in pending),))
            # idle-drop timeout must be >= the match window: a 1h floor
            # with within=2h would drop a pending A during a >1h
            # processing lull even though its B could still arrive
            # in-window (processing time != event time)
            state.setTimeoutDuration(max(within_us // 1000, 60 * 60 * 1000))
        elif state.exists:
            state.remove()
        if matches:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(matches),
                    "a_ts": [pd.Timestamp(a, unit="us") for a, _ in matches],
                    "b_ts": [pd.Timestamp(b, unit="us") for _, b in matches],
                }
            )

    return update


def stream_first_response(
    stream_df: DataFrame,
    first: str = "view",
    then: str = "purchase",
    within: str = "2 hours",
    ts_col: str = "ts",
    user_col: str = "user_id",
    event_col: str = "event_type",
) -> DataFrame:
    """Streaming twin of :func:`operators.asof.first_response_join`:
    per-user state machine emitting (a_ts, b_ts) the moment a ``then``
    event closes a pending ``first`` event within the bound.

    Contract: exact equality with the batch join when events ARRIVE in
    event-time order per key (the test drives it that way); under
    disorder, a ``then`` that is processed before its ``first`` cannot
    match it retroactively — at-arrival CEP semantics, the standard
    trade for O(pending-within-T) state per key. State is bounded two
    ways: pending ``first`` events expire as soon as the key's max seen
    timestamp passes a_ts + T, and a key that stops receiving events
    entirely (whose expiry sweep would otherwise never run again) is
    dropped by a processing-time idle timeout of max(T, 1 h) — dead keys
    do not accumulate in the store, and the timeout never undercuts the
    match window (a processing lull shorter than T cannot lose a match). Duplicate ``first`` events at the same
    timestamp collapse to one pending entry, matching the batch twin's
    GROUP BY (key, a_ts)."""
    import re

    import pyspark.sql.functions as F

    m = re.fullmatch(r"(\d+)\s*(second|minute|hour|day)s?", within.strip())
    if not m:
        raise ValueError(f"within {within!r}: use '<n> seconds/minutes/hours/days'")
    mult = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}[m.group(2)]
    within_us = int(m.group(1)) * mult * 1_000_000

    # aliased select, not withColumnRenamed: a stream that carries BOTH
    # the custom key column and an unrelated column literally named
    # user_id would otherwise end up with two user_id columns and die
    # with AMBIGUOUS_REFERENCE downstream
    df = stream_df.select(
        F.col(user_col).alias("user_id"),
        F.col(event_col).alias("event_type"),
        F.col(ts_col).alias("ts"),
    )
    if dict(df.dtypes).get("ts") == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    # output key field carries the caller's key TYPE (string keys are
    # legal), not RESPONSE_SCHEMA's default long
    out_schema = StructType(
        [StructField("user_id", df.schema["user_id"].dataType)]
        + [f for f in RESPONSE_SCHEMA.fields if f.name != "user_id"]
    )
    out = (
        df.select("user_id", "event_type", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_response_updater(first, then, within_us),
            outputStructType=out_schema,
            stateStructType=RESPONSE_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
    return (
        out if user_col == "user_id" else out.withColumnRenamed("user_id", user_col)
    )


def drain_available_now(query, timeout_s: float = 180.0) -> bool:
    """Wait until an availableNow query has PROCESSED all input, even if
    it does not self-terminate.

    A stateful query driven with ``applyInPandasWithState`` +
    ``ProcessingTimeTimeout`` only terminates under availableNow once its
    state store is empty: every batch re-arms processing-time timeouts
    for keys still holding pending state, and the micro-batch engine
    keeps scheduling timeout-service batches for them — a key whose
    pending entry can never expire (no later event and no elapsed
    timeout) holds the query open indefinitely. Data completeness is
    observable anyway: once every available row has been processed, the
    remaining batches carry zero input rows and emit nothing for this
    operator, so the appended output is final.

    Drained means: the query terminated CLEANLY, or the two LATEST
    progress entries both had zero input rows AND every source's
    endOffset is unchanged between them. Zero-input alone is not
    exhaustion: two CONSECUTIVE empty micro-batches can occur with
    input remaining (two adjacent empty source files under
    maxFilesPerTrigger=1, or a slow directory listing yielding
    back-to-back empty batches) — but in those cases the source still
    ADVANCES its offset (the empty file is committed), so requiring
    offset stability across the two entries separates "no progress
    left to make" from "made progress that happened to carry no rows".
    A query that terminated with an error re-raises it instead of
    reporting success (awaitTermination's contract). Returns False on
    timeout — callers must treat that as "output incomplete".
    """
    import time as _time

    def _source_end_offsets(entry) -> list:
        return [s.get("endOffset") for s in entry.get("sources", [])]

    deadline = _time.monotonic() + timeout_s
    while True:
        if not query.isActive:
            exc = query.exception()
            if exc is not None:
                raise exc
            return True
        rp = query.recentProgress
        if (
            len(rp) >= 2
            and rp[-1]["numInputRows"] == 0
            and rp[-2]["numInputRows"] == 0
            and _source_end_offsets(rp[-1]) == _source_end_offsets(rp[-2])
        ):
            return True
        if _time.monotonic() >= deadline:
            return False
        _time.sleep(0.25)
