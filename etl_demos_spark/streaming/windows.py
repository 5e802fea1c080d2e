"""Event-time windowing: tumbling / sliding / session, batch + streaming.

The reference is batch-only (SURVEY.md §2.8), so this is the engine's
north-star streaming surface. Each window shape has:
- a *batch analog* on a static DataFrame (oracle-checkable — the driver's
  DuckDB gate can verify exact semantics), and
- the same transformation applied to a ``readStream`` DataFrame with a
  watermark for late data (demonstrated in tests via the rate/memory
  sources; the transformation code is shared, which is the point of
  Structured Streaming).

Scale notes: windowed aggregation shuffles on (window, keys); state store
size is bounded by watermark horizon × key cardinality. Session windows
use Spark's native session_window (state-merging implementation) — the
batch analog uses the classic lag/cumsum formulation, which is also the
cross-engine-checkable one.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def sliding_agg(
    df: DataFrame,
    ts_col: str = "ts",
    width: str = "1 hour",
    slide: str = "30 minutes",
    keys: tuple[str, ...] = ("event_type",),
    aggs: tuple = None,
) -> DataFrame:
    """Sliding event-time windows via native F.window (works identically
    on batch and streaming input)."""
    aggs = aggs or (F.count(F.lit(1)).alias("n_events"),)
    out = df.groupBy(F.window(ts_col, width, slide).alias("w"), *keys).agg(*aggs)
    agg_cols = [c for c in out.columns if c not in ("w", *keys)]
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *keys,
        *agg_cols,
    )


def tumbling_agg(
    df: DataFrame,
    ts_col: str = "ts",
    width: str = "1 hour",
    keys: tuple[str, ...] = ("event_type",),
    aggs: tuple = None,
) -> DataFrame:
    """Tumbling windows — the slide == width special case of
    :func:`sliding_agg` (one shaping implementation to maintain)."""
    return sliding_agg(df, ts_col, width, width, keys, aggs)


def sessionize_batch(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap: str = "30 minutes",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Batch sessionization (lag → gap flag → cumulative sum = session id).

    This is the ANSI-SQL-expressible formulation (identical semantics in
    DuckDB → oracle-checkable); the streaming path uses
    ``F.session_window`` below which merges to the same sessions.
    """
    gap_expr = F.expr(f"interval {gap}")
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    flagged = df.withColumn(
        "__new_session",
        F.when(
            F.col(ts_col)
            > F.lag(ts_col).over(w) + gap_expr,
            1,
        )
        .when(F.lag(ts_col).over(w).isNull(), 1)
        .otherwise(0),
    )
    return flagged.withColumn(
        "session_seq",
        F.sum("__new_session")
        .over(
            Window.partitionBy(user_col)
            .orderBy(ts_col, order_tiebreak)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        .cast("long"),
    ).drop("__new_session")


def session_agg_batch(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap: str = "30 minutes",
) -> DataFrame:
    """Per-session aggregates from the batch sessionization."""
    s = sessionize_batch(df, ts_col, user_col, gap)
    return s.groupBy(user_col, "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
    )


def session_agg_native(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap: str = "30 minutes",
) -> DataFrame:
    """Native session_window formulation — the one to use under
    readStream (stateful session merging with watermark eviction)."""
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("w"), user_col)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            user_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def stream_tumbling_counts(
    stream_df: DataFrame,
    ts_col: str = "ts",
    width: str = "1 hour",
    watermark: str = "2 hours",
    keys: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """The streaming form: watermark bounds state; late rows beyond the
    horizon are dropped (documented policy, matching the reference's
    'full refresh daily' determinism as closely as a stream can)."""
    if dict(stream_df.dtypes).get(ts_col) == "timestamp_ntz":
        # Watermarks require TIMESTAMP; with the session pinned to UTC the
        # cast is a no-op on the wall-clock values.
        stream_df = stream_df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, width).alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            *keys,
            "n_events",
        )
    )


def stream_stream_join(
    left_stream: DataFrame,
    right_stream: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    within: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream inner join with an event-time interval condition —
    right rows match left rows with ts in [left_ts - within, left_ts].
    Watermarks on BOTH sides bound the join state; rows outside the
    horizon are evicted (Spark's state cleanup needs the interval bound +
    both watermarks, else state grows forever).

    Output columns are UNAMBIGUOUS by construction: the right side's
    join key is dropped (equal to the left's) and any remaining right
    column colliding with a left name — the shared default ts most
    commonly — comes back prefixed ``right_`` (a raw join would return
    duplicate names, making the frame unselectable by name)."""

    def tsfix(df, col):
        if dict(df.dtypes).get(col) == "timestamp_ntz":
            return df.withColumn(col, F.col(col).cast("timestamp"))
        return df

    l = tsfix(left_stream, left_ts).withWatermark(left_ts, watermark).alias("l")
    r = tsfix(right_stream, right_ts).withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}") - F.expr(f"interval {within}"))
    )
    joined = l.join(r, cond, "inner")
    left_cols = left_stream.columns
    out = [F.col(f"l.{c}").alias(c) for c in left_cols]
    for c in right_stream.columns:
        if c == key:
            continue
        out.append(
            F.col(f"r.{c}").alias(f"right_{c}" if c in left_cols else c)
        )
    return joined.select(*out)


_UNIT_SECS = {
    "second": 1, "seconds": 1, "minute": 60, "minutes": 60,
    "hour": 3600, "hours": 3600, "day": 86400, "days": 86400,
}


def _interval_secs(width: str) -> int:
    qty, unit = width.strip().split()
    if unit not in _UNIT_SECS:
        raise ValueError(f"unsupported interval unit: {unit!r}")
    return int(qty) * _UNIT_SECS[unit]


def _check_nesting(levels: tuple[str, ...]) -> None:
    """Every cascade level must be an integer multiple of the previous,
    so each fine window nests in exactly one coarse window."""
    secs = [_interval_secs(w) for w in levels]
    for fine, coarse in zip(secs, secs[1:]):
        if coarse % fine:
            raise ValueError(
                f"levels must nest: {coarse}s not a multiple of {fine}s"
            )


def rollup_cascade(
    df: DataFrame,
    ts_col: str = "ts",
    keys: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
    levels: tuple[str, ...] = ("15 minutes", "1 hour", "6 hours"),
) -> DataFrame:
    """Multi-resolution continuous-aggregate cascade (the hypertable /
    materialized-rollup pattern): the finest level aggregates raw events
    ONCE; every coarser level re-aggregates the finer level's partials —
    decomposable aggregates only (count/sum/min/max; avg derives as
    sum/count at read time). Each level must be an integer multiple of
    the previous, so every fine window nests in exactly one coarse
    window and ``F.window`` on the fine ``window_start`` is the exact
    re-bucketing.

    At scale this is the difference between reading 100 TB once vs once
    per resolution: level i processes |level i-1| rows (already reduced
    by the fine-bucket cardinality), and the same cascade runs
    incrementally under Structured Streaming (append the finest level
    per micro-batch, re-aggregate downstream).

    The money sum stays DECIMAL through every level — partial double
    sums would make coarser totals shuffle-order-dependent — and is cast
    to double only by the caller at the output boundary.
    """
    _check_nesting(levels)

    def shape(grouped: DataFrame) -> DataFrame:
        return grouped.select(
            F.col("w.start").alias("window_start"),
            *keys,
            "n_events",
            "_total",
            "min_value",
            "max_value",
        )

    cur = shape(
        df.groupBy(F.window(ts_col, levels[0]).alias("w"), *keys).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(12,2)")).alias("_total"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
    )
    outs = [cur.withColumn("level", F.lit(levels[0]))]
    for width in levels[1:]:
        cur = shape(
            cur.groupBy(F.window("window_start", width).alias("w"), *keys).agg(
                F.sum("n_events").alias("n_events"),
                F.sum("_total").alias("_total"),
                F.min("min_value").alias("min_value"),
                F.max("max_value").alias("max_value"),
            )
        )
        outs.append(cur.withColumn("level", F.lit(width)))
    out = outs[0]
    for nxt in outs[1:]:
        out = out.unionByName(nxt)
    return out


def migrate_level_to_day_layout(spark, path: str) -> None:
    """One-time migration of a pre-day-partitioning cascade level table
    (written by the earlier merge_upsert form: unpartitioned, no
    ``__day`` column) to the day-partitioned layout — without it the
    first post-upgrade batch dies with UNRESOLVED_COLUMN on __day.
    Staging-then-swap, so a crash mid-migration heals like any
    interrupted swap. No-op on missing or already-migrated tables."""
    from etl_demos_spark.plans.incremental import swap_table, table_exists

    if not table_exists(path):
        return
    cur = spark.read.parquet(path)
    if "__day" in cur.columns:
        return
    staging = f"{path}__staging"
    cur.withColumn("__day", F.to_date("window_start")).write.mode(
        "overwrite"
    ).partitionBy("__day").parquet(staging)
    swap_table(path, staging)


def stream_rollup_cascade(
    stream_df: DataFrame,
    base_path: str,
    ts_col: str = "ts",
    keys: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
    levels: tuple[str, ...] = ("15 minutes", "1 hour"),
    watermark: str = "2 hours",
    checkpoint: str | None = None,
):
    """Continuous-aggregate MAINTENANCE under Structured Streaming — the
    incremental form of :func:`rollup_cascade`.

    The finest level is a watermarked streaming aggregation in APPEND
    mode, so a fine window's partial row is emitted exactly once, when
    the watermark closes it. ``foreachBatch`` then (1) appends the
    closed fine partials to the level-0 table and (2) maintains every
    coarser level *incrementally*: the batch's fine rows name exactly
    which coarse windows changed (the invalidation set — the hypertable
    refresh policy), those windows alone are re-derived from the finer
    table and merge-upserted. Per-batch work ∝ windows closed in the
    batch × cascade depth — never table size, never raw history.

    Physical layout: every level is day-partitioned on ``__day =
    to_date(window_start)`` so the contract holds on the WRITE side too
    — upserts go through ``merge_upsert_partitioned`` (only the days a
    batch touches are rewritten; a plain merge_upsert would anti-join
    and rewrite the entire level table every micro-batch, per-batch
    cost growing with history) — and on the finer-table READ during
    coarse re-derivation (the scan is partition-pruned to the days the
    affected coarse windows span). ``__day`` comes back as a column on
    read; consumers treat it as layout, not data.

    Values are identical to the batch cascade for every emitted window
    (asserted in tests/test_streaming.py); windows still open at the
    watermark are absent until closed, the standard append-mode
    semantics. Decimal money totals cascade exactly as in the batch
    form."""
    from etl_demos_spark.plans.incremental import merge_upsert_partitioned

    _check_nesting(levels)

    migrated: set[str] = set()

    def ensure_day_layout(spark, path: str) -> None:
        if path in migrated:
            return
        migrated.add(path)
        migrate_level_to_day_layout(spark, path)

    df = stream_df
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    fine_agg = (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, levels[0]).alias("w"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(12,2)")).alias("_total"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            *keys,
            "n_events",
            "_total",
            "min_value",
            "max_value",
        )
    )
    lvl_paths = [f"{base_path}/level_{i}" for i in range(len(levels))]

    def maintain(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        batch_df.persist()
        # Level 0 goes through a keyed upsert, NOT a bare append:
        # foreachBatch is at-least-once, and a replayed micro-batch
        # appending the same closed fine windows would double-count them
        # in level 0 and (via re-derivation) every coarser level forever.
        # Append-mode emits each closed window exactly once, so on first
        # delivery the upsert inserts; on a replay it replaces the
        # identical rows — idempotent either way. The PARTITIONED upsert
        # keeps the write ∝ batch: only the day partitions this batch's
        # windows land in are rewritten (window_start determines __day,
        # so a key never moves partitions).
        ensure_day_layout(spark, lvl_paths[0])
        merge_upsert_partitioned(
            spark,
            batch_df.withColumn("__day", F.to_date("window_start")),
            lvl_paths[0],
            keys=["window_start", *keys],
            partition_by=["__day"],
        )
        cur = batch_df
        for i, width in enumerate(levels[1:], start=1):
            coarse_start = F.window("window_start", width).getField("start")
            affected = cur.select(coarse_start.alias("ws")).distinct()
            # days spanned by the affected coarse windows — the finer
            # read below prunes to these partitions, so re-derivation
            # reads days ∝ invalidation set, never the level's history
            ensure_day_layout(spark, lvl_paths[i])
            day_rows = affected.select(
                F.explode(
                    F.sequence(
                        F.to_date("ws"),
                        F.to_date(
                            F.col("ws")
                            + F.expr(f"interval {width}")
                            - F.expr("interval 1 second")
                        ),
                    )
                ).alias("__day")
            ).distinct().collect()
            days = [r["__day"] for r in day_rows]
            finer = (
                spark.read.parquet(lvl_paths[i - 1])
                .filter(F.col("__day").isin(days))
                .drop("__day")
            )
            finer_aff = (
                finer.withColumn("__cs", coarse_start)
                .join(F.broadcast(affected), F.col("__cs") == F.col("ws"))
                .drop("ws", "__cs")
            )
            re_agg = (
                finer_aff.groupBy(F.window("window_start", width).alias("w"), *keys)
                .agg(
                    F.sum("n_events").alias("n_events"),
                    F.sum("_total").alias("_total"),
                    F.min("min_value").alias("min_value"),
                    F.max("max_value").alias("max_value"),
                )
                .select(
                    F.col("w.start").alias("window_start"),
                    *keys,
                    "n_events",
                    "_total",
                    "min_value",
                    "max_value",
                )
            )
            # materialize once: re_agg feeds BOTH the upsert write and
            # the next level's affected-set derivation — lazy, it would
            # re-scan and re-aggregate the finer table a second time per
            # level, defeating the work-∝-windows-closed contract
            re_agg = re_agg.localCheckpoint(eager=True)
            merge_upsert_partitioned(
                spark,
                re_agg.withColumn("__day", F.to_date("window_start")),
                lvl_paths[i],
                keys=["window_start", *keys],
                partition_by=["__day"],
            )
            cur = re_agg
        batch_df.unpersist()

    writer = (
        fine_agg.writeStream.outputMode("append")
        .foreachBatch(maintain)
        .trigger(availableNow=True)
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()
