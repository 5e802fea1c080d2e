"""Streaming medallion pipeline: the reference's bronze→silver→gold shape
on a stream.

The reference refreshes its warehouse daily with full rebuilds
(bank_etl_dag.py:37,62). The streaming form keeps the same layer
semantics continuously: bronze = raw stream, silver = the staging
cast/rename contract applied per micro-batch (the SAME projection
function as batch — that is Structured Streaming's contract), gold =
watermarked windowed aggregates, upserted into partitioned parquet via
``foreachBatch`` + the incremental merge operator.

Scale notes: state is bounded by watermark horizon × key cardinality;
the gold merge rewrites only the partitions the batch touches when
``partition_by`` aligns with the window key.
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from etl_demos_spark.plans.incremental import merge_upsert


def silver_events(bronze: DataFrame) -> DataFrame:
    """Staging contract for the events stream (cast/rename + derived
    columns) — identical code path for batch and streaming input."""
    ts = F.col("ts")
    if dict(bronze.dtypes).get("ts") == "timestamp_ntz":
        ts = ts.cast("timestamp")
    return bronze.select(
        F.col("event_id").cast("long").alias("event_id"),
        ts.alias("ts"),
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_type").cast("string").alias("event_type"),
        F.col("value").cast("decimal(12,2)").alias("value"),
        F.get_json_object("props", "$.k").cast("long").alias("prop_k"),
    )


def gold_hourly(silver: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling aggregate — the gold-layer fact."""
    return (
        silver.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def run_stream_to_gold(
    spark: SparkSession,
    source_dir: str,
    gold_path: str,
    schema,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Wire bronze(files) → silver → gold(merge-upsert parquet).

    foreachBatch gets a *batch* DataFrame per trigger, so the gold sink
    reuses plans/incremental.merge_upsert unchanged — update-mode windows
    replace their previous versions keyed on (window_start, event_type).
    """
    bronze = spark.readStream.schema(schema).parquet(source_dir)
    gold = gold_hourly(silver_events(bronze))

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        merge_upsert(
            batch_df.sparkSession,
            batch_df,
            gold_path,
            keys=["window_start", "event_type"],
        )

    writer = (
        gold.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(sink)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
