"""End-to-end streaming medallion pipeline: file stream → silver contract
→ watermarked gold → merge-upsert parquet sink, verified against the
equivalent batch computation."""

from __future__ import annotations

import pyspark.sql.functions as F

from etl_demos_spark.data import load_events
from etl_demos_spark.streaming.pipeline import (
    gold_hourly,
    run_stream_to_gold,
    silver_events,
)

SF_DIR = "/root/testdata/sf0.001"


def test_stream_to_gold_matches_batch(spark, tmp_path):
    src = str(tmp_path / "bronze")
    gold_path = str(tmp_path / "gold")
    ckpt = str(tmp_path / "ckpt")

    ev = load_events(spark, SF_DIR)
    # two files → at least the file-source sees multiple splits
    ev.repartition(2).write.parquet(src)
    schema = spark.read.parquet(src).schema

    q = run_stream_to_gold(spark, src, gold_path, schema, ckpt)
    q.awaitTermination(180)
    q.stop()

    got = spark.read.parquet(gold_path)
    expect = gold_hourly(silver_events(ev)).withColumn(
        "window_start", F.col("window_start")
    )
    g = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in got.collect()
    }
    e = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in expect.collect()
    }
    assert g == e
    assert len(g) > 0


def test_silver_contract_on_batch(spark):
    ev = load_events(spark, SF_DIR)
    s = silver_events(ev)
    assert dict(s.dtypes)["value"] == "decimal(12,2)"
    assert dict(s.dtypes)["prop_k"] == "bigint"
    assert s.filter(F.col("prop_k").isNull()).count() == 0


def test_stream_stream_join_matches_batch(spark, tmp_path):
    """clicks ⋈ views (same user, view within 30 min before click) as a
    real stream-stream join — row set must equal the batch interval join."""
    import pyspark.sql.functions as F

    from etl_demos_spark.streaming.windows import stream_stream_join

    ev = load_events(spark, SF_DIR).withColumn("ts", F.col("ts").cast("timestamp"))
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("ts"), F.col("event_id").alias("click_id")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("user_id"), F.col("ts").alias("vts"),
        F.col("event_id").alias("view_id"),
    )
    src_c, src_v = str(tmp_path / "clicks"), str(tmp_path / "views")
    clicks.write.parquet(src_c)
    views.withColumnRenamed("vts", "ts").write.parquet(src_v)

    sc = spark.readStream.schema(spark.read.parquet(src_c).schema).parquet(src_c)
    sv = spark.readStream.schema(spark.read.parquet(src_v).schema).parquet(src_v)
    joined = stream_stream_join(sc, sv, key="user_id", within="30 minutes")
    out = joined.select("click_id", "view_id")
    q = (
        out.writeStream.format("memory").queryName("ssj")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    q.stop()
    got = {(r["click_id"], r["view_id"]) for r in spark.sql("select * from ssj").collect()}

    batch = clicks.join(
        views,
        (clicks["user_id"] == views["user_id"])
        & (views["vts"] <= clicks["ts"])
        & (views["vts"] >= clicks["ts"] - F.expr("interval 30 minutes")),
    )
    expect = {(r["click_id"], r["view_id"]) for r in batch.collect()}
    assert got == expect and len(got) > 0
