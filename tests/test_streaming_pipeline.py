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
