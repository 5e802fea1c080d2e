"""Range joins: granule-bucketized point-in-interval and overlap joins
pinned against the naive inequality-join formulation."""

from __future__ import annotations

import pyspark.sql.functions as F

from etl_demos_spark.operators.rangejoin import (
    range_join_overlap,
    range_join_point,
)


def _points(spark):
    # includes negatives and exact boundary values
    return spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(range(-50, 200, 7))],
        "pid long, x double",
    )


def _intervals(spark):
    rows = [
        (0, -40.0, -10.0),
        (1, -5.0, 30.0),
        (2, 0.0, 0.0),      # degenerate single-point interval
        (3, 25.0, 160.0),   # spans many granules
        (4, 100.0, 130.0),
        (5, 150.0, 400.0),  # extends past all points
    ]
    return spark.createDataFrame(rows, "iid long, s double, e double")


def test_point_join_matches_naive(spark):
    pts, iv = _points(spark), _intervals(spark)
    got = {
        (r["pid"], r["iid"])
        for r in range_join_point(pts, iv, "x", "s", "e", granule=16).collect()
    }
    naive = {
        (r["pid"], r["iid"])
        for r in pts.join(
            iv, (F.col("x") >= F.col("s")) & (F.col("x") <= F.col("e"))
        ).collect()
    }
    assert got == naive and len(got) > 20


def test_point_join_with_keys(spark):
    pts = spark.createDataFrame(
        [(1, "a", 5.0), (2, "a", 15.0), (3, "b", 5.0)], "pid long, k string, x double"
    )
    iv = spark.createDataFrame(
        [(10, "a", 0.0, 10.0), (11, "b", 0.0, 10.0)], "iid long, k string, s double, e double"
    )
    got = {
        (r["pid"], r["iid"])
        for r in range_join_point(pts, iv, "x", "s", "e", 4.0, keys=["k"]).collect()
    }
    assert got == {(1, 10), (3, 11)}  # pid 2 out of range, keys respected


def test_overlap_join_exactly_once(spark):
    iv = _intervals(spark)
    right = iv.select(
        F.col("iid").alias("jid"), F.col("s").alias("s2"), F.col("e").alias("e2")
    )
    out = range_join_overlap(
        iv, right, ("s", "e"), ("s2", "e2"), granule=16
    ).collect()
    got = sorted((r["iid"], r["jid"]) for r in out)
    naive = sorted(
        (r["iid"], r["jid"])
        for r in iv.join(
            right, (F.col("s") <= F.col("e2")) & (F.col("s2") <= F.col("e"))
        ).collect()
    )
    # multi-granule overlaps (e.g. 3x5 share granules 9..10) emit ONCE
    assert got == naive
    assert len(got) == len(set(got))


def test_asof_ties_are_deterministic_across_partitionings(spark):
    """Multiple right rows at the same (key, ts): the carried row must
    be the same on every run and partitioning (total order via the
    carried columns), not shuffle luck."""
    from etl_demos_spark.operators.asof import asof_join_backward

    left = spark.createDataFrame([(7, 100)], "user_id long, ts long")
    right = spark.createDataFrame(
        [(7, 100, 11), (7, 100, 22), (7, 100, 5)],
        "user_id long, ts long, event_id long",
    )
    runs = []
    for parts in (1, 3, 7):
        got = asof_join_backward(
            left, right.repartition(parts), ["user_id"], "ts",
            carry=("event_id",),
        ).collect()
        runs.append([(r["user_id"], r["event_id_asof"]) for r in got])
    assert runs[0] == runs[1] == runs[2]
    # the deterministic winner is the max carried tuple (22)
    assert runs[0] == [(7, 22)]


def test_resample_locf_default_fill_cols_and_null_aggregates(spark):
    from etl_demos_spark.operators.asof import resample_locf
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [("a", "2024-01-01 00:10:00", None),
         ("a", "2024-01-01 02:20:00", 5.0)],
        "k string, ts string, v double",
    ).select("k", F.col("ts").cast("timestamp").alias("ts"), "v")
    # default fill_cols=() must work (grid densify, no fill, no crash)
    bare = resample_locf(df, "ts", ("k",), (F.sum("v").alias("sv"),))
    rows = {str(r["bucket_ts"]): r for r in bare.collect()}
    assert len(rows) == 3  # 00:00, 01:00, 02:00
    # hour 0 HAS an observation whose aggregate is NULL → was_observed=1
    assert rows["2024-01-01 00:00:00"]["was_observed"] == 1
    assert rows["2024-01-01 01:00:00"]["was_observed"] == 0
    assert rows["2024-01-01 02:00:00"]["was_observed"] == 1
