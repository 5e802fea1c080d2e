"""Materialized-aggregate routing: subset-key matching, smallest-view
selection, exact derived averages, and refusal when no view qualifies."""

from __future__ import annotations

import pyspark.sql.functions as F

from etl_demos_spark.plans.matview import AggregateStore


def _store(spark):
    raw = spark.createDataFrame(
        [("a", 1, 10.0, 1), ("a", 1, 30.0, 1), ("a", 2, 2.0, 1), ("b", 1, 5.0, 1)],
        "k string, d int, v double, one int",
    )
    fine = raw.groupBy("k", "d").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col("v").cast("decimal(12,2)")).alias("sv"),
    )
    coarse = raw.groupBy("k").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col("v").cast("decimal(12,2)")).alias("sv"),
    )
    s = AggregateStore()
    s.register("fine", fine, ("k", "d"), {"cnt": "count", "sv": "sum"})
    s.register("coarse", coarse, ("k",), {"cnt": "count", "sv": "sum"})
    return s, raw


def test_route_reaggregates_exactly(spark):
    s, raw = _store(spark)
    got = {
        r["k"]: (r["cnt"], float(r["sv"]))
        for r in s.route(("k",), ("cnt", "sv")).collect()
    }
    want = {
        r["k"]: (r["cnt"], float(r["sv"]))
        for r in raw.groupBy("k")
        .agg(F.count(F.lit(1)).alias("cnt"),
             F.sum(F.col("v").cast("decimal(12,2)")).alias("sv"))
        .collect()
    }
    assert got == want


def test_route_prefers_smallest_matching_view(spark):
    s, _ = _store(spark)
    # both views match keys=("k",); the coarse one (fewer keys) must win
    routed = s.route(("k",), ("cnt",))
    assert "d" not in routed.columns
    assert s.last_routed == "coarse"


def test_route_derived_average_is_exact_not_avg_of_avgs(spark):
    s, raw = _store(spark)
    got = {
        r["k"]: r["avg_v"]
        for r in s.route(("k",), (), avgs={"avg_v": ("sv", "cnt")}).collect()
    }
    # group 'a' has uneven days (2 rows on d=1, 1 on d=2): exact avg is
    # 14.0, while the avg-of-daily-avgs would be (20 + 2) / 2 = 11.0
    assert float(got["a"]) == 14.0
    assert float(got["b"]) == 5.0


def test_route_refuses_unanswerable(spark):
    s, _ = _store(spark)
    assert s.route(("k", "missing"), ("cnt",)) is None
    assert s.route(("k",), ("nope",)) is None
