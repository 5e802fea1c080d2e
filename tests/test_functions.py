"""BigQuery-compat expression semantics on fixed dates, incl. the
documented deltas (year_diff = calendar-year subtraction; bq_week =
Sunday-start week 0..53)."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from etl_demos_spark.functions.bqcompat import (
    age_band,
    bq_week,
    date_key,
    safe_parse_date,
    weekend_flag,
    year_diff,
)
from etl_demos_spark.operators.keys import dense_ids, surrogate_key


def _one(spark, expr):
    return spark.range(1).select(expr.alias("v")).collect()[0]["v"]


def test_safe_parse_date_null_on_garbage(spark):
    df = spark.createDataFrame([("15-03-21",), ("not-a-date",), (None,)], "s string")
    out = df.select(safe_parse_date("s", "dd-MM-yy").alias("d")).collect()
    assert out[0]["d"] == dt.date(2021, 3, 15)
    assert out[1]["d"] is None
    assert out[2]["d"] is None


def test_date_key(spark):
    assert _one(spark, date_key(F.lit("2024-02-29").cast("date"))) == 20240229


def test_year_diff_is_calendar_year_subtraction(spark):
    # BigQuery date_diff(..., year) counts year boundaries, NOT whole years:
    # 2020-01-01 minus 2019-12-31 → 1 even though it's one day.
    d1, d2 = F.lit("2020-01-01").cast("date"), F.lit("2019-12-31").cast("date")
    assert _one(spark, year_diff(d1, d2)) == 1
    # and a nearly-full year within the same calendar year → 0
    d3, d4 = F.lit("2019-12-31").cast("date"), F.lit("2019-01-01").cast("date")
    assert _one(spark, year_diff(d3, d4)) == 0


def test_bq_week_sunday_start_week0(spark):
    # BigQuery extract(week): 2023-01-01 is a Sunday → week 1 starts there;
    # 2022-01-01 (Saturday) is in week 0.
    assert _one(spark, bq_week(F.lit("2023-01-01").cast("date"))) == 1
    assert _one(spark, bq_week(F.lit("2022-01-01").cast("date"))) == 0
    assert _one(spark, bq_week(F.lit("2022-01-02").cast("date"))) == 1  # Sunday
    assert _one(spark, bq_week(F.lit("2020-12-31").cast("date"))) == 52


def test_weekend_flag(spark):
    assert _one(spark, weekend_flag(F.lit("2024-01-06").cast("date"))) is True  # Sat
    assert _one(spark, weekend_flag(F.lit("2024-01-08").cast("date"))) is False  # Mon


def test_age_band(spark):
    df = spark.createDataFrame([(25,), (35,), (45,), (70,), (None,)], "age int")
    out = [r["b"] for r in df.select(age_band("age").alias("b")).collect()]
    assert out == ["18-29", "30-39", "40-49", "50+", "unknown"]


def test_dense_ids_matches_surrogate_key(spark):
    # The scalable key path must produce byte-identical keys to the
    # reference's global row_number.
    df = spark.createDataFrame([(f"k{i:04d}",) for i in range(777)], "k string")
    a = {r["k"]: r["key"] for r in surrogate_key(df, ["k"]).collect()}
    b = {r["k"]: r["key"] for r in dense_ids(df, ["k"]).collect()}
    assert a == b
    assert sorted(b.values()) == list(range(1, 778))


def test_bq_week_exhaustive_1990_2035(spark):
    """Exhaustive check of the BigQuery week implementation over 46 years
    against a first-principles Python reference (week 1 starts at the
    first Sunday of the year; earlier days are week 0)."""
    import datetime as dt

    from etl_demos_spark.operators.datespine import date_spine

    spine = date_spine(spark, "1990-01-01", "2035-12-31")
    got = {
        r["d"]: r["w"]
        for r in spine.select("d", bq_week("d").alias("w")).collect()
    }

    def ref_week(d: dt.date) -> int:
        jan1 = dt.date(d.year, 1, 1)
        dow0 = (jan1.weekday() + 1) % 7  # 0 = Sunday
        days_before_first_sunday = (7 - dow0) % 7
        doy0 = (d - jan1).days
        if doy0 < days_before_first_sunday:
            return 0
        return 1 + (doy0 - days_before_first_sunday) // 7

    assert len(got) == (dt.date(2035, 12, 31) - dt.date(1990, 1, 1)).days + 1
    bad = {d: (w, ref_week(d)) for d, w in got.items() if w != ref_week(d)}
    assert not bad, f"{len(bad)} mismatches, first: {sorted(bad.items())[:3]}"


def test_strip_tracking_params_edge_cases(spark):
    from etl_demos_spark.functions.urls import canonical_url, strip_tracking_params

    cases = [
        ("https://A.com/x?utm_a=1&lang=en", "https://a.com/x?lang=en"),
        ("https://a.com/x?lang=en&ref=feed", "https://a.com/x?lang=en"),
        ("https://a.com/x?utm_a=1", "https://a.com/x"),
        ("https://a.com/x?utm_a=1&ref=y", "https://a.com/x"),
        ("https://a.com/x", "https://a.com/x"),
        ("https://a.com/x?a=1&utm_b=2&c=3", "https://a.com/x?a=1&c=3"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r[0] for r in df.select(canonical_url("url")).collect()]
    assert got == [want for _, want in cases]
    # strip alone keeps original case
    one = spark.createDataFrame([("https://A.com/X?ref=1",)], "url string")
    assert one.select(strip_tracking_params("url")).collect()[0][0] == "https://A.com/X"
