"""Date spine / calendar dimension (reference dim_date).

Parity: ``unnest(generate_date_array('2015-01-01','2030-12-31'))`` plus
derived parts (reference/dbt/models/marts/core/dim_date.sql:3-16).

Scale notes: sequence+explode generates on the executors from a single
row — no driver materialization. A 16-year spine is ~5,800 rows; even a
century is trivial. The BigQuery week-numbering delta is handled by
functions.bqcompat.bq_week (documented there).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from etl_demos_spark.functions.bqcompat import bq_week, date_key, weekend_flag


def date_spine(spark: SparkSession, start: str, end: str) -> DataFrame:
    """One row per day in [start, end], column ``d`` (DateType)."""
    return spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(start).cast("date"),
                F.lit(end).cast("date"),
                F.expr("interval 1 day"),
            )
        ).alias("d")
    )


def dim_date(spark: SparkSession, start: str = "2015-01-01", end: str = "2030-12-31") -> DataFrame:
    """Full calendar dimension mirroring dim_date.sql:8-16."""
    spine = date_spine(spark, start, end)
    d = F.col("d")
    return spine.select(
        date_key(d).alias("date_key"),
        d.alias("full_date"),
        F.year(d).cast("long").alias("year"),
        F.quarter(d).cast("long").alias("quarter"),
        F.month(d).cast("long").alias("month"),
        bq_week(d).alias("week"),
        F.dayofweek(d).cast("long").alias("day_of_week"),
        weekend_flag(d).alias("is_weekend"),
    )
