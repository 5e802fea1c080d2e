"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``etl_demos_spark`` (see SURVEY.md §2 for the
operator inventory each query covers).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (star join: revenue by region/nation) at sf0.001."""
    from etl_demos_spark.workload import REGISTRY

    return REGISTRY["q_star_join"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from etl_demos_spark.workload import get_queries

    return get_queries()


def oracle_sql() -> dict[str, str]:
    from etl_demos_spark.workload import get_oracles

    return get_oracles()
