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


def _registry():
    # Importing both modules populates the shared REGISTRY.
    import etl_demos_spark.workload as w
    import etl_demos_spark.workload_ext  # noqa: F401

    return w


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (star join: revenue by region/nation) at sf0.001."""
    return _registry().REGISTRY["q_star_join"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry().get_queries()


def oracle_sql() -> dict[str, str]:
    return _registry().get_oracles()
