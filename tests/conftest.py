from __future__ import annotations

import duckdb
import pytest

from etl_demos_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_MED = "/root/testdata/sf0.01"

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@pytest.fixture(scope="session")
def spark():
    # 2min periodic GC here (vs the 10min engine default): the 25-minute
    # marathon suite is where cleaner-state OOM was observed; bench and
    # driver sessions keep the lighter default (PERF.md round-5 A/B).
    spark = get_spark(
        "etl-demos-spark-tests",
        cpus=8,
        shuffle_partitions=8,
        extra_confs={"spark.cleaner.periodicGC.interval": "2min"},
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="module", autouse=True)
def _recycle_spark_state(request):
    """Keep one SparkSession alive for the whole suite (startup is ~10 s)
    but drop accumulated executor-side state between modules: operators
    persist() reusable frames by design (signatures, LSH buckets, CC
    labels) and a 460+-test marathon otherwise accumulates every cached
    generation until the JVM dies late in the run."""
    yield
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        try:
            active.catalog.clearCache()
        except Exception:
            pass  # session already stopped by the owning fixture


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Mirror the driver's oracle setup: each table registered as a view."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


@pytest.fixture(scope="session")
def duck():
    return duck_con(SF_DIR)


@pytest.fixture(scope="session")
def duck_med():
    return duck_con(SF_DIR_MED)
