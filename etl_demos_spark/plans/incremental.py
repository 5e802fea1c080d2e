"""Incremental materialization: append + key-merge upsert over Parquet.

The reference is always full-refresh (bank_etl_dag.py:62 --full-refresh;
LOADING_NEW_DATA.md:272 names incremental as future work) — this module is
that future work, Spark-native. Without a transactional table format the
merge is read-union-rewrite; at 100 TB you'd put Delta/Iceberg under the
same API (the merge semantics below are exactly MERGE WHEN MATCHED UPDATE
WHEN NOT MATCHED INSERT), and partition pruning limits the rewrite to
touched partitions when ``partition_by`` covers the update keyspace.
"""

from __future__ import annotations

from collections.abc import Sequence
from pathlib import Path

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def table_exists(path: str) -> bool:
    p = Path(path)
    return p.exists() and any(p.glob("**/*.parquet"))


def append(df: DataFrame, path: str, partition_by: Sequence[str] = ()) -> None:
    writer = df.write.mode("append")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def merge_upsert(
    spark: SparkSession,
    updates: DataFrame,
    path: str,
    keys: Sequence[str],
    partition_by: Sequence[str] = (),
) -> DataFrame:
    """Upsert ``updates`` into the Parquet table at ``path`` by ``keys``:
    existing rows with matching keys are replaced, new keys inserted.

    Rewrite goes through a staging location then swaps, so a failed job
    never leaves the target half-written.
    """
    if not table_exists(path):
        writer = updates.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)
        return spark.read.parquet(path)

    current = spark.read.parquet(path)
    keep = current.join(updates.select(*keys).distinct(), list(keys), "left_anti")
    merged = keep.unionByName(updates.select(*current.columns))

    staging = f"{path}__staging"
    writer = merged.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(staging)

    import shutil

    final_tmp = f"{path}__old"
    shutil.move(path, final_tmp)
    shutil.move(staging, path)
    shutil.rmtree(final_tmp)
    return spark.read.parquet(path)


def backfill_partitions(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    partition_by: Sequence[str],
) -> None:
    """Dynamic partition overwrite — the backfill primitive: replace ONLY
    the partitions present in ``df``, leaving the rest of the table
    untouched (vs static overwrite which truncates everything). This is
    how a daily re-run repairs one day of a date-partitioned fact at
    100 TB without rewriting the table."""
    with _partition_overwrite_dynamic(spark):
        df.write.mode("overwrite").partitionBy(*partition_by).parquet(path)


class _partition_overwrite_dynamic:
    def __init__(self, spark: SparkSession):
        self.spark = spark

    def __enter__(self):
        self.prev = self.spark.conf.get(
            "spark.sql.sources.partitionOverwriteMode", "static"
        )
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", self.prev)


def compact(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 128,
    partition_by: Sequence[str] = (),
) -> int:
    """Small-files compaction: rewrite a parquet table into
    ~target-file-size outputs. Streaming sinks and incremental appends
    accumulate small files; at scale, scan cost is dominated by file-open
    overhead once files ≪ the 128 MiB split size. Returns the new file
    count. Same staging-swap discipline as merge_upsert."""
    import shutil

    df = spark.read.parquet(path)
    total_bytes = sum(
        f.stat().st_size for f in Path(path).glob("**/*.parquet")
    )
    n_files = max(1, round(total_bytes / (target_file_mb * 1024 * 1024)))
    staging = f"{path}__compacting"
    writer = df.repartition(n_files).write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(staging)
    old = f"{path}__old"
    shutil.move(path, old)
    shutil.move(staging, path)
    shutil.rmtree(old)
    return len(list(Path(path).glob("**/*.parquet")))


def delete_keys(
    spark: SparkSession,
    path: str,
    keys_df: DataFrame,
    key_col: str,
    partition_by: Sequence[str],
) -> int:
    """Targeted row deletion from a partitioned parquet table (the
    right-to-be-forgotten / retention-sweep primitive): find the
    partitions that actually CONTAIN the doomed keys, rewrite only
    those with the survivors, leave every other partition's files
    untouched. At 100 TB a handful of keys usually lives in a handful
    of partitions — the rewrite cost is proportional to affected
    partitions, never to the table.

    Mechanics: one semi-join of the table against the (small,
    broadcastable) key set discovers affected partition values; the
    survivors of those partitions are rewritten via dynamic partition
    overwrite (only partitions present in the written frame are
    replaced). Returns the number of rows deleted.

    Dynamic overwrite only replaces partitions PRESENT in the written
    frame — a partition whose every row is deleted would survive as
    stale files. Those fully-emptied partitions are detected (affected
    minus survivor partition values) and their directories removed
    explicitly."""
    table = spark.read.parquet(path)
    affected = (
        table.join(F.broadcast(keys_df), table[key_col] == keys_df[key_col], "left_semi")
        .select(*partition_by)
        .distinct()
    )
    affected_rows = table.join(F.broadcast(affected), list(partition_by), "left_semi")
    n_before = affected_rows.count()
    survivors = affected_rows.join(
        F.broadcast(keys_df), affected_rows[key_col] == keys_df[key_col], "left_anti"
    )
    n_after = survivors.count()
    emptied = affected.join(
        survivors.select(*partition_by).distinct(), list(partition_by), "left_anti"
    ).collect()
    with _partition_overwrite_dynamic(spark):
        survivors.write.mode("overwrite").partitionBy(*partition_by).parquet(path)
    import shutil

    for row in emptied:
        d = Path(path)
        for col in partition_by:
            d = d / f"{col}={row[col]}"
        if d.exists():
            shutil.rmtree(d)
    return n_before - n_after
