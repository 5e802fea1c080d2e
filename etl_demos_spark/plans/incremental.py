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
    recover_interrupted_swap(path)
    p = Path(path)
    return p.exists() and any(p.glob("**/*.parquet"))


def recover_interrupted_swap(path: str) -> None:
    """Heal the crash window of :func:`swap_table`. Invariants it
    restores (the swap is write-staging → move path→old → move
    staging→path → rm old):

    - ``path`` missing, ``__staging`` present: the crash hit between the
      two moves — staging holds the COMPLETE new table (fully written
      before the swap began), so promote it.
    - ``path`` missing, only ``__old`` present: restore the backup.
    - ``path`` present, ``__old`` left behind: the swap finished, only
      cleanup died — remove the stale backup (leaving it would make the
      next swap nest the table inside it).
    - ``path`` present, ``__staging`` left behind: a pre-swap crash —
      discard the orphan; the caller recomputes it.

    Without this, a crash between the moves left NOTHING at ``path`` and
    the next merge_upsert silently rebuilt the table from just its
    update batch, discarding all prior rows."""
    import shutil

    p, old, staging = Path(path), Path(f"{path}__old"), Path(f"{path}__staging")
    if not p.exists():
        if staging.exists():
            shutil.move(str(staging), str(p))
        elif old.exists():
            shutil.move(str(old), str(p))
    if p.exists():
        if old.exists():
            shutil.rmtree(old)
        if staging.exists():
            shutil.rmtree(staging)


def swap_table(path: str, staging: str) -> None:
    """Replace the table at ``path`` with the fully-written ``staging``
    directory, recoverably: every intermediate crash state is healed by
    :func:`recover_interrupted_swap` (run it before reading the table —
    table_exists does). NOTE: recovery must NOT run here — at this point
    ``staging`` is the live new table, and the 'discard orphan staging'
    rule would destroy it. Local-FS moves; on an object store use a
    transactional table format instead."""
    import shutil

    old = f"{path}__old"
    if Path(old).exists():  # stale backup from a crashed cleanup
        shutil.rmtree(old)
    if Path(path).exists():
        shutil.move(path, old)
    shutil.move(staging, path)
    if Path(old).exists():
        shutil.rmtree(old)


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

    Rewrite goes through a staging location then swaps (with interrupted-
    swap recovery), so a failed job never leaves the target half-written
    OR missing.
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
    swap_table(path, staging)
    return spark.read.parquet(path)


def _partition_leaf_dirs(root: Path) -> list[str]:
    """Relative paths of the partition leaf dirs under a partitioned
    parquet root (dirs that directly contain data files)."""
    import os

    out = []
    if not root.exists():
        return out
    for d, _dirs, files in os.walk(root):
        if d != str(root) and any(not f.startswith("_") for f in files):
            out.append(os.path.relpath(d, root))
    return out


def recover_interrupted_partition_swap(path: str) -> None:
    """Heal :func:`merge_upsert_partitioned`'s per-partition swap crash
    window. For every partition left behind in ``__pstaging`` (the
    complete new version, fully written before any move) or ``__pold``
    (the backup): if the live table is missing that partition, promote
    staging — or restore the backup if staging already moved; if the
    live table has it, the leftovers are stale. No crash point loses a
    partition: either the live dir, the staging dir, or the backup dir
    holds a complete copy at all times."""
    import shutil

    p = Path(path)
    stag = Path(f"{path}__pstaging")
    old = Path(f"{path}__pold")
    if not stag.exists() and not old.exists():
        return
    for rel in set(_partition_leaf_dirs(stag)) | set(_partition_leaf_dirs(old)):
        tgt = p / rel
        if not tgt.exists():
            src = stag / rel if (stag / rel).exists() else old / rel
            tgt.parent.mkdir(parents=True, exist_ok=True)
            shutil.move(str(src), str(tgt))
    shutil.rmtree(stag, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)


def merge_upsert_partitioned(
    spark: SparkSession,
    updates: DataFrame,
    path: str,
    keys: Sequence[str],
    partition_by: Sequence[str],
) -> DataFrame:
    """Partition-scoped upsert: replaces rows with matching ``keys`` but
    rewrites ONLY the partitions present in ``updates``, so per-call
    cost ∝ affected-partition bytes — never total table size. This is
    the 100 TB form of :func:`merge_upsert` for time-bucketed tables: a
    full-table anti-join-and-rewrite per micro-batch grows with history
    and contradicts any work-∝-batch contract.

    Contract: a key tuple must functionally determine its partition
    values (a key never moves between partitions) — otherwise the old
    row would survive untouched in its previous partition. The affected
    partition list is collected to the driver (bounded: one row per
    affected partition — for day-bucketed streams that is a handful per
    batch) and pushed as a literal filter so the current-rows scan is
    partition-PRUNED, not just filtered. ``updates`` is eagerly
    materialized on entry: its plan feeds the parts collect, the
    anti-join and the write, and a non-deterministic plan (sampling,
    rand salting) evaluated three times could write partitions the keep
    scan never covered.

    Crash safety: the merged affected partitions are fully written to a
    ``__pstaging`` sibling, then swapped in per partition (live →
    ``__pold``, staging → live) — the same staging-then-swap discipline
    as :func:`merge_upsert`, scoped per partition. Dynamic partition
    overwrite is deliberately NOT used here: its commit deletes the old
    partition before renaming the new one in, and a crash between the
    two leaves the partition EMPTY — a replayed batch would then derive
    its keep-set from the emptied partition and silently lose every
    kept row. (:func:`backfill_partitions` may keep dynamic overwrite
    because its callers rebuild partitions from UPSTREAM data, never
    from the table being replaced.) Every crash point here is healed by
    :func:`recover_interrupted_partition_swap`, which runs on entry.

    Replay-idempotent: identical updates rewrite identical partition
    contents; a batch interrupted after some partitions swapped is
    simply partially applied, and replaying it converges (keyed merge
    over any mix of old/new partition states yields the same rows).
    """
    recover_interrupted_partition_swap(path)
    if not table_exists(path):
        updates.write.mode("overwrite").partitionBy(*partition_by).parquet(path)
        return spark.read.parquet(path)

    updates = updates.localCheckpoint(eager=True)
    parts = updates.select(*partition_by).distinct().collect()
    current = spark.read.parquet(path)
    cond = F.lit(False)
    for row in parts:
        c = F.lit(True)
        for p in partition_by:
            # null-safe: a NULL partition value (Hive __HIVE_DEFAULT_
            # PARTITION__) must select its partition, not vanish under
            # three-valued logic (same contract as delete_keys)
            c = c & F.col(p).eqNullSafe(F.lit(row[p]))
        cond = cond | c
    cur_aff = current.filter(cond)
    keep = cur_aff.join(updates.select(*keys).distinct(), list(keys), "left_anti")
    merged = keep.unionByName(updates.select(*current.columns))

    import shutil

    staging = f"{path}__pstaging"
    merged.write.mode("overwrite").partitionBy(*partition_by).parquet(staging)
    old_root = Path(f"{path}__pold")
    for rel in _partition_leaf_dirs(Path(staging)):
        tgt = Path(path) / rel
        if tgt.exists():
            bak = old_root / rel
            bak.parent.mkdir(parents=True, exist_ok=True)
            shutil.move(str(tgt), str(bak))
        tgt.parent.mkdir(parents=True, exist_ok=True)
        shutil.move(str(Path(staging) / rel), str(tgt))
    shutil.rmtree(staging, ignore_errors=True)
    shutil.rmtree(old_root, ignore_errors=True)
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
    count. Same staging-swap discipline as merge_upsert.

    Partitioned tables repartition ON the partition columns: a plain
    round-robin repartition(n) followed by partitionBy would make every
    task emit a file per partition value — up to n × |partitions|
    outputs, INCREASING the file count compaction exists to cut. Hashing
    on the partition columns co-locates each partition's rows in (at
    most) one task, so output files ≈ max(partitions, n_files)."""
    # Heal a swap interrupted between its two moves BEFORE reading: in a
    # compact-only workflow nothing else would, and the table would look
    # missing (PATH_NOT_FOUND) until some merge_upsert happened to run.
    # BOTH swap families: whole-table (__staging/__old) AND per-partition
    # (__pstaging/__pold) — a compact after a crashed partitioned upsert
    # would otherwise read a table missing a partition and then REWRITE
    # it that way, turning a healable crash window into permanent loss.
    recover_interrupted_swap(path)
    recover_interrupted_partition_swap(path)
    df = spark.read.parquet(path)
    total_bytes = sum(
        f.stat().st_size for f in Path(path).glob("**/*.parquet")
    )
    n_files = max(1, round(total_bytes / (target_file_mb * 1024 * 1024)))
    staging = f"{path}__staging"
    if partition_by:
        shaped = df.repartition(n_files, *[F.col(c) for c in partition_by])
        writer = shaped.write.mode("overwrite").partitionBy(*partition_by)
    else:
        writer = df.repartition(n_files).write.mode("overwrite")
    writer.parquet(staging)
    swap_table(path, staging)
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

    # partition joins use NULL-SAFE equality throughout: rows in a NULL
    # partition are real rows (Spark writes them under
    # __HIVE_DEFAULT_PARTITION__), and a plain equi-join would silently
    # skip them — doomed keys living there would survive the sweep AND
    # be missing from the returned count.
    def null_safe_on(lhs, rhs):
        cond = None
        for c in partition_by:
            cur = lhs[c].eqNullSafe(rhs[c])
            cond = cur if cond is None else (cond & cur)
        return cond

    affected_rows = table.join(
        F.broadcast(affected), null_safe_on(table, affected), "left_semi"
    )
    n_before = affected_rows.count()
    survivors = affected_rows.join(
        F.broadcast(keys_df), affected_rows[key_col] == keys_df[key_col], "left_anti"
    )
    n_after = survivors.count()
    surv_parts = survivors.select(*partition_by).distinct()
    emptied = affected.join(
        surv_parts, null_safe_on(affected, surv_parts), "left_anti"
    ).collect()
    with _partition_overwrite_dynamic(spark):
        survivors.write.mode("overwrite").partitionBy(*partition_by).parquet(path)
    import shutil

    for row in emptied:
        d = Path(path)
        for col in partition_by:
            v = row[col]
            d = d / f"{col}={'__HIVE_DEFAULT_PARTITION__' if v is None else v}"
        if d.exists():
            shutil.rmtree(d)
    return n_before - n_after
