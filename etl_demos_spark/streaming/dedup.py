"""Streaming deduplication — the ingestion-side exactly-once guard.

At-least-once sources (Kafka replays, retried file commits) deliver the
same record twice; the dedup layer drops replays BEFORE they reach
silver/gold so downstream aggregates stay correct without reprocessing.

Two semantics, both state-bounded:

- ``dedup_stream_within_watermark``: drop a record if its key was seen
  within the watermark horizon (``dropDuplicatesWithinWatermark``).
  State per key expires with the watermark → bounded by
  (horizon × key arrival rate), the right choice when replays are
  near-in-time (the usual at-least-once case). Records deduped only
  against the horizon — a replay arriving later than the horizon
  passes, which is the documented trade-off of EVERY watermarked dedup.
- ``dedup_stream_exact``: ``dropDuplicates`` on the keys with NO
  watermark bound — state grows with distinct keys forever. Only for
  bounded key domains (dimension upserts), kept here mostly to make the
  state-growth contrast explicit in one place.

Batch equivalence: on a batch DataFrame the same keys deduped with
``dropDuplicates`` give the same survivors (modulo which physical copy
survives — callers needing a deterministic winner use
operators/keys.py:dedup_first with an explicit order)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def dedup_stream_within_watermark(
    stream: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    horizon: str = "1 hour",
) -> DataFrame:
    """Watermark-bounded streaming dedup (state expires with the
    watermark). The match is on ``keys`` ALONE: any later record with
    the same key inside the horizon is dropped too, not just
    exact-timestamp replays — so ``keys`` must uniquely identify the
    EVENT (an event id, or key + ts, or key + content hash), not just
    the entity. Passing a bare entity key (e.g. sensor_id) silently
    drops that entity's genuinely new readings for the whole horizon.
    For replay-only dedup of an unkeyed feed, include ``ts_col`` in
    ``keys``: replays carry the same event time, so (key, ts)
    collapses redelivery while later readings survive."""
    return stream.withWatermark(ts_col, horizon).dropDuplicatesWithinWatermark(
        list(keys)
    )


def dedup_stream_exact(stream: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Unbounded streaming dedup — state = one entry per distinct key,
    forever. Bounded key domains only."""
    return stream.dropDuplicates(list(keys))


# ---------------------------------------------------------------------------
# Streaming NEAR-dup dedup (MinHash signature store maintained per batch)
# ---------------------------------------------------------------------------


def near_dedup_batch_processor(
    out_path: str,
    store_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
):
    """foreachBatch body for streaming near-duplicate dedup.

    Exact-replay dedup (above) catches byte-identical redelivery;
    crawl/ingest streams ALSO carry near-duplicates (boilerplate
    re-renders, mirrored pages) that only signature dedup sees. Per
    micro-batch: dedup the batch against itself and the persisted
    MinHash signature store (operators/dedup.incremental_minhash_dedup —
    corpus text is never re-read; the probe ships banded bucket keys),
    append the surviving rows to ``out_path``, persist the updated store
    for the next batch. First-seen-wins across batches — the same
    semantic as the watermark replay guard, minus the horizon bound:
    store size grows with the deduped corpus (one k-long signature per
    survivor), which is the honest cost of unbounded near-dup memory;
    bound it by sweeping old ids out of the store on your retention
    policy if the corpus is append-forever.

    Crash-safety (foreachBatch is at-least-once, so every write here
    must tolerate a replay of the same batch_id):

    - survivors land under a ``__batch_id`` partition via DYNAMIC
      partition overwrite — a replay replaces its own partition instead
      of appending duplicates;
    - the signature store updates through the staging-then-swap
      discipline (plans/incremental.merge_upsert's), so a crash mid-
      write leaves the OLD store intact, never a deleted/partial one;
    - replay after a completed store swap is also safe: the batch's
      docs now match their own stored signatures, kept comes back
      empty, the (dynamic) overwrite touches no partition, and the
      store union is a no-op — the previously-written output stands.

    Returns the ``(batch_df, batch_id) -> None`` closure for
    ``writeStream.foreachBatch``; also usable directly on batch
    DataFrames (the semantics tests drive it that way, deterministically
    ordered)."""
    from etl_demos_spark.operators.dedup import incremental_minhash_dedup

    def dedup_fn(batch_df: DataFrame, store: DataFrame | None):
        return incremental_minhash_dedup(
            batch_df, store, id_col=id_col, text_col=text_col,
            threshold=threshold,
        )

    return _store_probe_batch_processor(out_path, store_path, id_col, dedup_fn)


def image_dedup_batch_processor(
    out_path: str,
    store_path: str,
    id_col: str = "id",
    content_col: str = "content",
    algo: str = "dhash",
    max_hamming: int = 0,
):
    """foreachBatch body for streaming PERCEPTUAL image dedup — the
    pixel-granularity twin of :func:`near_dedup_batch_processor`:
    per micro-batch, decode + signature the batch once, probe the
    persisted (id, sig) store via banded chunk keys
    (operators/image_dedup.incremental_image_dedup — prior payloads are
    never re-decoded), append survivors, swap the updated store.
    First-seen-wins across batches; crash-safety (partition-scoped
    replay overwrite + staging-then-swap store) is the shared
    scaffolding's — see _store_probe_batch_processor."""
    from etl_demos_spark.operators.image_dedup import incremental_image_dedup

    def dedup_fn(batch_df: DataFrame, store: DataFrame | None):
        return incremental_image_dedup(
            batch_df, store, algo, max_hamming, id_col, content_col
        )

    return _store_probe_batch_processor(out_path, store_path, id_col, dedup_fn)


def video_dedup_batch_processor(
    out_path: str,
    store_path: str,
    id_col: str = "id",
    content_col: str = "content",
):
    """foreachBatch body for streaming EXACT video dedup — the
    container-granularity twin of :func:`image_dedup_batch_processor`:
    per micro-batch, walk + fingerprint the batch's AVI payloads once
    (operators/video_dedup.incremental_video_dedup — prior payloads
    are never re-walked; only 64-hex fingerprints ship), probe the
    persisted (id, n_frames, fp) store, append survivors, swap the
    updated store. First-seen-wins across batches; exact fingerprint
    equality is transitive, so the replay identity holds
    unconditionally. Crash-safety (partition-scoped replay overwrite +
    staging-then-swap store) is the shared scaffolding's — see
    _store_probe_batch_processor."""
    from etl_demos_spark.operators.video_dedup import incremental_video_dedup

    def dedup_fn(batch_df: DataFrame, store: DataFrame | None):
        return incremental_video_dedup(batch_df, store, id_col, content_col)

    return _store_probe_batch_processor(out_path, store_path, id_col, dedup_fn)


def _store_probe_batch_processor(
    out_path: str,
    store_path: str,
    id_col: str,
    dedup_fn,
):
    """Shared crash-safe scaffolding for probe-a-persisted-store dedup
    processors (MinHash text, perceptual image): ``dedup_fn(batch_df,
    store_or_None) -> (kept_ids, updated_store)`` supplies the
    semantics; this supplies the at-least-once armor:

    - survivors land under a ``__batch_id`` partition via DYNAMIC
      partition overwrite — a replay replaces its own partition instead
      of appending duplicates;
    - the signature store updates through the staging-then-swap
      discipline (plans/incremental.merge_upsert's), so a crash mid-
      write leaves the OLD store intact, never a deleted/partial one;
    - replay after a completed store swap is also safe: the batch's
      rows now match their own stored signatures, kept comes back
      empty, the (dynamic) overwrite touches no partition, and the
      store union is a no-op — the previously-written output stands."""
    from etl_demos_spark.plans.incremental import (
        backfill_partitions,
        swap_table,
        table_exists,
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        spark = batch_df.sparkSession
        # an at-least-once source can deliver the same row twice WITHIN
        # one micro-batch: signatures collapse to one row but a join
        # back against the raw batch would multiply the survivor
        batch_df = batch_df.dropDuplicates([id_col])
        # table_exists heals any interrupted store swap from a prior
        # crash before we read — without recovery a crash between the
        # swap's moves would leave no store and silently forget every
        # prior survivor
        store = (
            spark.read.parquet(store_path)
            if table_exists(store_path)
            else None
        )
        kept, updated = dedup_fn(batch_df, store)
        survivors = batch_df.join(kept, id_col).withColumn(
            "__batch_id", F.lit(batch_id)
        )
        backfill_partitions(spark, survivors, out_path, ["__batch_id"])
        # store update via the shared staging-then-swap (materialize
        # first — the plan reads the path being replaced)
        staging = f"{store_path}__staging"
        updated.localCheckpoint().write.mode("overwrite").parquet(staging)
        swap_table(store_path, staging)

    return process


def run_near_dedup_stream(
    spark,
    src_path: str,
    out_path: str,
    store_path: str,
    schema,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
):
    """Wire ``near_dedup_batch_processor`` to a file-source stream
    (availableNow trigger — drains the backlog then stops)."""
    stream = spark.readStream.schema(schema).parquet(src_path)
    return (
        stream.writeStream.foreachBatch(
            near_dedup_batch_processor(
                out_path, store_path, id_col, text_col, threshold
            )
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def run_image_dedup_stream(
    spark,
    src_path: str,
    out_path: str,
    store_path: str,
    schema,
    checkpoint: str,
    id_col: str = "id",
    content_col: str = "content",
    algo: str = "dhash",
    max_hamming: int = 0,
):
    """Wire ``image_dedup_batch_processor`` to a file-source stream
    (availableNow trigger — drains the backlog then stops)."""
    stream = spark.readStream.schema(schema).parquet(src_path)
    return (
        stream.writeStream.foreachBatch(
            image_dedup_batch_processor(
                out_path, store_path, id_col, content_col, algo, max_hamming
            )
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def run_video_dedup_stream(
    spark,
    src_path: str,
    out_path: str,
    store_path: str,
    schema,
    checkpoint: str,
    id_col: str = "id",
    content_col: str = "content",
):
    """Wire ``video_dedup_batch_processor`` to a file-source stream
    (availableNow trigger — drains the backlog then stops)."""
    stream = spark.readStream.schema(schema).parquet(src_path)
    return (
        stream.writeStream.foreachBatch(
            video_dedup_batch_processor(out_path, store_path, id_col, content_col)
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
