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
    watermark). ``keys`` should NOT include the timestamp — replays
    carry the same event time, and including it would only narrow the
    match to exact-timestamp replays anyway, which is what we want for
    idempotent re-delivery: (key..., same content) collapses, a new
    reading of the same key at a later event time survives."""
    return stream.withWatermark(ts_col, horizon).dropDuplicatesWithinWatermark(
        list(keys)
    )


def dedup_stream_exact(stream: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Unbounded streaming dedup — state = one entry per distinct key,
    forever. Bounded key domains only."""
    return stream.dropDuplicates(list(keys))
