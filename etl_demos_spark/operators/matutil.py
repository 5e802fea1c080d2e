"""Materialization strategy for multi-consumer / per-iteration frames.

The round-6 measurements (PERF.md) settled a repo-wide question: a
frame consumed a handful of times inside one operator call should be
eagerly ``localCheckpoint``'d, not ``persist()``'d —

- ``persist()`` builds a COLUMNAR compressed in-memory cache; for
  diverse intermediate tables the build costs more than it saves
  (q_gap_fill: persist +48% vs recompute; dsir features: persist 5.00 s
  vs checkpoint 2.20 s medians, interleaved), and with no unpersist
  point (the returned lazy frame references the intermediate) every
  call leaks a CacheManager entry that driver GC never frees.
- ``localCheckpoint(eager=True)`` writes raw blocks (cheap), truncates
  the plan (keeps iterative lineage linear), and its blocks are freed
  by the ContextCleaner when the frame is garbage collected.

The one measured exception: HIGHLY REDUNDANT tables (the 1M-doc stress
corpus with 40 distinct texts) where columnar RLE compression flips the
ranking — operators expose a ``materialize=`` knob where that regime is
plausible (dsir_select, resample_locf).

``materialize_reused`` is the shared entry point so an interleaved A/B
harness (see the inline scripts documented in PERF.md round-6) can swap
the strategy process-wide without touching operators. Valid strategies:
``checkpoint`` (default, eager), ``checkpoint_lazy`` (plan truncation
without the upfront job — first consumer pays it; measured no better
than eager on the simhash case), ``persist``, ``none`` (recompute per
consumer). NOT for sites where materialization is a correctness
requirement (e.g. the CSV corrupt-record read) — those call
localCheckpoint directly so "none" cannot break them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: swapped process-wide by A/B harnesses; operators call materialize_reused
STRATEGY = "checkpoint"

_VALID = ("checkpoint", "checkpoint_lazy", "persist", "none")


def materialize_reused(df: DataFrame) -> DataFrame:
    """Materialize a frame that is consumed multiple times within one
    operator call (or once per iteration round)."""
    if STRATEGY == "persist":
        return df.persist()
    if STRATEGY == "none":
        return df
    if STRATEGY == "checkpoint_lazy":
        return df.localCheckpoint(eager=False)
    if STRATEGY != "checkpoint":
        raise ValueError(f"matutil.STRATEGY {STRATEGY!r} not in {_VALID}")
    return df.localCheckpoint(eager=True)


def materialize_stats(df: DataFrame, *aggs):
    """Materialize a reused frame AND compute routing statistics in the
    SAME job: the checkpoint is marked lazily and the caller's aggregate
    is the action that materializes it, so size-routing probes
    (graph.py, embedding_dedup.py) cost zero extra jobs — previously an
    eager checkpoint job plus a dedicated ``count()`` job per operator
    call (VERDICT r11 rec 7). Returns ``(materialized_df, Row)`` where
    Row holds the requested aggregates.

    Strategy-aware like :func:`materialize_reused`: under ``persist``
    the agg populates the cache, under ``none`` the agg is one extra
    execution of the plan (the documented recompute arm)."""
    if STRATEGY == "persist":
        out = df.persist()
    elif STRATEGY == "none":
        out = df
    elif STRATEGY in ("checkpoint", "checkpoint_lazy"):
        out = df.localCheckpoint(eager=False)
    else:
        raise ValueError(f"matutil.STRATEGY {STRATEGY!r} not in {_VALID}")
    return out, out.agg(*aggs).collect()[0]
