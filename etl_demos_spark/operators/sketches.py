"""Mergeable sketch aggregates (Apache DataSketches via Spark built-ins).

The 100 TB pattern these enable: *pre-aggregate once, re-aggregate
cheaply forever*. A distinct-count over an arbitrary date range normally
re-scans the raw data per question; with per-(key, day) HLL sketch
partials stored (a few KB each), any range/rollup answer is a union of
sketches — work ∝ number of partials, never raw rows. HLL register
updates are max-operations, so sketches are insertion-order-independent
and deterministic for a given input set and lg_k: union-of-dailies is
byte-equivalent in estimate to the whole-corpus sketch (asserted in
tests/test_scale_utils.py).

DuckDB cannot reproduce DataSketches binaries, so oracle pairing for the
workload query uses exact distinct counts for the hash-checked columns
and expresses the sketch property as a within-tolerance boolean (the
honest cross-engine form; the exact-equality mergeability check lives in
the pytest suite).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def distinct_sketches(
    df: DataFrame,
    group_cols: tuple[str, ...],
    value_col: str,
    lg_k: int = 14,
) -> DataFrame:
    """Per-group HLL sketch partials of ``value_col`` (binary, ~2^lg_k
    bytes max each). One combiner-friendly hash agg — sketch updates
    happen map-side; the shuffle carries one sketch per group per
    partition, not rows. Store these (e.g. per day) as the reusable
    pre-aggregate."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("sketch"),
        F.count(F.lit(1)).alias("rows_in"),
    )


def merge_sketch_rollup(
    sketches: DataFrame,
    rollup_cols: tuple[str, ...],
    sketch_col: str = "sketch",
) -> DataFrame:
    """Re-aggregate stored partials to a coarser grouping: union the
    sketches, then estimate. Input rows ∝ finer-grain groups (tiny);
    no raw data touched. The same shape answers date-range questions:
    filter the partials to the range, then merge."""
    return sketches.groupBy(*rollup_cols).agg(
        F.hll_sketch_estimate(F.hll_union_agg(sketch_col)).alias("approx_distinct"),
        F.sum("rows_in").cast("long").alias("rows_in"),
    )
