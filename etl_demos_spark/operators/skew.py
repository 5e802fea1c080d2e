"""Skew mitigation: salted joins and AQE notes.

First line of defense is AQE's skew-join splitting
(spark.sql.adaptive.skewJoin.enabled, on in session.RUNTIME_CONFS) —
it handles skewed *sort-merge* joins transparently. Salting is for the
cases AQE can't rewrite: skewed aggregations and skewed broadcast-join
build keys.

``salted_agg``: two-phase aggregation — groupBy(key, salt) partial, then
groupBy(key) final. Works for any algebraic aggregate (sum/count/min/max);
here exposed for the common count/sum case.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def with_salt(df: DataFrame, buckets: int, col_name: str = "__salt") -> DataFrame:
    """Uniform deterministic salt derived from a stable row hash (NOT
    rand() and NOT monotonically_increasing_id(): retries/speculative
    tasks must salt identically, or a recomputed map task routes rows to
    different reduce partitions than its first attempt — the classic
    silent row-loss/duplication corruption).

    Known limitation of content salting: rows that are FULLY identical
    tuples share a salt, so a hot key whose rows are exact duplicates
    still funnels into one bucket. That trade is deliberate — the
    alternatives are all retry-unstable. If your hot keys are exact
    duplicate rows, pre-aggregate them (count per distinct tuple) first.

    Map-typed columns are excluded from the hash input (Spark disallows
    hash on MapType); if every column is a map the salt falls back to a
    constant, preserving correctness without mitigation."""
    from pyspark.sql.types import MapType

    hashable = [
        f.name for f in df.schema.fields if not isinstance(f.dataType, MapType)
    ]
    salt = (
        F.pmod(F.xxhash64(*[F.col(c) for c in hashable]), F.lit(buckets))
        if hashable
        else F.lit(0)
    )
    return df.withColumn(col_name, salt)


def salted_sum(
    df: DataFrame,
    keys: Sequence[str],
    sums: dict[str, Column],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-proof aggregation: the hot key spreads over
    ``buckets`` partitions in phase 1; phase 2 reduces ``buckets`` rows per
    key — bounded regardless of skew."""
    salted = with_salt(df, buckets)
    phase1 = salted.groupBy(*keys, "__salt").agg(
        F.count(F.lit(1)).alias("__cnt"),
        *[expr.alias(f"__s_{name}") for name, expr in sums.items()],
    )
    return phase1.groupBy(*keys).agg(
        F.sum("__cnt").alias("n_rows"),
        *[F.sum(f"__s_{name}").alias(name) for name in sums],
    )


def salted_join_left(
    big: DataFrame,
    small: DataFrame,
    key: str,
    buckets: int = 8,
) -> DataFrame:
    """Skewed equi-join without broadcast: salt the big side, explode the
    small side ``buckets``× so every salted key finds its match. Use when
    the small side is too big to broadcast AND the big side's key is
    skewed (else AQE's skew split already covers sort-merge).

    The big side salts by content (with_salt), not by
    monotonically_increasing_id: the id is nondeterministic across
    retries, so a recomputed task would send rows to different salted
    partitions than its first attempt — silently losing/duplicating
    join rows. Content salting means exact-duplicate hot rows share a
    bucket (see with_salt); for joins that is acceptable — duplicates
    carry identical join payloads."""
    big_s = with_salt(big, buckets)
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    out = big_s.join(small_s, [key, "__salt"], "left")
    return out.drop("__salt")
