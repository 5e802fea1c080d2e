"""Range joins (point-in-interval, interval-overlap) without the
quadratic nested-loop plan.

Spark has no native range-join operator: an inequality-only join
condition compiles to BroadcastNestedLoopJoin (|P|x|I| comparisons) or,
with an equi-key plus range residual, to a hash join that evaluates the
residual per colliding pair. Both die when intervals are many and keys
are coarse. The standard scalable formulation — the same one behind
interval-join implementations in stream processors and the range-join
optimizations in SQL engines — buckets the domain into fixed granules:

- every interval explodes into the granules it covers
  (``sequence(floor(start/g), floor(end/g))``);
- every point maps to its single granule;
- an ordinary shuffled **equi-join** on (keys..., granule) finds
  candidates; the exact predicate filters them.

Work is ``|P| + sum(interval_len/g)`` join-side rows instead of
``|P| x |I|`` comparisons; the join is a plain hash join, so AQE
skew-split and broadcast promotion apply as usual. For
interval x interval overlap, a candidate pair can share several
granules, so the pair is emitted only in the granule where the later
interval starts — exactly-once without a distinct.

Granule choice: explode factor is ``len/g`` per interval; point
granules are free. Pick g near the median interval length — one order
of magnitude either way only shifts work between the explode and the
per-bucket candidate count.

Domains are numeric (long/double/date-as-days). Timestamps/dates cast
to a number first (``F.datediff``/``unix_timestamp``) — keeping the
operator numeric keeps the granule arithmetic exact and codegen'd.

Reference parity: the reference engine has equality joins only
(SURVEY.md §2.3); this operator is north-star extension surface (as-of
join's sibling — asof.py covers "latest at or before", this covers
containment and overlap).
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _bucket(col: Column, granule: float) -> Column:
    return F.floor(col / F.lit(float(granule))).cast("long")


def range_join_point(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    granule: float,
    keys: Sequence[str] = (),
) -> DataFrame:
    """Inner-join each point row to every interval row with
    ``start <= point <= end`` (and equal ``keys``, if given).

    Each matching (point, interval) pair shares exactly one granule —
    the point's — so no dedup is needed. Columns from both inputs
    survive; name collisions beyond ``keys`` are the caller's to avoid.
    """
    if granule <= 0:
        raise ValueError("granule must be positive")
    iv = intervals.withColumn(
        "__rj_b",
        F.explode(
            F.sequence(_bucket(F.col(start_col), granule),
                       _bucket(F.col(end_col), granule))
        ),
    )
    pt = points.withColumn("__rj_b", _bucket(F.col(point_col), granule))
    on = list(keys) + ["__rj_b"]
    return (
        pt.join(iv, on)
        .filter(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) <= F.col(end_col))
        )
        .drop("__rj_b")
    )


def range_join_overlap(
    left: DataFrame,
    right: DataFrame,
    left_bounds: tuple[str, str],
    right_bounds: tuple[str, str],
    granule: float,
    keys: Sequence[str] = (),
) -> DataFrame:
    """Inner-join interval rows that overlap: ``ls <= re AND rs <= le``
    (closed intervals, and equal ``keys`` if given).

    Both sides explode into covered granules; a pair overlapping across
    k shared granules would match k times, so the match is kept only in
    the granule where the later-starting interval begins:
    ``b == max(floor(ls/g), floor(rs/g))`` — every overlapping pair has
    exactly one such granule, and both sides cover it.
    """
    if granule <= 0:
        raise ValueError("granule must be positive")
    ls, le = left_bounds
    rs, re = right_bounds

    def exploded(df: DataFrame, s: str, e: str) -> DataFrame:
        return df.withColumn(
            "__rj_b",
            F.explode(
                F.sequence(_bucket(F.col(s), granule),
                           _bucket(F.col(e), granule))
            ),
        )

    on = list(keys) + ["__rj_b"]
    return (
        exploded(left, ls, le)
        .join(exploded(right, rs, re), on)
        .filter(
            (F.col(ls) <= F.col(re))
            & (F.col(rs) <= F.col(le))
            & (
                F.col("__rj_b")
                == F.greatest(_bucket(F.col(ls), granule),
                              _bucket(F.col(rs), granule))
            )
        )
        .drop("__rj_b")
    )
