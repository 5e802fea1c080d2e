"""Popularity-weighted negative sampling (word2vec-style, Mikolov et
al. 2013): draw k negatives per anchor proportional to item
popularity^alpha, deterministically, at corpus scale.

The classical single-node implementation is an alias table + RNG —
neither survives a cluster (shared mutable table, engine-local RNG
state). This formulation keeps the semantics and makes every draw a
pure function of (seed, anchor, slot):

1. **CDF**: items get integer weights w = round(count^alpha · scale)
   (the repo's quantize-before-aggregate discipline — cumulative sums
   are exact int64, no float accumulation order to disagree on), then
   one ordered cumulative sum assigns each item the half-open interval
   [cum_lo, cum_hi) of a 0..W integer line.
2. **Draws**: anchor × slot_j draws u = md5(seed‖anchor‖j) mod W —
   the engine-portable uniform (sampling.py), replayable across runs,
   backfills, and engines.
3. **Inversion**: u lands in exactly one item's interval. Instead of a
   range join (inequality theta-join → nested loop), both sides map to
   integer buckets of the weight line (bucket = v·B div W): each item
   replicates into the buckets its interval touches (≈ V + B rows
   total), each draw computes one bucket — so the lookup is a plain
   EQUI-join on bucket followed by the interval predicate, hash-
   partitionable and AQE-friendly. Per-draw fan-out = items
   intersecting one bucket ≈ max(1, V/B) — bounded, never V.
4. **Exclusion**: accidental positives (a drawn item the anchor
   actually interacted with) are dropped by a left-anti join, the
   standard word2vec rejection, kept deterministic (no redraw loop —
   anchors may get < k negatives, exactly reproducibly).

At 100 TB: the CDF is vocabulary-sized and builds once (the single
ordered cumsum window is the same bounded pass dense_ids uses; for a
beyond-memory vocabulary swap in its two-phase partition-offset form).
Draw generation and the bucket join shuffle only (anchor, slot, u) —
never text, never vectors. W (total weight) rides along as a 1-row
broadcast cross-join, not a driver collect.

All arithmetic is integer-exact except the one pow() building weights,
quantized at `scale` before anything accumulates (the DSIR libm
convention), so a DuckDB oracle reproduces every draw bit-for-bit and
the driver hash certifies the sampler itself.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from etl_demos_spark.operators.matutil import materialize_reused


def md5_mod(seed: str, *cols, mod_col) -> F.Column:
    """60-bit md5 uniform of seed‖cols, reduced mod ``mod_col`` —
    deterministic, engine-portable (mod bias < 2^-40 for any W that
    fits the weight line). Integer `div`/`%` only."""
    parts = [F.lit(seed)]
    for c in cols:
        parts.append(F.lit(":"))
        parts.append(c.cast("string"))
    h = F.conv(F.substring(F.md5(F.concat(*parts)), 1, 15), 16, 10).cast("long")
    return h % mod_col


def popularity_cdf(
    counts: DataFrame,
    item_col: str = "item",
    count_col: str = "cnt",
    alpha: float = 0.75,
    scale: int = 1000,
) -> DataFrame:
    """(item, w, cum_lo, cum_hi): integer sampling intervals on the
    0..W weight line, ordered by item id for a total, engine-agnostic
    order. w = round(count^alpha · scale) ≥ scale for count ≥ 1, so no
    zero-width intervals. One vocabulary-sized window pass."""
    w_int = F.round(
        F.pow(F.col(count_col).cast("double"), F.lit(alpha)) * scale, 0
    ).cast("long")
    wnd = Window.orderBy(F.col(item_col).asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        counts.select(F.col(item_col).alias("item"), w_int.alias("w"))
        .withColumn("cum_hi", F.sum("w").over(wnd))
        .withColumn("cum_lo", (F.col("cum_hi") - F.col("w")))
        .select("item", "w", "cum_lo", "cum_hi")
    )


def sample_negatives(
    anchors: DataFrame,
    cdf: DataFrame,
    k: int = 5,
    anchor_col: str = "anchor",
    seed: str = "neg0",
    n_buckets: int = 1024,
    positives: DataFrame | None = None,
    pos_item_col: str = "item",
) -> DataFrame:
    """k popularity-weighted negative draws per anchor →
    (anchor, slot, item, u). ``positives`` (anchor_col, pos_item_col)
    removes accidental positives. Deterministic: same inputs → same
    rows, on any engine, any partitioning."""
    # the CDF (a vocabulary-wide single-partition cumulative sum — the
    # operator's one serialized pass) feeds the bucket index AND both
    # total aggregations: materialize it so it runs once per job
    # (eager localCheckpoint via matutil — persist() leaked a
    # CacheManager entry per call with no unpersist point)
    cdf = materialize_reused(cdf)
    total = cdf.agg(F.max("cum_hi").alias("line_w"))
    cdf_t = cdf.crossJoin(F.broadcast(total))
    # bucket = v·B div W, computed through decimal(38,0): the plain
    # int64 product v*B overflows once W > 2^63/B (~9e15 at B=1024 —
    # reachable with billions of items at scale=1000) and silently
    # corrupts routing under non-ANSI semantics. Bucketing only routes
    # the join — the result filter is the exact [cum_lo, cum_hi)
    # interval — so any monotone bucket function is correct as long as
    # probe and build use the SAME one; decimal makes it exact at any W.
    def _bucket(v: str) -> str:
        return f"CAST(CAST(({v}) AS DECIMAL(38,0)) * {n_buckets} div line_w AS BIGINT)"

    # item → every bucket its interval touches (≈ V + B rows)
    item_buckets = cdf_t.select(
        "item",
        "cum_lo",
        "cum_hi",
        "line_w",
        F.explode(
            F.sequence(
                F.expr(_bucket("cum_lo")),
                F.expr(_bucket("cum_hi - 1")),
            )
        ).alias("bucket"),
    )
    slots = F.explode(F.sequence(F.lit(1), F.lit(k))).alias("slot")
    draws = (
        anchors.select(F.col(anchor_col).alias("anchor"))
        .distinct()
        .crossJoin(F.broadcast(total))
        .select("anchor", "line_w", slots)
        .select(
            "anchor",
            "slot",
            "line_w",
            md5_mod(
                seed, F.col("anchor"), F.col("slot"), mod_col=F.col("line_w")
            ).alias("u"),
        )
        .withColumn("bucket", F.expr(_bucket("u")))
        .drop("line_w")
    )
    hits = (
        draws.join(item_buckets.drop("line_w"), "bucket")
        .filter((F.col("u") >= F.col("cum_lo")) & (F.col("u") < F.col("cum_hi")))
        .select("anchor", "slot", "item", "u")
    )
    if positives is not None:
        pos = positives.select(
            F.col(anchor_col).alias("anchor"), F.col(pos_item_col).alias("item")
        )
        hits = hits.join(pos, ["anchor", "item"], "left_anti")
    return hits
