"""Embedding-column preparation: normalization, quantization, centroids.

Storage/prep counterparts to the search family (operators/similarity.py,
operators/embedding_dedup.py): a 100 TB embedding pipeline normalizes
once at ingest (so cosine becomes a plain dot product downstream),
quantizes for storage (int8 symmetric — 4× smaller than float32, the
standard serving trade-off), and maintains per-group centroids (IVF
coarse quantizers, per-language/per-source corpus statistics).

All one-pass, JVM-side expressions over ``array<float>`` — no shuffle
except the centroid groupBy, which is a plain keyed partial-agg. The
higher-order functions here run once per ingest write (not per query),
so interpreted-lambda cost is paid where it belongs; the read-side hot
paths (similarity.py) use Arrow GEMM.

Cross-engine determinism (oracle pairing): float32→double widening is
exact in every engine; ``round(x, 6)`` ties land only on dyadic values
whose half-digit both Spark (HALF_UP = away-from-zero for either sign)
and DuckDB (half-away-from-zero) round identically; quantization avoids
round() entirely via ``floor(x/scale + 0.5)`` — one IEEE divide + add +
floor, bit-identical everywhere; centroid sums are exact DECIMAL sums
of 1e-6-rounded elements (see workload.py conventions).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def l2_normalize(vec: Column | str) -> Column:
    """Unit-norm copy of the vector (zero vectors pass through): after
    this, dot product == cosine and downstream similarity drops the
    per-row norm work."""
    v = F.col(vec) if isinstance(vec, str) else vec
    norm = F.sqrt(
        F.aggregate(
            F.transform(v, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return F.when(norm == 0.0, v.cast("array<double>")).otherwise(
        F.transform(v, lambda x: x.cast("double") / norm)
    )


def l2_norm_col(vec: Column | str) -> Column:
    """The norm itself (sequential left-to-right sum — deterministic)."""
    v = F.col(vec) if isinstance(vec, str) else vec
    return F.sqrt(
        F.aggregate(
            F.transform(v, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def quantize_symmetric_int8(vec: Column | str) -> tuple[Column, Column]:
    """(qvec, scale): symmetric per-vector int8 quantization —
    scale = max|x| / 127, q_i = floor(x_i/scale + 0.5) ∈ [-127, 127]
    (127, not 128: symmetric range keeps dequantization sign-unbiased).
    Zero vectors get scale 0 and all-zero codes.

    floor(x + 0.5) instead of round(): identical IEEE ops in every
    engine, no half-even/half-up ambiguity anywhere."""
    v = F.col(vec) if isinstance(vec, str) else vec
    absmax = F.array_max(F.transform(v, lambda x: F.abs(x.cast("double"))))
    scale = absmax / F.lit(127.0)
    q = F.when(
        scale == 0.0,
        F.transform(v, lambda x: F.lit(0)),
    ).otherwise(
        F.transform(v, lambda x: F.floor(x.cast("double") / scale + F.lit(0.5)).cast("int"))
    )
    return q, scale


def dequantize_int8(qvec: Column | str, scale: Column | str) -> Column:
    q = F.col(qvec) if isinstance(qvec, str) else qvec
    s = F.col(scale) if isinstance(scale, str) else scale
    return F.transform(q, lambda x: x.cast("double") * s)


def centroid_sums(
    df: DataFrame,
    group_col: Column | str,
    vec_col: str = "embedding",
    group_name: str = "grp",
) -> DataFrame:
    """Exact per-(group, dimension) sums + counts — the shuffle-side of a
    centroid build (centroid = vec_sum / n, divided by the caller so the
    heavy output stays exact integers/decimals).

    posexplode → one keyed partial-agg shuffle on (group, pos). Elements
    are rounded to 1e-6 then summed as DECIMAL — exact and
    order-independent, so the result is deterministic under ANY task
    ordering (a raw float sum is not)."""
    g = F.col(group_col) if isinstance(group_col, str) else group_col
    exploded = df.select(
        g.alias(group_name), F.posexplode(vec_col).alias("pos", "x")
    ).select(
        group_name,
        "pos",
        F.round(F.col("x").cast("double"), 6).cast("decimal(16,6)").alias("xd"),
    )
    return exploded.groupBy(group_name, "pos").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xd").cast("double").alias("dim_sum"),
    )
