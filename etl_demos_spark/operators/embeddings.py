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

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


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


# ---------------------------------------------------------------------------
# K-means: nearest-centroid assignment + distributed Lloyd iterations
# ---------------------------------------------------------------------------


def kmeans_assign(
    df: DataFrame,
    centroids_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "cell",
    cvec_col: str = "cvec",
) -> DataFrame:
    """Nearest-centroid assignment (squared L2), expression form.

    Broadcast crossJoin against the small centroid side (k rows — never
    shuffles the corpus), distance as a sequential in-array sum (the
    same left-to-right double adds DuckDB's list functions do, so the
    result is oracle-twinnable bit-for-bit), winner by ``row_number``
    with a (dist, cell) tiebreak. This is the semantic reference; the
    corpus-scale hot path is :func:`kmeans_assign_gemm` (pinned equal in
    tests/test_embeddings.py).

    Output: (id, cell, dist) — one row per input vector.
    """
    pairs = df.select(id_col, vec_col).crossJoin(F.broadcast(centroids_df))
    diff2 = F.zip_with(
        F.col(vec_col),
        F.col(cvec_col),
        lambda x, c: (x.cast("double") - c.cast("double"))
        * (x.cast("double") - c.cast("double")),
    )
    dist = F.aggregate(diff2, F.lit(0.0), lambda acc, x: acc + x)
    w = Window.partitionBy(id_col).orderBy(F.col("dist").asc(), F.col(cell_col).asc())
    return (
        pairs.withColumn("dist", dist)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, cell_col, "dist")
    )


def kmeans_assign_gemm(
    df: DataFrame,
    centroids,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_vec: bool = False,
) -> DataFrame:
    """Arrow-batch argmin assignment — the corpus-scale path.

    Distances via the |x|² − 2·x·C + |c|² identity: ONE dgemm per Arrow
    batch against the broadcast k×d centroid matrix, no per-element
    interpreted lambdas. ``np.argmin`` takes the first minimum, which is
    exactly the (dist, cell) tiebreak of the expression form. One narrow
    pass over the corpus — no shuffle, no driver materialization.

    ``keep_vec=True`` passes the vector through (the Lloyd update needs
    (cell, vec) without a join back by id).
    """
    spark = df.sparkSession
    C = np.asarray([list(c) for c in centroids], dtype=np.float64)
    cn = (C * C).sum(axis=1)
    b_c = spark.sparkContext.broadcast((C, cn))

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Cm, Cn = b_c.value
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(list(pdf[vec_col]), dtype=np.float64)
            d = (X * X).sum(axis=1)[:, None] - 2.0 * (X @ Cm.T) + Cn[None, :]
            cell = d.argmin(axis=1)
            dist = np.maximum(d[np.arange(len(d)), cell], 0.0)
            out = {
                id_col: pdf[id_col],
                "cell": cell.astype(np.int64),
                "dist": dist,
            }
            if keep_vec:
                out[vec_col] = pdf[vec_col]
            yield pd.DataFrame(out)

    vec_field = f", {vec_col} array<double>" if keep_vec else ""
    schema = f"{id_col} long, cell long, dist double{vec_field}"
    return df.select(id_col, vec_col).mapInPandas(assign, schema)


def kmeans_lloyd(
    df: DataFrame,
    k: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init=None,
):
    """Distributed Lloyd k-means: the full-corpus refinement behind an
    IVF coarse quantizer (similarity.ivf_build_centroids fits on a
    bounded sample; this iterates over ALL vectors when the sample is
    not representative).

    Per iteration: one Arrow argmin pass (``kmeans_assign_gemm``) + one
    keyed decimal-exact shuffle (``centroid_sums``) — only k×d floats
    ever reach the driver, never the corpus. Deterministic end-to-end:
    init = first-k rows by id (unless given), element sums are
    order-independent decimals, argmin ties break to the lowest cell.
    Empty cells keep their previous centroid (the FAISS policy).

    Returns ``(centroids, assignments)`` — a k×d list-of-lists and the
    final (id, cell, dist) DataFrame.
    """
    if init is None:
        rows = df.orderBy(id_col).limit(k).select(vec_col).collect()
        C = np.array([list(r[0]) for r in rows], dtype=np.float64)
    else:
        C = np.asarray([list(c) for c in init], dtype=np.float64)
    assigned = None
    for _ in range(iters):
        assigned = kmeans_assign_gemm(df, C, id_col, vec_col, keep_vec=True)
        stats = centroid_sums(assigned, "cell", vec_col, group_name="cell").collect()
        newC = C.copy()
        sums = np.zeros_like(C)
        counts = np.zeros(len(C), dtype=np.int64)
        for r in stats:
            sums[r["cell"], r["pos"]] = r["dim_sum"]
            counts[r["cell"]] = r["n"]
        nonempty = counts > 0
        newC[nonempty] = sums[nonempty] / counts[nonempty, None]
        C = newC
    final = kmeans_assign_gemm(df, C, id_col, vec_col)
    return [list(map(float, c)) for c in C], final


# ---------------------------------------------------------------------------
# Distributed PCA: exact scaled Gram pass -> bounded driver eigh -> projection
# ---------------------------------------------------------------------------

# Elements are quantized to 1e-6 before the second-moment pass; all Gram
# entries are then EXACT integers scaled by GRAM_SCALE² = 1e12.
GRAM_SCALE = 1_000_000

# Largest |q| for which a 4096-row chunk's int64 Q^T.Q stays exact:
# 4096 * qmax^2 <= 2^63 - 1  ->  qmax = isqrt((2^63-1)//4096) ~= 4.7e7
_GRAM_CHUNK_QMAX = 47453132


def gram_matrix(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Exact scaled second-moment (Gram) pass — the corpus-side of
    distributed PCA / covariance. Every element is quantized to 1e-6
    (``q = round(x·1e6)``, int64), each Arrow batch contributes ONE
    d+1 × d+1 integer partial ``Qᵀ·Q`` (numpy int64 matmul — exact; the
    vector is augmented with a constant GRAM_SCALE column so per-dim
    sums land in row d and the row count in cell (d, d), all on the
    same 1e12 scale), and partials merge with one DECIMAL(38,0) sum
    keyed on (i, j) — exact, order-independent, engine-portable (DuckDB
    reproduces every integer with a HUGEINT sum over the same rounded
    products). Only the upper triangle i ≤ j is emitted (symmetry).

    Overflow discipline: each 4096-row chunk emits its OWN partial (the
    cross-chunk sum happens in the decimal(38,0) aggregation, never in
    int64), so the int64 bound is per-chunk: 4096·q² < 2^63 → |q| ≤
    4.7e7 → |x| ≤ ~47. That bound is ENFORCED — a chunk whose max |q|
    exceeds it raises ValueError instead of silently wrapping (unit-norm
    embeddings sit 7 orders of magnitude below it; rescale first if
    your vectors genuinely exceed ±47).

    Scale shape: one narrow corpus pass, then a shuffle of
    (d+1)²/2 ≈ 2k keys per batch — cost ∝ batches, never ∝ rows², and
    only d² cells ever reach the driver. Cited reference surface:
    rytakahas/etl-demos keeps column statistics per staging model
    (dbt/models/staging); this generalizes those per-column moments to
    the full cross-moment matrix an embedding pipeline needs.

    Returns ``(i, j, s)`` with s = Σ q_i·q_j as decimal(38,0),
    0 ≤ i ≤ j ≤ d (index d = the augmented ones-dimension)."""

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        iu = None
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(list(pdf[vec_col]), dtype=np.float64)
            Q = np.rint(X * GRAM_SCALE).astype(np.int64)
            Q = np.hstack(
                [Q, np.full((len(Q), 1), GRAM_SCALE, dtype=np.int64)]
            )
            if iu is None:
                d1 = Q.shape[1]
                iu = np.triu_indices(d1)
            for lo in range(0, len(Q), 4096):
                part = Q[lo : lo + 4096]
                qmax = int(np.abs(part).max())
                if qmax > _GRAM_CHUNK_QMAX:
                    raise ValueError(
                        f"gram_matrix: |quantized element| {qmax} exceeds the "
                        f"int64-exact per-chunk bound {_GRAM_CHUNK_QMAX} "
                        f"(|x| ≲ 47 at the 1e-6 scale) — rescale the vectors"
                    )
                # one partial PER CHUNK: the cross-chunk sum happens in
                # the exact decimal aggregation, never in int64
                G = part.T @ part
                yield pd.DataFrame(
                    {
                        "i": iu[0].astype(np.int64),
                        "j": iu[1].astype(np.int64),
                        "ps": G[iu],
                    }
                )

    raw = df.select(vec_col).mapInPandas(partials, "i long, j long, ps long")
    return raw.groupBy("i", "j").agg(
        F.sum(F.col("ps").cast("decimal(38,0)")).alias("s")
    )


def covariance_from_gram(gram: DataFrame, dim: int) -> DataFrame:
    """Population covariance entries from the exact Gram pass, as a
    deterministic double expression shared verbatim with the DuckDB
    oracle: cov(i,j) = (S_ij/n − (S_i·/n)·(S_j·/n)) / 1e12 with every
    operand an exact integer cast to double — both engines execute the
    identical IEEE expression tree, so the driver hash certifies the
    whole moment pipeline. Returns (i, j, cov) for 0 ≤ i ≤ j < dim."""
    n = F.col("nn").cast("double")
    sums = (
        gram.filter((F.col("j") == dim) & (F.col("i") < dim))
        .select("i", (F.col("s").cast("double") / F.lit(float(GRAM_SCALE))).alias("rowsum"))
    )
    cnt = gram.filter((F.col("i") == dim) & (F.col("j") == dim)).select(
        (F.col("s") / F.lit(GRAM_SCALE * GRAM_SCALE)).cast("long").alias("nn")
    )
    pairs = gram.filter(F.col("j") < dim)
    sa = sums.select(F.col("i").alias("i"), F.col("rowsum").alias("sum_i"))
    sb = sums.select(F.col("i").alias("j"), F.col("rowsum").alias("sum_j"))
    return (
        pairs.join(sa, "i")
        .join(sb, "j")
        .crossJoin(F.broadcast(cnt))
        .select(
            "i",
            "j",
            (
                F.round(
                    (
                        F.col("s").cast("double") / n
                        - (F.col("sum_i") / n) * (F.col("sum_j") / n)
                    )
                    / F.lit(1.0e12),
                    6,
                )
                + F.lit(0.0)  # IEEE -0.0 + 0.0 = +0.0: kill signed zero
            ).alias("cov"),
        )
    )


def pca_components(
    df: DataFrame,
    k: int = 8,
    vec_col: str = "embedding",
    dim: int | None = None,
):
    """Top-k principal components from the distributed Gram pass: only
    the (d+1)² exact integer cells reach the driver; the d×d eigen
    problem is solved locally with numpy.linalg.eigh (deterministic for
    a fixed matrix) and each component's sign is normalized so its
    largest-|coordinate| entry is positive (eigh's sign is otherwise
    arbitrary). Returns (components k×d row-major list, explained
    variance ratios list, mean d-vector) — bounded driver state, never
    corpus-sized. The MEAN is returned because the covariance is
    centered: projecting UNcentered data onto these components offsets
    every score by μ·Wᵀ — pass the mean straight to
    ``pca_project(center=mean)``."""
    rows = gram_matrix(df, vec_col).collect()
    if not rows:
        raise ValueError("pca_components: empty corpus (no embedding rows)")
    if dim is None:
        dim = max(r["j"] for r in rows)
    G = np.zeros((dim + 1, dim + 1), dtype=np.float64)
    for r in rows:
        G[r["i"], r["j"]] = float(r["s"])
        G[r["j"], r["i"]] = float(r["s"])
    n = G[dim, dim] / (GRAM_SCALE * GRAM_SCALE)
    sums = G[:dim, dim] / GRAM_SCALE
    cov = (G[:dim, :dim] / n - np.outer(sums / n, sums / n)) / 1.0e12
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T.copy()
    for c in comps:
        if c[np.argmax(np.abs(c))] < 0:
            c *= -1.0
    total = float(vals.sum()) or 1.0
    ratios = [float(vals[o]) / total for o in order]
    mean = [float(x) for x in (sums / n / 1.0e6)]
    return [list(map(float, c)) for c in comps], ratios, mean


def pca_project(
    df: DataFrame,
    components,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    center=None,
) -> DataFrame:
    """Project the corpus onto fitted components: ONE dgemm per Arrow
    batch against the broadcast k×d component matrix (the
    kmeans_assign_gemm discipline — no interpreted per-element lambdas,
    no shuffle, no driver materialization). Optional ``center`` (the
    mean vector) is subtracted first — classic PCA centering. Returns
    (id, proj array<double> rounded 1e-6)."""
    spark = df.sparkSession
    W = np.asarray([list(c) for c in components], dtype=np.float64)
    mu = None if center is None else np.asarray(list(center), dtype=np.float64)
    b = spark.sparkContext.broadcast((W, mu))

    def proj(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Wm, mv = b.value
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(list(pdf[vec_col]), dtype=np.float64)
            if mv is not None:
                X = X - mv[None, :]
            P = np.round(X @ Wm.T, 6)
            yield pd.DataFrame({id_col: pdf[id_col], "proj": list(P)})

    return df.select(id_col, vec_col).mapInPandas(
        proj, f"{id_col} long, proj array<double>"
    )
