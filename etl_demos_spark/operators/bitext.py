"""Margin-based bitext mining over embedding columns.

The public CCMatrix/LASER recipe (Artetxe & Schwenk, "Margin-based
Parallel Corpus Mining with Multilingual Sentence Embeddings", ACL
2019): a candidate translation pair (x, y) is scored not by raw cosine
but by the RATIO margin

    margin(x, y) = cos(x, y) / ((avg cos of x's k-NN in the target
                                 + avg cos of y's k-NN in the source) / 2)

which normalizes away "hubness" — a sentence that is everyone's
neighbor gets a high denominator and stops winning every comparison.
Mining keeps pairs that are MUTUAL margin-best matches above a
threshold (the paper's "intersection" strategy — deterministic and
join-expressible, unlike the sequential greedy variant).

Engine shape: both k-NN directions go through
operators/similarity.blocked_topk — the two-sided tiled GEMM (hash
blocks × hash blocks, per-tile vectorized partial top-k inside
applyInPandas) — because BOTH sides of a bitext mine are corpora:
brute_force_topk's gemm path collects its query side to the driver
(its contract says "queries expected to be small"), which a
corpus-sized mine violates by design. A fused bidirectional tile pass
was A/B'd and REJECTED at 0.5× (perf/ab_bitext_fused_r10.json): tile
cost is top-k extraction ∝ rows × directions, which fusion cannot
reduce, and its materialization barrier serialized the two directions
that the two-pass plan runs as parallel branches of one job. Nothing
in this module reaches the driver; the per-pair cosine is the same
full-length float64 dot in either strategy, so blocked and
brute-force mines are pinned identical (tests/test_bitext.py).
Everything after the two top-k frames is
exact-integer arithmetic: cosines are quantized to 1e-6 BIGINT units
first, so the k-NN sums — and therefore every margin, comparison and
tie-break downstream — are order-independent and engine-portable (the
pagerank quantized-contribution idiom). That is what lets the DuckDB
oracle replay the entire mine and the driver hash-certify mined pairs
end-to-end.

Scale: the tiled k-NN is exact but O(|src|·|tgt|·d) flops spread over
the tile grid — bounded memory everywhere, quadratic compute. At web
scale the same margin arithmetic runs unchanged on top of an ANN
candidate set: ``mine_bitext(..., knn="lsh", planes=...)`` routes both
directions through the non-broadcast LSH candidate join
(ann_topk_lsh(broadcast_queries=False)), trading recall for flops
upstream of the margin filter. The registered/certified query stays on
the exact blocked form.

No analogue in the reference repo (rytakahas/etl-demos) — part of the
LLM-training-data extension surface.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from etl_demos_spark.operators.similarity import ann_topk_lsh, blocked_topk

# cosine quantization scale: 1e-6 units (the ANN family's certified
# rounding grain — q_ann_cosine pins GEMM vs DuckDB agreement at 1e-6)
_Q = 1_000_000


def _knn_quantized(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
    q_id_col: str,
    knn: str = "blocked",
    planes=None,
) -> DataFrame:
    """Top-k neighbors with cosine quantized to exact 1e-6 BIGINT units:
    (q_id_col, id_col, cq). Both sides corpus-sized → the tiled
    two-sided k-NN (``knn="blocked"``, exact) or the LSH candidate
    route (``knn="lsh"``, recall < 1, flops ∝ bucket collisions instead
    of |src|·|tgt|) — either way, no driver collect and no broadcast of
    a corpus-sized side anywhere in the mine."""
    c = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
    )
    if knn == "blocked":
        topk = blocked_topk(c, q, k=k)
    elif knn == "lsh":
        if planes is None:
            raise ValueError("knn='lsh' requires planes (random hyperplanes)")
        topk = ann_topk_lsh(c, q, planes, k=k, broadcast_queries=False)
    else:
        raise ValueError(f"unknown knn route {knn!r}: blocked|lsh")
    return topk.select(
        F.col("query_id").alias(q_id_col),
        F.col("vec_id").alias(id_col),
        F.round(F.col("cos_sim") * _Q).cast("long").alias("cq"),
    )


def mine_bitext(
    src: DataFrame,
    tgt: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    threshold: float = 1.0,
    knn: str = "blocked",
    planes=None,
) -> DataFrame:
    """Mine aligned pairs between two embedding corpora.

    ``knn`` picks the candidate substrate: ``"blocked"`` (default) is
    the exact tiled two-sided k-NN — quadratic flops, bounded memory —
    and the hash-certified form; ``"lsh"`` routes both directions
    through the bucketed candidate join (``planes`` required; recall
    < 1, cost ∝ bucket collisions) while the margin arithmetic runs
    unchanged on top — the web-scale trade documented in the module
    header, now a parameter rather than a prose promise.

    Candidates are the union of both k-NN directions; each candidate's
    ratio margin divides its quantized cosine by the mean of the two
    sides' k-NN averages; a pair survives if it is the margin-BEST
    match for BOTH its source and its target (ties broken by partner
    id — margins are functions of exact integers, so the ordering is
    engine-portable) and its margin clears ``threshold``.

    Returns ``(src_id, tgt_id, cos_sim, margin)``, cosine and margin
    rounded to 1e-6 for display; filtering and ranking use the
    unrounded deterministic values.

    Ids must be unique within each side and disjoint use is not
    required (the sides are separate frames). Sides smaller than ``k``
    use their true neighbor count in the average — the estimator
    degrades gracefully instead of dividing by a padded k."""
    # Two independent blocked passes, NOT a fused bidirectional tile
    # pass: an r10 A/B (perf/ab_bitext_fused_r10.json) measured fusion
    # at 0.5× — the tile cost is top-k extraction, which is
    # proportional to rows × directions regardless of fusion, and the
    # fused form's materialization barrier also serialized what the
    # two-pass plan runs as parallel branches of one job.
    fwd = _knn_quantized(
        tgt, src, k, id_col, vec_col, "src_id", knn, planes
    ).select("src_id", F.col(id_col).alias("tgt_id"), "cq")
    bwd = _knn_quantized(
        src, tgt, k, id_col, vec_col, "tgt_id", knn, planes
    ).select(F.col(id_col).alias("src_id"), "tgt_id", "cq")
    # per-side k-NN averages as exact integer sums + counts
    f_avg = fwd.groupBy("src_id").agg(
        F.sum("cq").alias("fsum"), F.count(F.lit(1)).alias("fn")
    )
    b_avg = bwd.groupBy("tgt_id").agg(
        F.sum("cq").alias("bsum"), F.count(F.lit(1)).alias("bn")
    )
    # candidate union; cq is identical when a pair appears in both
    # directions (same GEMM products either way) — max() just dedups
    cands = (
        fwd.unionByName(bwd)
        .groupBy("src_id", "tgt_id")
        .agg(F.max("cq").alias("cq"))
    )
    denom = (
        F.col("fsum").cast("double") / F.col("fn")
        + F.col("bsum").cast("double") / F.col("bn")
    ) / 2.0
    # zero-denominator guard (all-zero neighbor cosines — degenerate
    # vectors): margin 0.0 instead of an ANSI DIVIDE_BY_ZERO, mirrored
    # in the oracle SQL
    margin = F.when(
        denom != 0.0, F.col("cq").cast("double") / denom
    ).otherwise(F.lit(0.0))
    scored = (
        cands.join(f_avg, "src_id")
        .join(b_avg, "tgt_id")
        .select("src_id", "tgt_id", "cq", margin.alias("__margin"))
    )
    w_src = Window.partitionBy("src_id").orderBy(
        F.col("__margin").desc(), F.col("tgt_id").asc()
    )
    w_tgt = Window.partitionBy("tgt_id").orderBy(
        F.col("__margin").desc(), F.col("src_id").asc()
    )
    return (
        scored.withColumn("__rs", F.row_number().over(w_src))
        .withColumn("__rt", F.row_number().over(w_tgt))
        .filter(
            (F.col("__rs") == 1)
            & (F.col("__rt") == 1)
            & (F.col("__margin") >= threshold)
        )
        .select(
            "src_id",
            "tgt_id",
            F.round(F.col("cq") / _Q, 6).alias("cos_sim"),
            F.round("__margin", 6).alias("margin"),
        )
    )
