"""Distributed linear text classifier over hashed bag-of-words features.

The fastText/CCNet-style quality-filter shape (Joulin et al. 2016,
"Bag of Tricks for Efficient Text Classification"; CCNet's fastText
lang/quality filters): tokens hash into a fixed bucket space, a document
is the sparse count vector of its buckets, scoring is a sparse
dot-product against a dense weight vector, and training is batch
logistic-regression gradient descent. At 100 TB this is THE way model
inference runs inside the pipeline: no Python in the hot path for
scoring (token explode → md5 bucket → broadcast weight join → exact
integer sum), and training touches the corpus once per iteration with
one doc-keyed shuffle and one bucket-keyed combiner shuffle.

Determinism discipline (what makes this testable and oracle-pairable):

- **Scoring** uses integer milli-weights: score_milli = Σ cnt·w_int is
  an EXACT int64 any engine reproduces; the only double op is the final
  sigmoid — so a DuckDB oracle certifies inference end-to-end
  (q_linear_score).
- **Training** keeps every accumulated quantity exact: weights are
  int64 nano-weights, margins exact integer sums, per-row residuals
  quantized to 1e-9 integers BEFORE aggregation — sums are
  order-independent, so T iterations produce bit-identical weights on
  any partitioning (numpy-pinned in tests/test_classifier.py).
  Iterative training is not SQL-expressible → q_train_classifier is
  rows-only.

Reference parity anchor: extends the reference's staged filter models
(rytakahas/etl-demos dbt/models/staging/* quality gates) from rule-based
CASE banding to learned scoring, the same extension direction as
operators/text.py lm_quality.
"""

from __future__ import annotations

from typing import Iterable

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# weight resolution: milli-weights for the portable scorer, 1e-9
# (nano) quantization for GD state
_MILLI = 1000


def hashed_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
) -> DataFrame:
    """Sparse hashed bag-of-words: one codegen'd pass — lowercase,
    whitespace split, explode, md5 bucket (the repo's portable hash
    idiom, dedup.md5_long), count per (doc, bucket). Shuffle is keyed
    on (doc, bucket) and combiner-friendly; output rows ∝ distinct
    tokens per doc, never vocabulary × docs."""
    from etl_demos_spark.operators.dedup import md5_long

    tok = (
        df.select(
            id_col,
            F.explode(
                F.split(F.lower(F.col(text_col)), r"\s+")
            ).alias("tok"),
        )
        .filter(F.col("tok") != "")
    )
    return (
        tok.select(
            id_col, (md5_long(F.col("tok")) % n_buckets).alias("bucket")
        )
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def seeded_milli_weights(col: Column) -> Column:
    """Deterministic integer milli-weight for a bucket id — the
    engine-portable 'fixture model': w_int(b) = (md5_long(b) % 2001)
    − 1000 ∈ [−1000, 1000]. Exists so inference can be driver-hash
    certified without shipping a trained artifact; real deployments
    broadcast a weights table instead."""
    from etl_demos_spark.operators.dedup import md5_long

    return (md5_long(col.cast("string")) % 2001 - 1000).cast("long")


def linear_score_milli(
    feats: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    bias_milli: int = 0,
) -> DataFrame:
    """Score docs against integer milli-weights: broadcast the dense
    (bucket, w_int) table (≤ n_buckets rows — KBs), join the sparse
    features, sum cnt·w_int EXACTLY in int64, sigmoid once at the end.
    |cnt·w_int| ≤ 10⁶ per token and docs are ≪ 2^43 tokens, so the sum
    cannot overflow. Returns (id, score_milli, prob) with prob rounded
    to 4 decimals (the oracle rounding discipline)."""
    j = feats.join(F.broadcast(weights), "bucket")
    agg = j.groupBy(id_col).agg(
        (F.sum(F.col("cnt") * F.col("w_int")) + F.lit(bias_milli))
        .cast("long")
        .alias("score_milli")
    )
    z = F.col("score_milli").cast("double") / F.lit(float(_MILLI))
    return agg.select(
        id_col,
        "score_milli",
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 4).alias("prob"),
    )


def train_logreg(
    feats: DataFrame,
    labels: DataFrame,
    id_col: str = "doc_id",
    label_col: str = "y",
    n_buckets: int = 4096,
    lr: float = 0.5,
    iters: int = 3,
    l2: float = 0.0,
    add_bias: bool = True,
) -> DataFrame:
    """Batch-GD logistic regression over hashed features, deterministic
    on any partitioning via the Gram-pass integer discipline
    (embeddings.gram_matrix): weights live as int64 NANO-weights
    (w·1e9), margins are exact int64 sums of cnt·w_int, per-row
    residuals are quantized to 1e-9 integers BEFORE the gradient sum —
    every accumulated quantity is an order-independent exact integer,
    so T iterations produce bit-identical weights on any partitioning
    (numpy-pinned in tests/test_classifier.py). The only doubles are
    the per-row sigmoid and the driver-side step, both deterministic.

    Per iteration: one doc-keyed shuffle (margin agg) + one bucket-keyed
    combiner shuffle (gradient agg) — corpus passes ∝ iters, weight
    state ∝ n_buckets (bounded; updated driver-side like the k-means
    centroid pattern, embeddings.kmeans_lloyd). Overflow headroom:
    |w_int| ≤ ~1e10, cnt ≤ doc tokens, residual_int ≤ 1e9 — sums stay
    far below 2^63 for any realistic doc. Iterative training is not
    SQL-expressible → the registered query is rows-only.

    ``add_bias`` injects a virtual bucket −1 with count 1 per labeled
    doc — the intercept, trained like any other weight (without it a
    plain frequency threshold is not representable). `predict` applies
    the same augmentation, so trained weights and scoring agree.

    Returns the final (bucket, w_int) int64 nano-weight DataFrame."""
    spark = feats.sparkSession
    n = labels.count()
    lab = labels.select(id_col, F.col(label_col).cast("double").alias("__y"))
    if add_bias:
        feats = feats.unionByName(
            labels.select(
                F.col(id_col),
                F.lit(-1).cast("long").alias("bucket"),
                F.lit(1).cast("long").alias("cnt"),
            )
        )

    # bounded dense weight state on the driver (≤ n_buckets ints)
    w: dict[int, int] = {}

    for _ in range(iters):
        if w:
            wdf = spark.createDataFrame(
                list(w.items()), "bucket long, w_int long"
            )
            scored = feats.join(F.broadcast(wdf), "bucket", "left").select(
                id_col,
                (
                    F.col("cnt") * F.coalesce(F.col("w_int"), F.lit(0))
                ).cast("long").alias("term"),
            )
        else:
            scored = feats.select(
                id_col, F.lit(0).cast("long").alias("term")
            )
        margins = scored.groupBy(id_col).agg(
            F.sum("term").cast("long").alias("m_int")
        )
        p = (
            margins.join(lab, id_col)
            .select(
                id_col,
                (
                    F.lit(1.0)
                    / (
                        F.lit(1.0)
                        + F.exp(-(F.col("m_int").cast("double") / F.lit(1.0e9)))
                    )
                    - F.col("__y")
                ).alias("resid"),
            )
            .select(
                id_col,
                F.round(F.col("resid") * F.lit(1.0e9), 0)
                .cast("long")
                .alias("r_int"),
            )
        )
        grad = (
            feats.join(p, id_col)
            .select("bucket", (F.col("cnt") * F.col("r_int")).alias("g"))
            .groupBy("bucket")
            .agg(F.sum("g").cast("long").alias("g_int"))
        )
        for r in grad.collect():  # ≤ n_buckets rows — bounded, like centroids
            b = r["bucket"]
            g = r["g_int"] / 1.0e9          # de-scale the residual quantum
            cur = w.get(b, 0) / 1.0e9
            upd = cur - lr * (g / n + l2 * cur)
            w[b] = int(round(upd * 1.0e9))

    return spark.createDataFrame(
        sorted(w.items()), "bucket long, w_int long"
    )


def predict(
    feats: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    threshold: float = 0.5,
    add_bias: bool = True,
    ids: DataFrame | None = None,
) -> DataFrame:
    """Probability + hard label from trained int64 nano-weights: exact
    integer margin sum (order-independent), one sigmoid, rounded 6.
    Same broadcast-join shape as linear_score_milli. ``add_bias`` must
    match training (bucket −1 carries the intercept).

    ``ids`` (optional, one ``id_col`` per doc): the full document
    universe to score. Without it, bias rows are derived from docs that
    produced ≥1 feature row — documents whose text tokenized to nothing
    (empty/whitespace-only) would be silently absent from the output,
    while training gives every LABELED doc an intercept. Pass the doc
    table itself to make the train/predict augmentation contract total:
    empty docs then score sigmoid(bias). When given, ``ids`` defines
    the output EXACTLY — feature rows of docs outside it are dropped
    (otherwise an eval-split ids with full-corpus feats would emit
    out-of-universe rows scored WITHOUT an intercept, the same
    augmentation mismatch this parameter exists to fix)."""
    if ids is not None:
        universe = ids.select(id_col).distinct()
        feats = feats.join(universe, id_col, "semi")
    else:
        universe = feats.select(id_col).distinct()
    if add_bias:
        feats = feats.unionByName(
            universe.select(
                F.col(id_col),
                F.lit(-1).cast("long").alias("bucket"),
                F.lit(1).cast("long").alias("cnt"),
            )
        )
    j = feats.join(F.broadcast(weights), "bucket", "left").select(
        feats[id_col].alias(id_col),
        (F.col("cnt") * F.coalesce(F.col("w_int"), F.lit(0)))
        .cast("long")
        .alias("term"),
    )
    m = j.groupBy(id_col).agg(F.sum("term").cast("long").alias("m_int"))
    prob = F.lit(1.0) / (
        F.lit(1.0) + F.exp(-(F.col("m_int").cast("double") / F.lit(1.0e9)))
    )
    return m.select(
        id_col,
        F.round(prob, 6).alias("prob"),
        (prob >= F.lit(threshold)).alias("pred"),
    )


def calibration_report(
    scored: DataFrame,
    label_col: str = "y",
    prob_col: str = "prob",
    bins: int = 10,
) -> DataFrame:
    """Reliability table + expected calibration error for a scored
    corpus — the acceptance gate a quality-classifier deployment needs
    before its probabilities drive sampling rates (a model can rank
    well and still be badly calibrated; ECE is the standard measure).

    Per confidence bin b: count, positives, mean confidence, empirical
    positive rate, |gap|; plus the corpus ECE = Σ_b (n_b/N)·gap_b
    repeated on every row for one-table consumption.

    Determinism discipline: ``prob_col`` is already 4-decimal-rounded
    (linear_score_milli's contract), so probabilities quantize to
    exact 1e-4 BIGINT units and every aggregate here is an
    order-independent integer sum. ECE in particular reduces to

        ece = Σ_b |sum_prob_q_b − 10⁴·pos_b|  /  (10⁴·N)

    — an integer numerator over a constant denominator, one double
    division at the end — so the DuckDB oracle replays it bit-for-bit
    (a naive Σ of per-bin double products would be summation-order
    dependent). One groupBy + one |bins|-row global window; nothing
    driver-side."""
    from pyspark.sql import Window as W

    p = F.col(prob_col)
    pq = F.round(p * 10_000).cast("long")
    # Bin on the integer form, not floor(prob*bins): double products of
    # e.g. 0.3*10 land at 2.999...96 and bin DOWN at every 1/bins
    # boundary (ADVICE r9). (pq*bins)/10⁴ is exact in float64 — the
    # numerator is a small exact integer and a denominator-10⁴ rational
    # is either exactly integral or ≥ 1e-4 away from the next integer,
    # far beyond ulp — so floor() here is true integer division and the
    # oracle replays the identical arithmetic.
    b = F.least(
        F.floor((pq * bins) / F.lit(10_000.0)).cast("long"), F.lit(bins - 1)
    )
    g = (
        scored.select(
            b.alias("bin"),
            pq.alias("__pq"),
            F.col(label_col).cast("long").alias("__y"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("__y").cast("long").alias("n_pos"),
            F.sum("__pq").cast("long").alias("__spq"),
        )
    )
    dev = F.abs(F.col("__spq") - 10_000 * F.col("n_pos"))
    g = g.withColumn("__dev", dev).withColumn(
        "__devsum", F.sum("__dev").over(W.partitionBy())
    ).withColumn("__ntot", F.sum("n").over(W.partitionBy()))
    return g.select(
        "bin",
        "n",
        "n_pos",
        F.round(F.col("__spq").cast("double") / F.col("n") / 10_000.0, 6).alias(
            "avg_conf"
        ),
        F.round(F.col("n_pos").cast("double") / F.col("n"), 6).alias("frac_pos"),
        F.round(F.col("__dev").cast("double") / F.col("n") / 10_000.0, 6).alias(
            "abs_gap"
        ),
        F.round(
            F.col("__devsum").cast("double") / (F.col("__ntot") * 10_000.0), 6
        ).alias("ece"),
    )
