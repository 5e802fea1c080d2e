"""Product quantization (PQ) for compressed ANN search.

The FAISS-style recipe (Jégou, Douze & Schmid, "Product Quantization
for Nearest Neighbor Search", TPAMI 2011 — public):

- **Train** (driver-local, bounded): split the d-dim space into ``m``
  subspaces and fit a small k-means codebook per subspace on a BOUNDED
  deterministic sample (the same policy as similarity.ivf_build_centroids
  — FAISS itself trains quantizers on a sample; the corpus is never
  collected).
- **Encode** (distributed): one Arrow argmin pass per batch — each
  vector compresses to ``m`` uint8-sized codes (32× smaller than
  float32 at m=d/4·k≤256), the representation that makes billion-scale
  search RAM-feasible.
- **Search** (distributed, asymmetric distance): the query builds an
  m×k lookup table of subspace distances ONCE; each candidate's
  approximate distance is m table lookups summed — no float vector is
  ever touched. One narrow scan of the codes table with per-batch
  partial top-k (lossless: the global top-k is a subset of every
  batch's top-k), tiny final merge. Optional exact re-rank joins the
  original vectors back for the top-R candidates only.

Everything is deterministic: sample = first-n by id, k-means init =
first-k sample rows, argmin ties break to the lowest code.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["pq_train", "pq_encode", "pq_search_adc", "pq_reference_encode"]


def _lloyd_np(X: np.ndarray, k: int, iters: int) -> np.ndarray:
    """Deterministic numpy Lloyd: init = first-k rows, ties → lowest
    cell, empty cells keep their previous centroid (the FAISS policy —
    mirrors embeddings.kmeans_lloyd semantics)."""
    C = X[:k].copy()
    for _ in range(iters):
        d = ((X * X).sum(1)[:, None] - 2.0 * X @ C.T + (C * C).sum(1)[None, :])
        cell = d.argmin(axis=1)
        for c in range(len(C)):
            members = X[cell == c]
            if len(members):
                C[c] = members.mean(axis=0)
    return C


def pq_train(
    df: DataFrame,
    m: int = 4,
    k: int = 16,
    iters: int = 8,
    sample: int = 100_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Fit per-subspace codebooks on a bounded deterministic sample.

    The sample is the bottom-``sample`` rows by a content hash with an
    id tie-break — the same unbiased-uniform policy as
    similarity.ivf_build_centroids, and for the same reason: a first-n
    ``orderBy(id).limit`` sample is whatever region of embedding space
    the lowest ids happen to cover (ids routinely correlate with
    source/cluster/time), and codebooks fit to one region explode the
    quantization error everywhere else. Still one partial-top-k pass,
    no full sort.

    Returns ``codebooks`` with shape m × k × (d/m). d must divide by m.
    """
    h = F.xxhash64(F.col(vec_col).cast("string"), F.lit(7))
    rows = (
        df.orderBy(h, F.col(id_col)).limit(sample).select(vec_col).collect()
    )
    X = np.array([list(r[0]) for r in rows], dtype=np.float64)
    d = X.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    books = []
    for j in range(m):
        books.append(_lloyd_np(X[:, j * sub : (j + 1) * sub], k, iters))
    return [[list(map(float, c)) for c in B] for B in books]


def _books_np(codebooks) -> np.ndarray:
    return np.asarray(codebooks, dtype=np.float64)  # m × k × sub


def pq_encode(
    df: DataFrame,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>) — one argmin per subspace per vector,
    vectorized per Arrow batch. The codes table is what gets stored;
    at m=8,k=256 that is 8 bytes/vector."""
    spark = df.sparkSession
    B = _books_np(codebooks)
    b_books = spark.sparkContext.broadcast(B)

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Bk = b_books.value
        m, k, sub = Bk.shape
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(list(pdf[vec_col]), dtype=np.float64)
            codes = np.empty((len(X), m), dtype=np.int64)
            for j in range(m):
                S = X[:, j * sub : (j + 1) * sub]
                C = Bk[j]
                d = (
                    (S * S).sum(1)[:, None]
                    - 2.0 * S @ C.T
                    + (C * C).sum(1)[None, :]
                )
                codes[:, j] = d.argmin(axis=1)
            yield pd.DataFrame({id_col: pdf[id_col], "codes": list(codes)})

    return df.select(id_col, vec_col).mapInPandas(
        encode, f"{id_col} long, codes array<long>"
    )


def pq_reference_encode(X: np.ndarray, codebooks) -> np.ndarray:
    """Numpy reference of pq_encode for pinning tests."""
    B = _books_np(codebooks)
    m, k, sub = B.shape
    codes = np.empty((len(X), m), dtype=np.int64)
    for j in range(m):
        S = X[:, j * sub : (j + 1) * sub]
        C = B[j]
        d = (S * S).sum(1)[:, None] - 2.0 * S @ C.T + (C * C).sum(1)[None, :]
        codes[:, j] = d.argmin(axis=1)
    return codes


def pq_search_adc(
    codes_df: DataFrame,
    codebooks,
    query,
    topk: int = 10,
    id_col: str = "vec_id",
    rerank_df: DataFrame | None = None,
    rerank_factor: int = 4,
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance top-k over a PQ codes table.

    Output: (id, approx_dist) ascending — or (id, dist) exact for the
    top ``topk·rerank_factor`` candidates when ``rerank_df`` (the
    original vectors) is given; re-ranking touches only the candidate
    ids (a semi-join-sized probe), never the corpus.
    """
    spark = codes_df.sparkSession
    B = _books_np(codebooks)
    m, k, sub = B.shape
    q = np.asarray(list(query), dtype=np.float64)
    # the m×k ADC lookup table: exact squared L2 from each query
    # subvector to every codebook centroid
    lut = np.stack(
        [
            ((B[j] - q[j * sub : (j + 1) * sub][None, :]) ** 2).sum(axis=1)
            for j in range(m)
        ]
    )
    b_lut = spark.sparkContext.broadcast(lut)
    n_cand = topk * rerank_factor if rerank_df is not None else topk

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        L = b_lut.value
        mm = L.shape[0]
        cols = np.arange(mm)
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.array(list(pdf["codes"]), dtype=np.int64)
            dist = L[cols[None, :], codes].sum(axis=1)
            # lossless per-batch partial top-k UNDER THE (dist, id)
            # TOTAL ORDER: argpartition would cut ties at the n_cand
            # boundary arbitrarily, and PQ makes exact ties common
            # (identical codes ⇒ identical ADC distance) — the global
            # (approx_dist, id) sort below is only lossless if each
            # batch kept ITS lowest (dist, id) rows
            if len(dist) > n_cand:
                batch_ids = pdf[id_col].to_numpy()
                idx = np.lexsort((batch_ids, dist))[:n_cand]
            else:
                idx = np.arange(len(dist))
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy()[idx], "approx_dist": dist[idx]}
            )

    cands = codes_df.select(id_col, "codes").mapInPandas(
        score, f"{id_col} long, approx_dist double"
    )
    cands = cands.orderBy(F.col("approx_dist").asc(), F.col(id_col).asc()).limit(
        n_cand
    )
    if rerank_df is None:
        return cands
    q_lit = F.array(*[F.lit(float(x)) for x in q])
    v = F.col(vec_col)
    # exact squared L2 via sequential sums (deterministic)
    d2 = F.aggregate(
        F.zip_with(
            v, q_lit, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        rerank_df.join(F.broadcast(cands.select(id_col)), id_col)
        .withColumn("dist", d2)
        .orderBy(F.col("dist").asc(), F.col(id_col).asc())
        .limit(topk)
        .select(id_col, "dist")
    )
