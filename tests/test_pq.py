"""Product quantization: encode pinned to numpy reference; ADC search
recall on planted clusters; exact re-rank equals brute-force top-k."""

from __future__ import annotations

import numpy as np

from etl_demos_spark.operators import pq

from tests.test_embeddings import _clustered


def _exact_topk(X, ids, q, k):
    d = ((X - q[None, :]) ** 2).sum(axis=1)
    order = np.lexsort((ids, d))
    return [int(ids[i]) for i in order[:k]]


def test_encode_pinned_to_numpy_reference(spark):
    df, _, _ = _clustered(spark, n_per=30, d=8)
    books = pq.pq_train(df, m=4, k=8, iters=5)
    got = {
        r["vec_id"]: tuple(r["codes"])
        for r in pq.pq_encode(df, books).collect()
    }
    rows = sorted(df.collect(), key=lambda r: r["vec_id"])
    X = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    want = pq.pq_reference_encode(X, books)
    for i, r in enumerate(rows):
        assert got[r["vec_id"]] == tuple(want[i])


def test_adc_search_recall_and_rerank_exact(spark):
    df, _, _ = _clustered(spark, n_per=40, d=8)
    rows = sorted(df.collect(), key=lambda r: r["vec_id"])
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    q = X[5] + 0.05  # near a known vector

    books = pq.pq_train(df, m=4, k=16, iters=8)
    codes = pq.pq_encode(df, books)

    want = _exact_topk(X, ids, q, 10)

    approx = [r["vec_id"] for r in pq.pq_search_adc(codes, books, q, topk=10).collect()]
    recall = len(set(approx) & set(want)) / 10
    assert recall >= 0.6, f"ADC recall too low: {recall}"

    rer = pq.pq_search_adc(
        codes, books, q, topk=10, rerank_df=df, rerank_factor=8
    ).collect()
    got = [r["vec_id"] for r in rer]
    assert got == want  # exact re-rank over a wide candidate set
    # re-ranked distances are the exact squared L2
    d_exact = {int(i): float(((X[ids == i][0] - q) ** 2).sum()) for i in got}
    for r in rer:
        assert abs(r["dist"] - d_exact[r["vec_id"]]) < 1e-9


def test_search_deterministic(spark):
    df, _, _ = _clustered(spark, n_per=25, d=8)
    books = pq.pq_train(df, m=2, k=8, iters=4)
    codes = pq.pq_encode(df, books).cache()
    q = [0.0] * 8
    a = [(r["vec_id"], round(r["approx_dist"], 9))
         for r in pq.pq_search_adc(codes, books, q, topk=5).collect()]
    b = [(r["vec_id"], round(r["approx_dist"], 9))
         for r in pq.pq_search_adc(codes, books, q, topk=5).collect()]
    assert a == b and len(a) == 5
