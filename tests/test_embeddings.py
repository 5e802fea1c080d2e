"""Embedding preparation: normalize, int8 quantize round-trip, centroids."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from etl_demos_spark.operators import embeddings as emb


def _vecs(spark):
    return spark.createDataFrame(
        [
            (1, [3.0, 4.0]),
            (2, [0.0, 0.0]),          # zero vector: must not divide by zero
            (3, [-1.5, 2.5]),
            (4, [0.001, -0.002]),
        ],
        "vec_id long, embedding array<float>",
    )


def test_l2_normalize_unit_norm_and_zero_passthrough(spark):
    df = _vecs(spark)
    out = {r["vec_id"]: r["nv"] for r in
           df.select("vec_id", emb.l2_normalize("embedding").alias("nv")).collect()}
    assert abs(math.hypot(*out[1]) - 1.0) < 1e-12
    assert abs(out[1][0] - 0.6) < 1e-12 and abs(out[1][1] - 0.8) < 1e-12
    assert out[2] == [0.0, 0.0]
    assert abs(math.hypot(*out[3]) - 1.0) < 1e-12


def test_quantize_roundtrip_error_bound(spark):
    df = _vecs(spark)
    q, scale = emb.quantize_symmetric_int8("embedding")
    qdf = df.select("vec_id", "embedding", q.alias("q"), scale.alias("s"))
    deq = qdf.select(
        "vec_id", "embedding", "s", emb.dequantize_int8("q", "s").alias("dq"),
        "q",
    )
    for r in deq.collect():
        assert max(abs(c) for c in r["q"]) <= 127
        for orig, back in zip(r["embedding"], r["dq"]):
            # symmetric quantization: error ≤ scale/2 per element
            assert abs(float(orig) - back) <= (r["s"] or 0.0) / 2 + 1e-12
    zero = {r["vec_id"]: r for r in deq.collect()}[2]
    assert zero["s"] == 0.0 and zero["dq"] == [0.0, 0.0]


def test_centroid_sums_exact(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 10.0]), (2, [2.0, 20.0]), (4, [4.0, 40.0]), (1, [7.0, 70.0])],
        "vec_id long, embedding array<float>",
    )
    out = emb.centroid_sums(df, F.col("vec_id") % 2, "embedding")
    got = {(r["grp"], r["pos"]): (r["n"], r["dim_sum"]) for r in out.collect()}
    assert got[(0, 0)] == (3, 7.0) and got[(0, 1)] == (3, 70.0)
    assert got[(1, 0)] == (1, 7.0) and got[(1, 1)] == (1, 70.0)


def _clustered(spark, n_per=40, d=8, seed=7):
    """Three well-separated planted clusters (numpy-generated, fixed seed)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    centers = np.array(
        [[10.0] * d, [-10.0] * d, [10.0] * (d // 2) + [-10.0] * (d - d // 2)]
    )
    rows, truth = [], []
    for ci, c in enumerate(centers):
        pts = c + rng.normal(0, 0.5, size=(n_per, d))
        for j, p in enumerate(pts):
            vid = ci * n_per + j
            rows.append((vid, [float(x) for x in p]))
            truth.append((vid, ci))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df, dict(truth), centers


def test_kmeans_assign_gemm_matches_expression_form(spark):
    df, _, centers = _clustered(spark)
    cents_df = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centers)],
        "cell long, cvec array<float>",
    )
    expr = {
        r["vec_id"]: (r["cell"], r["dist"])
        for r in emb.kmeans_assign(df, cents_df).collect()
    }
    gemm = {
        r["vec_id"]: (r["cell"], r["dist"])
        for r in emb.kmeans_assign_gemm(df, centers).collect()
    }
    assert set(expr) == set(gemm)
    for vid, (cell, dist) in expr.items():
        g_cell, g_dist = gemm[vid]
        assert g_cell == cell, f"vec {vid}: gemm cell {g_cell} != expr {cell}"
        # expression form: direct sum((x-c)^2); GEMM: |x|^2-2xc+|c|^2 identity
        assert abs(g_dist - dist) <= 1e-9 * max(1.0, abs(dist))


def test_kmeans_lloyd_matches_numpy_reference(spark):
    import numpy as np

    df, truth, _ = _clustered(spark)
    pdf = df.orderBy("vec_id").toPandas()
    X = np.array(list(pdf["embedding"]), dtype=np.float64)
    ids = pdf["vec_id"].to_numpy()

    # deliberately bad init (first k points — all in cluster 0) to force
    # real Lloyd movement before recovery
    k, iters = 3, 8
    init = X[:k].copy()
    cents, assigned = emb.kmeans_lloyd(df, k=k, iters=iters, init=init)

    # numpy reference with the same init and the same empty-cell policy
    C = init.copy()
    for _ in range(iters):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        a = d.argmin(1)
        for j in range(k):
            m = X[a == j]
            if len(m):
                C[j] = m.mean(0)
    ref_assign = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1).argmin(1)
    ref = dict(zip(ids, ref_assign))

    got = {r["vec_id"]: r["cell"] for r in assigned.collect()}
    assert got == {int(i): int(c) for i, c in ref.items()}
    # centroid drift vs the unrounded reference stays within the 1e-6
    # element-rounding the decimal-exact distributed sums introduce
    assert np.abs(np.array(cents) - C).max() < 1e-4


def test_kmeans_lloyd_recovers_planted_clusters(spark):
    import numpy as np

    n_per = 40
    df, truth, _ = _clustered(spark, n_per=n_per)
    pdf = df.orderBy("vec_id").toPandas()
    X = np.array(list(pdf["embedding"]), dtype=np.float64)
    # one seed per planted cluster (k-means++-style spread); with a
    # degenerate all-one-cluster init Lloyd legitimately converges to a
    # merged local optimum — that's the algorithm, not the implementation
    init = X[[0, n_per, 2 * n_per]]
    _, assigned = emb.kmeans_lloyd(df, k=3, iters=6, init=init)
    got = {r["vec_id"]: r["cell"] for r in assigned.collect()}
    by_truth = {}
    for vid, t in truth.items():
        by_truth.setdefault(t, set()).add(got[vid])
    labels = [frozenset(v) for v in by_truth.values()]
    assert all(len(s) == 1 for s in labels) and len(set(labels)) == 3


def test_semantic_pairs_gemm_matches_expression_form(spark):
    """SemDeDup within-cluster pairs: per-cell GEMM scale path must emit
    the same (id_a, id_b, cell) set as the oracle-twinnable expression
    self-join, with similarities agreeing to the rounded precision."""
    from etl_demos_spark.operators import embedding_dedup as ed

    df, _, centers = _clustered(spark)
    cents_df = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centers)],
        "cell long, cvec array<float>",
    )
    # planted clusters are tight → in-cluster cosines are high; 0.99
    # keeps the pair set non-trivial but not all-pairs
    expr = {
        (r["id_a"], r["id_b"]): (r["cell"], r["cos_sim"])
        for r in ed.semantic_pairs_clustered(
            df, cents_df, threshold=0.99
        ).collect()
    }
    gemm = {
        (r["id_a"], r["id_b"]): (r["cell"], r["cos_sim"])
        for r in ed.semantic_pairs_clustered(
            df, cents_df, threshold=0.99, use_gemm=True
        ).collect()
    }
    assert expr, "expected non-empty pair set from planted clusters"
    assert set(expr) == set(gemm)
    for k, (cell, sim) in expr.items():
        g_cell, g_sim = gemm[k]
        assert g_cell == cell
        assert abs(g_sim - sim) <= 2e-6


def test_semantic_dedup_keeps_min_id_per_component(spark):
    from etl_demos_spark.operators import embedding_dedup as ed

    df, truth, centers = _clustered(spark, n_per=10)
    cents_df = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centers)],
        "cell long, cvec array<float>",
    )
    kept = ed.semantic_dedup(df, cents_df, threshold=0.99, use_gemm=True)
    kept_ids = {r["vec_id"] for r in kept.select("vec_id").collect()}
    # survivors must include each cluster's min id and lose at least one
    # near-dup; no survivor pair may itself be a qualifying pair
    pairs = {
        (r["id_a"], r["id_b"])
        for r in ed.semantic_pairs_clustered(
            df, cents_df, threshold=0.99, use_gemm=True
        ).collect()
    }
    assert pairs and kept_ids < {r["vec_id"] for r in df.collect()}
    for a, b in pairs:
        assert not (a in kept_ids and b in kept_ids)


# ---------------------------------------------------------------------------
# Distributed PCA: exact Gram pass, covariance, eigh pin, projection GEMM
# ---------------------------------------------------------------------------


def _rand_vecs(spark, n=300, d=12, seed=7):
    import numpy as np

    rng = np.random.default_rng(seed)
    # correlated data so PCA has structure: low-rank + noise
    W = rng.normal(size=(3, d))
    X = rng.normal(size=(n, 3)) @ W + 0.05 * rng.normal(size=(n, d))
    rows = [(i, [float(x) for x in X[i]]) for i in range(n)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
        X,
    )


def test_gram_matrix_exact_vs_numpy(spark):
    import numpy as np

    df, X = _rand_vecs(spark, n=200, d=6)
    rows = emb.gram_matrix(df, "embedding").collect()
    Q = np.rint(X * emb.GRAM_SCALE).astype(np.int64)
    Q = np.hstack([Q, np.full((len(Q), 1), emb.GRAM_SCALE, dtype=np.int64)])
    G = Q.T @ Q
    got = {(r["i"], r["j"]): int(r["s"]) for r in rows}
    for i in range(7):
        for j in range(i, 7):
            assert got[(i, j)] == int(G[i, j]), (i, j)


def test_pca_components_match_numpy_eigh(spark):
    import numpy as np

    df, X = _rand_vecs(spark, n=300, d=12)
    comps, ratios, mean = emb.pca_components(df, k=4, vec_col="embedding")
    # numpy reference on the SAME quantized data the operator sees
    Xq = np.rint(X * emb.GRAM_SCALE) / emb.GRAM_SCALE
    C = np.cov(Xq, rowvar=False, bias=True)
    vals, vecs = np.linalg.eigh(C)
    order = np.argsort(vals)[::-1][:4]
    for k, o in enumerate(order):
        v = vecs[:, o].copy()
        if v[np.argmax(np.abs(v))] < 0:
            v *= -1.0
        assert np.allclose(comps[k], v, atol=1e-9), k
    total = vals.sum()
    assert np.allclose(ratios, [vals[o] / total for o in order], atol=1e-12)
    assert ratios == sorted(ratios, reverse=True)
    # low-rank planted structure: top-3 must explain nearly everything
    assert sum(ratios[:3]) > 0.99


def test_pca_project_matches_numpy_gemm(spark):
    import numpy as np

    df, X = _rand_vecs(spark, n=120, d=8, seed=11)
    comps, _, mean = emb.pca_components(df, k=3, vec_col="embedding")
    mu = X.mean(axis=0)
    # the operator's own returned mean must match the data mean (to the
    # GRAM_SCALE quantum) and is what callers should center on
    import numpy as _np
    Xq = _np.rint(X * emb.GRAM_SCALE) / emb.GRAM_SCALE
    assert _np.allclose(mean, Xq.mean(axis=0), atol=1e-9)
    out = emb.pca_project(df, comps, center=mean)
    got = {r["vec_id"]: list(r["proj"]) for r in out.collect()}
    W = np.asarray(comps)
    # reference centers on the SAME (quantized) mean the operator
    # returned — raw mu differs at the GRAM_SCALE quantum
    assert np.allclose(mu, mean, atol=1e-6)
    ref = np.round((X - np.asarray(mean)) @ W.T, 6)
    for i in range(len(X)):
        assert np.allclose(got[i], ref[i], atol=1e-9), i
