"""Similarity search: brute-force exactness vs numpy; ANN recall."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest

from etl_demos_spark.operators import similarity


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(11)
    X = rng.standard_normal((200, 16)).astype(np.float32)
    rows = [(i, [float(x) for x in X[i]]) for i in range(len(X))]
    return X, spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_brute_force_matches_numpy(spark, vectors):
    X, df = vectors
    q = df.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = similarity.brute_force_topk(df, q, k=5).orderBy(F.desc("cos_sim")).collect()
    Xd = X.astype(np.float64)
    sims = (Xd @ Xd[0]) / (np.linalg.norm(Xd, axis=1) * np.linalg.norm(Xd[0]))
    expect = np.argsort(-sims)[:5]
    assert [r["vec_id"] for r in got] == list(expect)
    for r in got:
        assert abs(r["cos_sim"] - sims[r["vec_id"]]) < 1e-9


def test_ann_lsh_recall(spark, vectors):
    X, df = vectors
    q = df.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = similarity.brute_force_topk(df, q, k=5).collect()
    rng = np.random.default_rng(3)
    planes = rng.standard_normal((4, 16)).tolist()
    approx = similarity.ann_topk_lsh(df, q, planes, k=5).collect()
    exact_set = {(r["query_id"], r["vec_id"]) for r in exact}
    approx_set = {(r["query_id"], r["vec_id"]) for r in approx}
    # self-match must always be found (a vector shares its own bucket)
    for i in range(10):
        assert (i, i) in approx_set
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.3, f"suspiciously low ANN recall: {recall}"


def test_ivf_assignment_partitions_corpus(spark, vectors):
    X, df = vectors
    cents = similarity.ivf_build_centroids(df, n_cells=4, sample=200)
    assigned = similarity.ivf_assign(df, cents)
    counts = {r["cell"]: r["n"] for r in assigned.groupBy("cell").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 200
    assert len(counts) == 4  # every cell non-empty for random data
    # assignment is the true argmin
    row = assigned.filter(F.col("vec_id") == 7).collect()[0]
    d = ((np.array(cents) - X[7].astype(np.float64)) ** 2).sum(1)
    assert row["cell"] == int(d.argmin())


def test_ivf_topk_recall(spark, vectors):
    X, df = vectors
    q = df.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    cents = similarity.ivf_build_centroids(df, n_cells=6, sample=200)
    exact = {(r["query_id"], r["vec_id"]) for r in similarity.brute_force_topk(df, q, k=5).collect()}
    approx = {
        (r["query_id"], r["vec_id"])
        for r in similarity.ivf_topk(df, q, cents, k=5, nprobe=3).collect()
    }
    # self-match always present (own cell is probed first)
    for i in range(10):
        assert (i, i) in approx
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall too low: {recall}"


def test_ann_lsh_multiprobe_improves_recall(spark, vectors):
    X, df = vectors
    q = df.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {(r["query_id"], r["vec_id"]) for r in similarity.brute_force_topk(df, q, k=5).collect()}
    rng = np.random.default_rng(3)
    planes = rng.standard_normal((5, 16)).tolist()

    def recall(mp):
        got = {
            (r["query_id"], r["vec_id"])
            for r in similarity.ann_topk_lsh(df, q, planes, k=5, multiprobe=mp).collect()
        }
        return len(exact & got) / len(exact)

    r0, r3 = recall(0), recall(5)
    assert r3 >= r0  # probing neighbors can only add candidates
    assert r3 > 0.4


def test_brute_force_gemm_matches_hof(spark, vectors):
    """The GEMM corpus scan (default) and the all-JVM HOF expression must
    return the same neighbors in the same order; similarities agree to
    well past the 1e-6 the workload rounds to."""
    X, df = vectors
    q = df.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    gemm = similarity.brute_force_topk(df, q, k=7, method="gemm").collect()
    hof = similarity.brute_force_topk(df, q, k=7, method="hof").collect()
    assert [(r["query_id"], r["vec_id"]) for r in gemm] == [
        (r["query_id"], r["vec_id"]) for r in hof
    ]
    for a, b in zip(gemm, hof):
        assert abs(a["cos_sim"] - b["cos_sim"]) < 1e-9


def test_ivf_indexed_matches_in_memory(spark, vectors, tmp_path):
    """ivf_write + ivf_topk_indexed over the written index must return
    exactly what the in-memory ivf_topk returns for the same centroids
    and nprobe — the on-disk layout changes the scan, not the answer."""
    X, df = vectors
    q = df.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    cents = similarity.ivf_build_centroids(df, n_cells=6, sample=200)
    path = str(tmp_path / "ivf_index")
    similarity.ivf_write(df, cents, path)
    mem = sorted(
        (r["query_id"], r["vec_id"], round(r["cos_sim"], 9))
        for r in similarity.ivf_topk(df, q, cents, k=5, nprobe=3).collect()
    )
    idx = sorted(
        (r["query_id"], r["vec_id"], round(r["cos_sim"], 9))
        for r in similarity.ivf_topk_indexed(
            spark, path, q, cents, k=5, nprobe=3
        ).collect()
    )
    assert idx == mem


def test_lsh_gemm_buckets_match_expression_form(spark, vectors):
    """The numpy GEMM bucket assignment (corpus-scale path) must produce
    bit-identical buckets to the interpreted expression form, and the
    full ANN result must be identical under either method."""
    X, df = vectors
    rng = np.random.default_rng(7)
    planes = rng.standard_normal((6, 16)).tolist()
    expr = {r["vec_id"]: r["bucket"] for r in df.withColumn(
        "bucket", similarity.rp_lsh_buckets(planes)).collect()}
    gemm = {r["vec_id"]: r["bucket"] for r in similarity.rp_lsh_buckets_gemm(
        df, planes).collect()}
    assert expr == gemm
    q = df.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    a = sorted(map(tuple, similarity.ann_topk_lsh(
        df, q, planes, k=5, bucket_method="expr").collect()))
    b = sorted(map(tuple, similarity.ann_topk_lsh(
        df, q, planes, k=5, bucket_method="gemm").collect()))
    assert a == b


def test_ivf_gemm_assignment_matches_expression_form(spark, vectors):
    """ivf_assign_gemm (the corpus-scale Arrow pass that ivf_write /
    ivf_topk run) must be row-identical to the interpreted expression
    form — same cells, same first-min tiebreak — and its plan must show
    the Arrow mapInPandas pass, not interpreted array-aggregates."""
    X, df = vectors
    cents = similarity.ivf_build_centroids(df, n_cells=5, sample=200)
    gemm_df = similarity.ivf_assign_gemm(df, cents)
    expr = {r["vec_id"]: r["cell"] for r in similarity.ivf_assign(df, cents).collect()}
    gemm = {r["vec_id"]: r["cell"] for r in gemm_df.collect()}
    assert expr == gemm
    # schema preserved + cell appended (ivf_write partitions on it)
    assert gemm_df.columns == df.columns + ["cell"]
    assert "MapInPandas" in gemm_df._jdf.queryExecution().toString()


def test_hard_negatives_gemm_matches_hof_and_excludes_labels(spark, vectors):
    """Hard-negative mining: the masked-GEMM path and the cross-join
    HOF path must agree pair-for-pair, no returned negative may share
    the query's label, and each returned set must equal the
    first-principles numpy answer (top-k over label-excluded cosines) —
    proving the in-scorer mask loses nothing that post-filtering a
    plain top-k would."""
    X, df = vectors
    lab = df.withColumn("label", (F.col("vec_id") % 4).cast("int"))
    q = lab.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
        F.col("label").alias("query_label"),
    )
    gemm = similarity.hard_negatives(lab, q, k=7, method="gemm").collect()
    hof = similarity.hard_negatives(lab, q, k=7, method="hof").collect()
    assert [(r["query_id"], r["vec_id"], r["neg_label"]) for r in gemm] == [
        (r["query_id"], r["vec_id"], r["neg_label"]) for r in hof
    ]
    for a, b in zip(gemm, hof):
        assert abs(a["cos_sim"] - b["cos_sim"]) < 1e-9

    Xd = X.astype(np.float64)
    Xn = Xd / np.linalg.norm(Xd, axis=1, keepdims=True)
    labels = np.arange(len(X)) % 4
    by_q = {}
    for r in gemm:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rows in by_q.items():
        assert all(r["neg_label"] != labels[qid] for r in rows)
        sims = Xn @ Xn[qid]
        order = [
            i
            for i in np.lexsort((np.arange(len(X)), -sims))
            if labels[i] != labels[qid]
        ][:7]
        assert [r["vec_id"] for r in rows] == order


def test_ivf_topk_nprobe_one(spark):
    """nprobe=1 (the fastest standard probe) must work: ivf_assign's
    n_cells=1 contract emits a scalar `cell`, which the probe sites
    wrap into the array the explode expects."""
    from etl_demos_spark.operators import similarity

    df = spark.range(60).selectExpr(
        "id AS vec_id",
        "array(cast(id % 7 as double), cast(id % 5 as double), 1.0d) AS embedding",
    )
    cents = similarity.ivf_build_centroids(df, n_cells=4, sample=60)
    q = df.filter("vec_id < 2").selectExpr(
        "vec_id AS query_id", "embedding AS query_vec"
    )
    out = similarity.ivf_topk(df, q, cents, k=3, nprobe=1).collect()
    assert len(out) > 0
    assert {r["query_id"] for r in out} == {0, 1}


def test_brute_force_topk_empty_queries(spark):
    from etl_demos_spark.operators import similarity

    df = spark.range(10).selectExpr(
        "id AS vec_id", "array(1.0d, cast(id as double)) AS embedding"
    )
    q = df.filter("vec_id < 0").selectExpr(
        "vec_id AS query_id", "embedding AS query_vec"
    )
    assert similarity.brute_force_topk(df, q, k=3).count() == 0


def test_semantic_gemm_noncontiguous_cell_ids(spark):
    """use_gemm must emit the caller's ACTUAL cell ids, not sorted-list
    positions, when the centroid id set is non-contiguous."""
    from etl_demos_spark.operators.embedding_dedup import (
        semantic_pairs_clustered,
    )

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.001]), (3, [0.0, 1.0]), (4, [0.001, 1.0])],
        "vec_id long, embedding array<double>",
    )
    cents = spark.createDataFrame(
        [(5, [1.0, 0.0]), (9, [0.0, 1.0])], "cell int, cvec array<double>"
    )
    expr_pairs = {
        (r["id_a"], r["id_b"], r["cell"])
        for r in semantic_pairs_clustered(df, cents, threshold=0.9).collect()
    }
    gemm_pairs = {
        (r["id_a"], r["id_b"], r["cell"])
        for r in semantic_pairs_clustered(
            df, cents, threshold=0.9, use_gemm=True
        ).collect()
    }
    assert expr_pairs == gemm_pairs
    assert {c for _, _, c in gemm_pairs} <= {5, 9}


def test_hard_negatives_gemm_rejects_non_integer_corpus_labels(spark, vectors):
    """Both sides of the label contract must fail at the operator
    boundary: a string CORPUS label would otherwise die as an opaque
    Arrow conversion error against the 'neg_label long' schema deep
    inside mapInPandas execution."""
    import pytest

    X, df = vectors
    lab_str = df.withColumn(
        "label", F.concat(F.lit("c"), (F.col("vec_id") % 4)).cast("string")
    )
    q = df.limit(2).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
        (F.col("vec_id") % 4).cast("long").alias("query_label"),
    )
    with pytest.raises(TypeError, match="integer corpus labels"):
        similarity.hard_negatives(lab_str, q, k=3, method="gemm")


def test_cosine_zero_norm_agrees_across_paths(spark):
    """A zero-norm vector must score 0.0 in BOTH forms — the expression
    path used to throw DIVIDE_BY_ZERO under ANSI while the GEMM path
    returned 0.0."""
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    q = spark.createDataFrame(
        [(0, [1.0, 0.0])], "query_id long, query_vec array<double>"
    )
    for method in ("hof", "gemm"):
        got = {r["vec_id"]: r["cos_sim"] for r in
               similarity.brute_force_topk(corpus, q, 2, method=method).collect()}
        assert got[2] == 0.0 and abs(got[1] - 1.0) < 1e-12, method


def test_hard_negatives_null_corpus_labels_are_not_negatives(spark):
    """A NULL-label corpus row matches nothing under the hof/oracle <>
    semantics; the gemm path must agree (Arrow NaN != label is True)."""
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0], 0), (2, [0.9, 0.1], 1), (3, [0.95, 0.05], None)],
        "vec_id long, embedding array<double>, label long",
    )
    q = spark.createDataFrame(
        [(0, [1.0, 0.0], 0)],
        "query_id long, query_vec array<double>, query_label long",
    )
    for method in ("hof", "gemm"):
        ids = {r["vec_id"] for r in
               similarity.hard_negatives(corpus, q, k=5, method=method).collect()}
        assert ids == {2}, (method, ids)


def test_gemm_paths_reject_string_ids_at_boundary(spark):
    import pytest

    corpus = spark.createDataFrame(
        [("a", [1.0, 0.0])], "vec_id string, embedding array<double>"
    )
    q = spark.createDataFrame(
        [(0, [1.0, 0.0])], "query_id long, query_vec array<double>"
    )
    with pytest.raises(TypeError, match="integer ids"):
        similarity.brute_force_topk(corpus, q, 1, method="gemm")
    # hof handles any id type
    assert similarity.brute_force_topk(corpus, q, 1, method="hof").count() == 1


def test_rp_lsh_rejects_plane_overflow(spark):
    import pytest

    planes63 = [[1.0, 0.0]] * 63
    with pytest.raises(ValueError, match="62 planes"):
        similarity.rp_lsh_buckets(planes63)
    df = spark.createDataFrame([(1, [1.0, 0.0])], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="62 planes"):
        similarity.rp_lsh_buckets_gemm(df, planes63)


def test_blocked_topk_matches_brute_force(spark, vectors):
    """The two-sided tiled k-NN must be pinned identical to the
    collect-based gemm scan: per-tile partial top-k under the same
    (cos desc, id asc) key is lossless, and each pair's cosine is one
    full-length float64 dot in either strategy."""
    X, df = vectors
    q = (
        df.filter(F.col("vec_id") % 3 == 0)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
    )
    want = {
        (r["query_id"], r["vec_id"]): r["cos_sim"]
        for r in similarity.brute_force_topk(df, q, k=5).collect()
    }
    got = {
        (r["query_id"], r["vec_id"]): r["cos_sim"]
        for r in similarity.blocked_topk(
            df, q, k=5, n_corpus_blocks=4, n_query_blocks=3
        ).collect()
    }
    assert got.keys() == want.keys()
    for key, cos in got.items():
        assert abs(cos - want[key]) < 1e-12, key


def test_blocked_topk_more_blocks_than_rows(spark, vectors):
    """Degenerate tiling (blocks >> rows → most tiles one-sided or
    empty) must still return the exact top-k."""
    X, df = vectors
    small = df.filter(F.col("vec_id") < 6)
    q = small.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    want = {
        (r["query_id"], r["vec_id"])
        for r in similarity.brute_force_topk(small, q, k=3).collect()
    }
    got = {
        (r["query_id"], r["vec_id"])
        for r in similarity.blocked_topk(
            small, q, k=3, n_corpus_blocks=16, n_query_blocks=16
        ).collect()
    }
    assert got == want


def test_blocked_topk_empty_queries(spark, vectors):
    X, df = vectors
    q = df.filter(F.lit(False)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    assert similarity.blocked_topk(df, q, k=3).count() == 0


def test_blocked_topk_rejects_string_ids(spark, vectors):
    X, df = vectors
    q = df.select(
        F.col("vec_id").cast("string").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    with pytest.raises(TypeError, match="integer ids"):
        similarity.blocked_topk(df, q, k=3)


def test_ann_lsh_nonbroadcast_matches_broadcast_form(spark, vectors):
    """broadcast_queries=False (the two-corpus route) is output-identical
    to the broadcast form — only the join strategy and the query-side
    bucket assignment (gemm vs expression) differ, and those are pinned
    equal elsewhere."""
    import numpy as np

    X, df = vectors
    planes = np.random.default_rng(2).normal(size=(10, 16)).tolist()
    q = df.filter(F.col("vec_id") % 7 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    a = {
        (r["query_id"], r["vec_id"], round(r["cos_sim"], 9))
        for r in similarity.ann_topk_lsh(df, q, planes, k=5).collect()
    }
    b = {
        (r["query_id"], r["vec_id"], round(r["cos_sim"], 9))
        for r in similarity.ann_topk_lsh(
            df, q, planes, k=5, broadcast_queries=False
        ).collect()
    }
    assert a == b
