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
