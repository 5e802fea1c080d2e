#!/usr/bin/env python
"""A/B: fused bidirectional blocked k-NN vs two independent passes in
mine_bitext (r10). VERDICT: REJECTED at 0.5× — see the artifact and
PERF.md; the diagnosis (extraction, not GEMM, dominates) led to the
vectorized-argsort fix that shipped instead.

The fused form builds the tile grid once and reads S = src·tgtᵀ along
both axes; the two-pass form replicates/shuffles both corpora twice
and multiplies twice. Identical output is gated first (mined pairs
pair-for-pair at both SFs), then interleaved warm min-of-3 walls at
sf0.1 (2k vectors) and /tmp/sf1 (20k — flop-bound, where a 2x GEMM
saving would have shown if GEMM were the cost).

The losing fused implementation lives INLINE below (it was never worth
a package slot) so the experiment stays reproducible. Note it predates
the vectorized-argsort extraction, as does the blocked_topk it was
raced against in the recorded artifact — rerunning today races it
against the faster shipped form.

Usage: python tools/ab_bitext_fused.py  # → perf/ab_bitext_fused_r10.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _fused_bidirectional(a, b, k=10, n_a_blocks=8, n_b_blocks=8):
    """The rejected fused form: one tile grid, per-tile S = A·Bᵀ read
    along rows (a→b) and columns (b→a), partial top-k both axes, eager
    checkpoint, two final windows."""
    import numpy as np
    import pandas as pd
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from etl_demos_spark.operators.dedup import materialize_reused
    from etl_demos_spark.operators.similarity import _np_norm_rows

    a_rep = a.select(
        F.pmod(F.xxhash64(F.col("vec_id")), F.lit(n_a_blocks)).cast("int").alias("_ab"),
        F.explode(F.sequence(F.lit(0), F.lit(n_b_blocks - 1))).alias("_bb"),
        F.lit(0).alias("_side"),
        F.col("vec_id").alias("_id"),
        F.col("embedding").alias("_vec"),
    )
    b_rep = b.select(
        F.explode(F.sequence(F.lit(0), F.lit(n_a_blocks - 1))).alias("_ab"),
        F.pmod(F.xxhash64(F.col("vec_id")), F.lit(n_b_blocks)).cast("int").alias("_bb"),
        F.lit(1).alias("_side"),
        F.col("vec_id").alias("_id"),
        F.col("embedding").alias("_vec"),
    )
    rep = a_rep.unionByName(b_rep)
    out_schema = "_dir int, query_id long, vec_id long, cos_sim double"

    def tile(key, pdf):
        amask = pdf["_side"].to_numpy() == 0
        A_pdf, B_pdf = pdf[amask], pdf[~amask]
        empty = pd.DataFrame(
            {"_dir": [], "query_id": [], "vec_id": [], "cos_sim": []}
        ).astype({"_dir": "int32", "query_id": "int64", "vec_id": "int64",
                  "cos_sim": "float64"})
        if not len(A_pdf) or not len(B_pdf):
            return empty
        A = _np_norm_rows(np.array(list(A_pdf["_vec"]), dtype=np.float64))
        B = _np_norm_rows(np.array(list(B_pdf["_vec"]), dtype=np.float64))
        a_ids = A_pdf["_id"].to_numpy()
        b_ids = B_pdf["_id"].to_numpy()
        parts, b2a_chunks = [], []
        chunk = max(1, 32_000_000 // max(len(b_ids), 1))
        kk_b = min(k, len(b_ids))
        for s in range(0, len(a_ids), chunk):
            S = A[s : s + chunk] @ B.T
            for i in range(S.shape[0]):
                row = S[i]
                idx = np.lexsort((b_ids, -row))[:kk_b]
                parts.append(pd.DataFrame({
                    "_dir": np.zeros(kk_b, dtype=np.int32),
                    "query_id": np.full(kk_b, a_ids[s + i]),
                    "vec_id": b_ids[idx], "cos_sim": row[idx]}))
            kk_a = min(k, len(a_ids[s : s + chunk]))
            for j in range(S.shape[1]):
                col = S[:, j]
                idx = np.lexsort((a_ids[s : s + chunk], -col))[:kk_a]
                b2a_chunks.append(pd.DataFrame({
                    "_dir": np.ones(kk_a, dtype=np.int32),
                    "query_id": np.full(kk_a, b_ids[j]),
                    "vec_id": a_ids[s : s + chunk][idx], "cos_sim": col[idx]}))
        if b2a_chunks:
            b2a = pd.concat(b2a_chunks, ignore_index=True)
            b2a = b2a.sort_values(
                ["query_id", "cos_sim", "vec_id"], ascending=[True, False, True]
            ).groupby("query_id", sort=False).head(min(k, len(a_ids)))
            parts.append(b2a)
        return pd.concat(parts, ignore_index=True) if parts else empty

    scored = materialize_reused(rep.groupBy("_ab", "_bb").applyInPandas(tile, out_schema))

    def final(direction):
        w = Window.partitionBy("query_id").orderBy(
            F.col("cos_sim").desc(), F.col("vec_id").asc()
        )
        return (
            scored.filter(F.col("_dir") == direction)
            .withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
            .select("query_id", "vec_id", "cos_sim")
        )

    return final(0), final(1)


def main() -> None:
    from pyspark.sql import SparkSession
    import pyspark.sql.functions as F

    from etl_demos_spark.operators import similarity
    from etl_demos_spark.session import configure_runtime

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("ab-bitext-fused")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "32g")
        .getOrCreate()
    )
    configure_runtime(spark)

    def sides(sf_dir):
        e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        src = e.filter(F.col("label") % 2 == 0).select("vec_id", "embedding")
        tgt = e.filter(F.col("label") % 2 == 1).select("vec_id", "embedding")
        return src.localCheckpoint(eager=True), tgt.localCheckpoint(eager=True)

    def q(df):
        return df.select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )

    def two_pass(src, tgt, k=4):
        return (
            similarity.blocked_topk(tgt, q(src), k=k),
            similarity.blocked_topk(src, q(tgt), k=k),
        )

    out: dict = {
        "round": 10,
        "what": (
            "fused bidirectional tile pass vs two independent blocked "
            "passes (both k-NN directions of a bitext mine): identical-"
            "output gate, then interleaved warm min-of-3 walls (noop "
            "sink, local[32]). The RECORDED r10 verdict raced full "
            "mines against the pre-vectorization blocked_topk; this "
            "re-runnable form races the raw substrates against the "
            "shipped (vectorized) one."
        ),
        "results": {},
    }

    # identical-output gate at sf0.01
    src, tgt = sides("/root/testdata/sf0.01")
    ff, fb = _fused_bidirectional(src, tgt, k=4)
    tf, tb = two_pass(src, tgt, k=4)
    key = lambda df: {(r["query_id"], r["vec_id"]) for r in df.collect()}
    assert key(ff) == key(tf) and key(fb) == key(tb), "variants disagree"
    out["identical_output"] = True

    import time

    for sf_name, sf_dir in (("sf0.1", "/root/testdata/sf0.1"), ("sf1", "/tmp/sf1")):
        src, tgt = sides(sf_dir)

        def run_fused():
            f, b = _fused_bidirectional(src, tgt, k=4)
            f.unionByName(b).write.format("noop").mode("overwrite").save()

        def run_two():
            f, b = two_pass(src, tgt, k=4)
            f.unionByName(b).write.format("noop").mode("overwrite").save()

        impls = {"fused": run_fused, "two_pass": run_two}
        walls = {name: [] for name in impls}
        for fn in impls.values():
            fn()  # warm
        for _ in range(3):
            for name, fn in impls.items():
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                fn()
                walls[name].append(time.perf_counter() - t0)
        out["results"][sf_name] = {n: round(min(t), 3) for n, t in walls.items()}
        out["results"][sf_name]["speedup"] = round(
            min(walls["two_pass"]) / min(walls["fused"]), 2
        )

    print(json.dumps(out))
    # NOTE: does NOT overwrite perf/ab_bitext_fused_r10.json — that file
    # is the recorded r10 adjudication; rerun output goes to stdout.


if __name__ == "__main__":
    main()
