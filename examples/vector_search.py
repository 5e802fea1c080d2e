#!/usr/bin/env python
"""Runnable example: embedding corpus → compressed + indexed ANN search
→ semantic dedup, end to end.

    python examples/vector_search.py [sf_dir]

The similarity-search surface the way a retrieval pipeline would wire
it:

1. exact brute-force top-k (the correctness baseline),
2. product-quantization compress + ADC search with exact re-rank
   (the RAM-feasible path at billions of vectors),
3. IVF on-disk index with partition-pruned probes (the scan-avoidance
   path for written corpora),
4. SemDeDup cluster-restricted semantic dedup of the corpus.
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F

from etl_demos_spark.engine import Engine
from etl_demos_spark.operators import similarity
from etl_demos_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("vector-search")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    vecs = Engine(spark).vectors(emb)
    query = emb.orderBy("vec_id").limit(1).collect()[0]["embedding"]

    exact = vecs.topk(query, k=10)
    exact_ids = [r["vec_id"] for r in exact.collect()]
    print(f"exact top-10: {exact_ids}")

    books, codes = vecs.pq_compress(m=4, k=16, sample=2000)
    pq_hits = vecs.pq_search(codes, books, query, k=10)
    pq_ids = [r["vec_id"] for r in pq_hits.collect()]
    recall = len(set(pq_ids) & set(exact_ids)) / 10
    print(f"pq+rerank top-10: {pq_ids} (recall vs exact: {recall:.1f})")

    with tempfile.TemporaryDirectory() as td:
        cents = similarity.ivf_build_centroids(emb, n_cells=8)
        idx = f"{td}/ivf"
        similarity.ivf_write(emb, cents, idx)
        queries = spark.createDataFrame(
            [(0, [float(x) for x in query])],
            "query_id long, query_vec array<float>",
        )
        ivf_hits = similarity.ivf_topk_indexed(
            spark, idx, queries, cents, k=10, nprobe=3
        )
        ivf_ids = [r["vec_id"] for r in ivf_hits.collect()]
        ivf_recall = len(set(ivf_ids) & set(exact_ids)) / 10
        print(f"ivf(nprobe=3) top-10: {ivf_ids} (recall vs exact: {ivf_recall:.1f})")

    cents_df = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cell"), F.col("embedding").alias("cvec")
    )
    kept = vecs.semantic_dedup(cents_df, threshold=0.45)
    print(f"semantic dedup @0.45: {emb.count()} vectors -> {kept.count()} kept")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
