#!/usr/bin/env python
"""Interleaved A/B: old (r03) global-window BM25 ranking vs new (r04)
TakeOrdered pre-prune, in ONE session — the only code change on the
round-4 bench-drift mover list (q_text_search +54%, q_hybrid_search
+40% were flagged with no same-session attribution).

Methodology per PERF.md: A-B-A-B... within a single JVM, report per-arm
medians. Everything upstream of the ranking step (index, lengths,
postings, per-term scores) is IDENTICAL shared code; the arms differ
only in the final ranking shape, so the delta isolates the one change.

Usage: python tools/ab_bm25_shape.py [reps=7]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def _scored(spark, sf_dir):
    from etl_demos_spark.data import load_table
    from etl_demos_spark.operators import search

    d = load_table(spark, sf_dir, "documents")
    idx = search.build_term_index(d, "doc_id", "text")
    lens = search.doc_lengths(d, "doc_id", "text")
    terms = ["join", "fast", "table"]
    k1, b = 1.2, 0.75
    n_docs = lens.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avg_dl"),
    )
    postings = idx.filter(F.col("term").isin(terms))
    dfreq = postings.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    )
    scored = (
        postings.join(dfreq, "term")
        .join(lens, "doc_id")
        .crossJoin(F.broadcast(n_docs))
    )
    idf = F.log(
        F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_part = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avg_dl"))
    )
    per_term = F.round(idf * tf_part, 9).cast("decimal(24,9)")
    agg = scored.groupBy("doc_id").agg(
        F.count_distinct("term").cast("long").alias("n_terms_matched"),
        F.round(F.sum(per_term).cast("double"), 6).alias("bm25"),
    )
    return agg.filter(F.col("n_terms_matched") == len(terms))


def rank_old(agg: DataFrame, k: int = 10) -> DataFrame:
    """r03 shape: partitionless row_number over every matched doc."""
    w = Window.orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
    return agg.withColumn("rank", F.row_number().over(w).cast("long")).filter(
        F.col("rank") <= k
    )


def rank_new(agg: DataFrame, k: int = 10) -> DataFrame:
    """r04 shape: TakeOrdered pre-prune, then rank the k survivors."""
    topk = agg.orderBy(F.col("bm25").desc(), F.col("doc_id").asc()).limit(k)
    w = Window.orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
    return topk.withColumn("rank", F.row_number().over(w).cast("long"))


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from etl_demos_spark.session import get_spark

    spark = get_spark("ab-bm25")
    spark.sparkContext.setLogLevel("ERROR")

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    # warm both arms once
    force(rank_old(_scored(spark, sf_dir)))
    force(rank_new(_scored(spark, sf_dir)))
    a, b = [], []
    for _ in range(reps):
        for arm, sink in (("old", a), ("new", b)):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            force(
                (rank_old if arm == "old" else rank_new)(_scored(spark, sf_dir))
            )
            sink.append(time.perf_counter() - t0)
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    print(
        {
            "sf_dir": sf_dir,
            "reps": reps,
            "old_window_median_s": round(med(a), 3),
            "new_takeordered_median_s": round(med(b), 3),
            "old_min_s": round(min(a), 3),
            "new_min_s": round(min(b), 3),
        }
    )
    spark.stop()


if __name__ == "__main__":
    main()
