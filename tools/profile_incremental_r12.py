"""Stage-by-stage wall profile of q_dedup_incremental at sf0.1 — where
do the ~9 bench seconds go? Cumulative prefixes of the pipeline, each
forced with the noop sink, interleaved min/median-of-3 (PERF.md
discipline). Run: python tools/profile_incremental_r12.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def force(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    import pyspark.sql.functions as F

    from etl_demos_spark.data import load_table
    from etl_demos_spark.operators import dedup as dd
    from etl_demos_spark.session import get_spark

    spark = get_spark("profile-incremental-r12")
    spark.sparkContext.setLogLevel("ERROR")

    def stages():
        d = load_table(spark, SF_DIR, "documents")
        half = d.agg((F.max("doc_id") / 2).cast("long").alias("h")).collect()[0]["h"]
        new = d.filter(F.col("doc_id") > half)
        existing = d.filter(F.col("doc_id") <= half)

        def store_df():
            grams = dd.exploded_shingles(existing, "doc_id", "text", 3)
            return dd.minhash_signatures_from_grams(grams, "id", "g", 128)

        def new_sigs_df():
            return dd.minhash_signatures_from_docs(
                new, "doc_id", "text", 3, 128, "md5", short_docs="whole"
            )

        def full_df():
            kept, _ = dd.incremental_minhash_dedup(new, store_df(), threshold=0.5)
            return kept.orderBy("doc_id")

        def probe_only():
            # store + new sigs + corpus probe, stopping at `fresh`
            rows = 128 // 32
            store = store_df().select("id", "sig").persist()
            new_sigs = new_sigs_df().persist()
            new_b = dd.banded_buckets(new_sigs, 32, rows)
            ex_b = dd.banded_buckets(store, 32, rows).select(
                F.col("id").alias("id2"), "band", "bucket"
            )
            est = dd._sig_est_jaccard(128)
            cross_cand = (
                new_b.join(ex_b, ["band", "bucket"])
                .select("id", "id2")
                .dropDuplicates(["id", "id2"])
            )
            cross_matched = (
                cross_cand.join(new_sigs, "id")
                .join(store.select(F.col("id").alias("id2"), F.col("sig").alias("sig2")), "id2")
                .withColumn("est", est)
                .filter(F.col("est") >= 0.5)
                .select("id")
                .distinct()
            )
            fresh = new_sigs.join(cross_matched, "id", "left_anti")
            out = fresh.localCheckpoint(eager=True)
            new_sigs.unpersist()
            store.unpersist()
            return out

        return {
            "1_store_sigs": store_df,
            "2_new_sigs": new_sigs_df,
            "3_thru_corpus_probe": probe_only,
            "4_full_query": full_df,
        }

    names = list(stages().keys())
    runs = {n: [] for n in names}
    # warm-up sweep
    for n, fn in stages().items():
        spark.catalog.clearCache()
        force(fn())
    for _ in range(3):
        for n in names:
            spark.catalog.clearCache()
            fn = stages()[n]
            t0 = time.perf_counter()
            force(fn())
            runs[n].append(time.perf_counter() - t0)
    out = {
        n: {"median": round(sorted(r)[1], 3), "min": round(min(r), 3), "runs": [round(x, 3) for x in r]}
        for n, r in runs.items()
    }
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
