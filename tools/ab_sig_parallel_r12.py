"""A/B (r12): keyed repartition of the narrow (id, h) gram rows before
the Arrow partial-min stage vs the current narrow pipeline.

Hypothesis: at bench scale the doc scan plans ~3 partitions, so the
Python partial stage uses 3 of 32 cores; hash-repartitioning the 16 B/
row (id, h) frame by id costs one small shuffle, parallelizes the
affine-mod matrix (the measured per-batch floor), and pre-partitions
the combine's groupBy(id) so its exchange disappears. This is NOT the
r8-rejected parallelism floor (that repartitioned full text bodies
pre-explosion).

Interleaved min/median-of-3 in ONE session; signature outputs asserted
identical. Run: python tools/ab_sig_parallel_r12.py
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

    spark = get_spark("ab-sig-parallel-r12")
    spark.sparkContext.setLogLevel("ERROR")
    d = load_table(spark, SF_DIR, "documents")

    def sig_current():
        return dd.minhash_signatures_from_docs(d, "doc_id", "text", 3, 128)

    def sig_repart():
        grams = dd.exploded_shingles(d, "doc_id", "text", 3, short_docs="whole")
        p = F.lit(dd.MERSENNE31).cast("long")
        base = grams.select(
            F.col("id").cast("string").alias("id"),
            F.pmod(dd._base_hash(F.col("g"), "md5"), p).alias("h"),
        ).filter(F.col("h").isNotNull())
        n = spark.sparkContext.defaultParallelism
        base = base.repartition(n, "id")
        out = dd._minhash_from_base_arrow(
            (base, lambda df: df.withColumn("id", F.col("id").cast("bigint"))),
            128,
        )
        return out

    # identity check once
    a = {r["id"]: tuple(r["sig"]) for r in sig_current().collect()}
    b = {r["id"]: tuple(r["sig"]) for r in sig_repart().collect()}
    assert a == b, "signatures differ!"
    print("signatures identical", len(a), file=sys.stderr)

    arms = {"sig_current": sig_current, "sig_repart": sig_repart}
    runs = {k: [] for k in arms}
    for k, fn in arms.items():
        spark.catalog.clearCache()
        force(fn())
    for _ in range(3):
        for k, fn in arms.items():
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            force(fn())
            runs[k].append(time.perf_counter() - t0)
    out = {
        k: {"median": round(sorted(r)[1], 3), "min": round(min(r), 3),
            "runs": [round(x, 3) for x in r]}
        for k, r in runs.items()
    }
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
