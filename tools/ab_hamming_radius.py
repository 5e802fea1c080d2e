#!/usr/bin/env python
"""Measure the pigeonhole-radius cost claim with numbers (r10).

image_dedup's docstring asserts candidates ≈ (h+1)·n²/2^(bits//(h+1)) —
the radius sits in the EXPONENT of the bucket count, so radius 10 over
64 bits (5-bit chunks, 32 buckets) degenerates toward n²/3 while
radius 4 (12-bit chunks, 4096 buckets) stays keyed. This tool measures
both on the 10x image corpus (/tmp/sf1, ~100k images):

  - exact candidate-pair volume per radius, computed ANALYTICALLY from
    the chunk-key histogram (Σ over (chunk,val) buckets of n·(n−1)/2 —
    no join executed, so the number is exact even where running the
    join would be prohibitive);
  - warm min-of-3 wall for the full pair query at each radius.

Usage: python tools/ab_hamming_radius.py  # → perf/ab_hamming_radius_r10.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402


def main() -> None:
    from pyspark.sql import SparkSession

    from etl_demos_spark.operators.dedup import (
        hamming_chunk_keys,
        materialize_reused,
    )
    from etl_demos_spark.operators.image_dedup import (
        DHASH_BITS,
        hamming_chunk_pairs,
        image_signatures,
    )
    from etl_demos_spark.session import configure_runtime
    from etl_demos_spark.workload_ext import _planted_image_corpus

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("ab-hamming-radius")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "32g")
        .getOrCreate()
    )
    configure_runtime(spark)

    corpus = _planted_image_corpus(spark, "/tmp/sf1")
    sigs = materialize_reused(image_signatures(corpus, "dhash"))
    n = sigs.count()

    out: dict = {
        "round": 10,
        "what": (
            "Candidate volume + wall for the pigeonhole Hamming join at "
            "radius 4 vs 10 over the 10x image corpus — the measured form "
            "of the 'radius is in the exponent' claim. Candidate counts "
            "are exact (chunk-key histogram, no join executed); wall is "
            "warm min-of-3 to a noop sink."
        ),
        "n_images": n,
        "results": {},
    }

    for radius in (4, 10):
        keys = hamming_chunk_keys(sigs, DHASH_BITS, radius)
        cand = (
            keys.groupBy("chunk", "val")
            .agg(F.count(F.lit(1)).alias("c"))
            .agg(F.sum(F.expr("c * (c - 1) / 2")).alias("pairs"))
            .collect()[0]["pairs"]
        )
        pairs_df = hamming_chunk_pairs(sigs, DHASH_BITS, radius)
        pairs_df.write.format("noop").mode("overwrite").save()  # warm
        times = []
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            hamming_chunk_pairs(sigs, DHASH_BITS, radius).write.format(
                "noop"
            ).mode("overwrite").save()
            times.append(time.perf_counter() - t0)
        out["results"][f"radius_{radius}"] = {
            "chunks": radius + 1,
            "chunk_bits": DHASH_BITS // (radius + 1),
            "candidate_pairs": int(cand),
            "true_pairs": pairs_df.count(),
            "wall_min3": round(min(times), 3),
        }

    r4 = out["results"]["radius_4"]
    r10 = out["results"]["radius_10"]
    out["candidate_ratio_10_vs_4"] = round(
        r10["candidate_pairs"] / max(r4["candidate_pairs"], 1), 1
    )
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "perf",
        "ab_hamming_radius_r10.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
