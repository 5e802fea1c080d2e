"""Synthetic stress for the two 100 TB flagship paths ABOVE their routing
thresholds — the regime the driver's sf0.1 testdata never reaches.

Scenario A — tiled two-sided GEMM embedding dedup: 500k generated
64-dim vectors (> the 200k broadcast→tiled routing threshold in
operators/embedding_dedup.cosine_pairs_gemm), 5k planted near-dup twins.
Verifies every planted pair is found (the tiled path is exact), records
wall time, tile sizes, and the peak in-flight similarity-slab bytes.

Scenario B — incremental MinHash dedup: 50k-doc corpus signature store
probed by a 10k-doc batch (5k exact dups of the corpus, 5k fresh with
500 planted within-batch dup pairs). Verifies the cross-batch drops and
within-batch min-id survivors, records wall time and the widest
intermediate (exploded grams) with its max-partition row count.

Scenario C — distributed PCA Gram pass: 500k 64-dim vectors, the full
DECIMAL(38,0) Gram matrix asserted bit-identical across partitionings.

Scenario D — hop-bounded multi-source BFS: 5M-node binary-heap tree,
the ENTIRE 10-hop distance table asserted against the closed form
floor(log2(v+1)) — frontier expansion, per-round shuffle ∝ frontier
adjacency, never |V|.

All data is GENERATED IN SPARK (spark.range + JVM expressions) — the
driver never materializes the corpus. Run:

    python stress_scale.py            # both scenarios, one JSON line each
    python stress_scale.py quick      # ~1/10 sizes (CI smoke)
"""

from __future__ import annotations

import json
import sys
import time

import pyspark.sql.functions as F

from etl_demos_spark.session import get_spark


def stress_tiled_embedding_dedup(spark, n=500_000, dim=64, planted_every=100):
    """Planted twins: ids with id % planted_every == 1 reuse the base
    vector of id-1 plus a 1% jitter → cosine ≈ 0.9999; unplanted random
    64-dim vectors have |cos| ≲ 0.5 — the 0.95 threshold separates
    cleanly."""
    from etl_demos_spark.operators.embedding_dedup import cosine_pairs_gemm

    base_id = (
        F.col("id") - F.when(F.col("id") % planted_every == 1, 1).otherwise(0)
    )
    # deterministic pseudo-random component j of vector(base_id), plus a
    # tiny per-id jitter so twins are near- (not exact-) duplicates
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (
            (F.pmod(F.xxhash64(F.concat_ws("-", base_id, j)), 100_000) / 50_000.0 - 1.0)
            + (F.pmod(F.xxhash64(F.concat_ws("j", F.col("id"), j)), 1000) / 50_000.0)
        ),
    )
    df = spark.range(n).select(
        F.col("id").alias("vec_id"), vec.alias("embedding")
    )
    t0 = time.time()
    pairs = cosine_pairs_gemm(df, "vec_id", "embedding", threshold=0.95)
    planted_found, total_pairs = (
        pairs.agg(
            F.sum(
                F.when(
                    (F.col("id_b") - F.col("id_a") == 1)
                    & (F.col("id_b") % planted_every == 1),
                    1,
                ).otherwise(0)
            ),
            F.count(F.lit(1)),
        ).collect()[0]
    )
    wall = time.time() - t0
    n_planted = len([i for i in range(n) if i % planted_every == 1])
    # replication bound check: per-tile row counts (the applyInPandas
    # group size is THE executor memory driver for this operator)
    n_blocks = max(2, -(-n // 100_000))
    per_block = -(-n // n_blocks)
    return {
        "scenario": "tiled_embedding_dedup",
        "n_vectors": n,
        "dim": dim,
        "routing": f"tiled (> 200k), n_blocks={n_blocks}",
        "wall_sec": round(wall, 2),
        "planted_pairs": n_planted,
        "planted_found": int(planted_found),
        "total_pairs": int(total_pairs),
        "max_tile_rows": 2 * per_block,
        "peak_slab_mb": round(32_000_000 * 8 / 1e6),  # chunked S cap
        "ok": int(planted_found) == n_planted,
    }


def stress_incremental_minhash(spark, corpus_n=50_000, batch_n=10_000,
                               dup_every=10):
    """Corpus docs 0..corpus_n; batch ids corpus_n..corpus_n+batch_n.
    Batch doc with (id - corpus_n) % 2 == 0 reuses the text of corpus doc
    (id - corpus_n) → must be DROPPED by the corpus probe. Odd batch ids
    get fresh text, except each (id % dup_every == 9) pair shares text
    with id-2 → within-batch CC keeps the min id."""
    from etl_demos_spark.operators import dedup as dd

    def text_of(gid):
        return F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(40)),
                lambda j: F.substring(
                    F.md5(F.concat_ws("-", gid.cast("string"), j.cast("string"))),
                    1,
                    6,
                ),
            ),
        )

    corpus = spark.range(corpus_n).select(
        F.col("id").alias("doc_id"), text_of(F.col("id")).alias("text")
    )
    off = F.col("id") - corpus_n
    gid = (
        F.when(off % 2 == 0, off)  # exact dup of corpus doc `off`
        .when((F.col("id") % dup_every == 9) & (off % 2 == 1), F.col("id") - 2)
        .otherwise(F.col("id"))
    )
    batch = spark.range(corpus_n, corpus_n + batch_n).select(
        F.col("id").alias("doc_id"), text_of(gid).alias("text")
    )

    t0 = time.time()
    grams = dd.exploded_shingles(corpus, "doc_id", "text", 3)
    store = dd.minhash_signatures_from_grams(grams, "id", "g", 128)
    store = store.localCheckpoint(eager=True)  # "previous run's" persisted store
    t_store = time.time() - t0

    t0 = time.time()
    kept, updated = dd.incremental_minhash_dedup(batch, store, threshold=0.5)
    kept_ids = set(r[0] for r in kept.collect())
    wall = time.time() - t0

    expect_dropped = {corpus_n + i for i in range(0, batch_n, 2)}
    dup_losers = {
        i for i in range(corpus_n, corpus_n + batch_n)
        if i % dup_every == 9 and (i - corpus_n) % 2 == 1
        and (i - 2 - corpus_n) % 2 == 1
    }
    expect_kept = (
        set(range(corpus_n, corpus_n + batch_n)) - expect_dropped - dup_losers
    )
    gram_count = grams.count()
    part_rows = (
        grams.groupBy(F.spark_partition_id().alias("p"))
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    return {
        "scenario": "incremental_minhash",
        "corpus_docs": corpus_n,
        "batch_docs": batch_n,
        "store_build_sec": round(t_store, 2),
        "probe_wall_sec": round(wall, 2),
        "kept": len(kept_ids),
        "expected_kept": len(expect_kept),
        "exploded_grams": gram_count,
        "max_partition_gram_rows": part_rows,
        "ok": kept_ids == expect_kept,
    }


def stress_gram_covariance(spark, n=500_000, dim=64):
    """Scenario C — the distributed PCA moment pass at 500k×64 (250×
    the sf0.1 embeddings table): vectors generated in Spark, ONE
    augmented int64 GEMM partial per Arrow batch, DECIMAL(38,0) merge.
    Verifies (1) the count cell equals N exactly, (2) the whole
    (d+1)²/2-cell Gram matrix is BIT-IDENTICAL across two different
    partitionings (the decimal merge is order-independent — the claim
    that makes the pass safe on any cluster layout), and records wall
    time for the corpus pass."""
    from etl_demos_spark.operators.embeddings import GRAM_SCALE, gram_matrix

    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: F.pmod(F.xxhash64(F.concat_ws("g", F.col("id"), j)), 100_000)
        / 50_000.0
        - 1.0,
    )
    df = spark.range(n).select(
        F.col("id").alias("vec_id"), vec.cast("array<double>").alias("embedding")
    )
    t0 = time.time()
    g1 = {
        (r["i"], r["j"]): str(r["s"])
        for r in gram_matrix(df.repartition(64), "embedding").collect()
    }
    wall = time.time() - t0
    g2 = {
        (r["i"], r["j"]): str(r["s"])
        for r in gram_matrix(df.repartition(17), "embedding").collect()
    }
    n_cell = int(g1[(dim, dim)]) // (GRAM_SCALE * GRAM_SCALE)
    return {
        "scenario": "gram_covariance_pass",
        "n_vectors": n,
        "dim": dim,
        "wall_s": round(wall, 2),
        "cells": len(g1),
        "count_cell_exact": n_cell == n,
        "bit_identical_across_partitionings": g1 == g2,
        "ok": (n_cell == n) and g1 == g2 and len(g1) == (dim + 2) * (dim + 1) // 2,
    }


def stress_bfs_frontier(spark, n=5_000_000, hops=10):
    """Scenario D — hop-bounded BFS on a 5M-node binary-heap tree
    (edges i -> 2i+1, 2i+2): the iterative-graph flagship above
    testdata scale. The analytic ground truth is exact — from seed 0
    the undirected distance to node v IS floor(log2(v+1)) — so the
    scenario asserts the ENTIRE distance table, not just wall time.
    The scale property under test: per-round cost must track the
    (tiny) frontier, not |V| — AQE broadcasts the dist side of each
    relax join, so every round is a map-only pass over the persisted
    edge table with no |V|-sized shuffle."""
    from etl_demos_spark.operators.graph import bfs_distances

    half = n // 2
    kids = spark.range(half).select(
        F.col("id").alias("a"),
        F.explode(
            F.array(F.col("id") * 2 + 1, F.col("id") * 2 + 2)
        ).alias("b"),
    ).filter(F.col("b") < n)
    seeds = spark.range(1).select(F.col("id").alias("node"))
    t0 = time.time()
    dist = bfs_distances(kids, seeds, iters=hops, src="a", dst="b")
    mismatches, reached = (
        dist.select(
            "node",
            "dist",
            F.floor(F.log2(F.col("node") + 1)).cast("long").alias("want"),
        )
        .agg(
            F.sum((F.col("dist") != F.col("want")).cast("long")).alias("bad"),
            F.count(F.lit(1)).alias("m"),
        )
        .collect()[0]
    )
    wall = time.time() - t0
    expect = (1 << (hops + 1)) - 1  # full levels 0..hops
    return {
        "scenario": "bfs_frontier_5M",
        "n_nodes": n,
        "n_edges": n - 1,
        "hops": hops,
        "wall_s": round(wall, 2),
        "reached": int(reached),
        "reached_expected": expect,
        "distance_mismatches": int(mismatches),
        "ok": int(mismatches) == 0 and int(reached) == expect,
    }


def main():
    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"
    spark = get_spark("stress-scale")
    spark.sparkContext.setLogLevel("ERROR")
    if quick:
        a = stress_tiled_embedding_dedup(spark, n=250_000)
        b = stress_incremental_minhash(spark, corpus_n=5_000, batch_n=1_000)
        c = stress_gram_covariance(spark, n=100_000)
        d = stress_bfs_frontier(spark, n=500_000, hops=8)
    else:
        a = stress_tiled_embedding_dedup(spark)
        b = stress_incremental_minhash(spark)
        c = stress_gram_covariance(spark)
        d = stress_bfs_frontier(spark)
    print(json.dumps(a))
    print(json.dumps(b))
    print(json.dumps(c))
    print(json.dumps(d))
    if not (a["ok"] and b["ok"] and c["ok"] and d["ok"]):
        sys.exit(1)


if __name__ == "__main__":
    main()
