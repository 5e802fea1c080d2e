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


_A_TEXTS = [
    "alpha beta gamma delta epsilon zeta",
    "beta gamma alpha zeta delta eta",
    "gamma delta eta alpha epsilon beta",
    "delta epsilon beta eta zeta alpha",
]
_B_TEXTS = [
    "omega sigma tau rho kappa lambda",
    "sigma tau omega lambda rho mu",
    "tau rho mu omega kappa sigma",
    "rho kappa sigma mu lambda omega",
    "kappa lambda omega tau mu rho",
    "lambda mu rho sigma omega tau",
    "mu omega kappa lambda tau sigma",
    "omega tau lambda kappa sigma rho",
]


def _cycle_text(col, texts):
    return F.element_at(
        F.array(*[F.lit(t) for t in texts]), (col % len(texts) + 1).cast("int")
    )


def stress_dsir_select(spark, n=1_000_000, n_target=2_000, plant_every=1_000):
    """Scenario E1 — DSIR data selection at 1M docs, exact-membership
    asserted. Planted construction: target docs (ids < n_target) and
    planted raw docs (id % plant_every == 7) draw from vocabulary A;
    everything else from disjoint vocabulary B. The importance margin
    between an A-doc and a B-doc is ~150 nats — far beyond the Gumbel
    key's worst-case spread over 1M draws (≈ 40 nats with the 52-bit
    md5 uniform) — so the EXACT selected id set is forced: all A-docs,
    nothing else. This also stress-proves the post-round-4 top-k shape:
    the TakeOrdered pre-prune ranks k rows instead of funneling all 1M
    (id, score, key) rows through one partition."""
    from etl_demos_spark.operators.dsir import dsir_select

    is_a = (F.col("id") < n_target) | (F.col("id") % plant_every == 7)
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(is_a, _cycle_text(F.col("id"), _A_TEXTS))
        .otherwise(_cycle_text(F.col("id"), _B_TEXTS))
        .alias("text"),
    )
    target = spark.range(n_target).select(F.col("id").alias("doc_id"))
    n_planted = len([i for i in range(n_target, n) if i % plant_every == 7])
    k = n_target + n_planted
    t0 = time.time()
    sel = dsir_select(docs, target, k=k).select("doc_id", "rn").collect()
    wall = time.time() - t0
    got = {r["doc_id"] for r in sel}
    want = set(range(n_target)) | {
        i for i in range(n_target, n) if i % plant_every == 7
    }
    ranks_ok = sorted(r["rn"] for r in sel) == list(range(1, k + 1))
    return {
        "scenario": "dsir_select_1M",
        "n_docs": n,
        "k": k,
        "wall_s": round(wall, 2),
        "selected": len(got),
        "membership_exact": got == want,
        "ranks_contiguous": ranks_ok,
        # widest intermediate: the exploded gram table (≈ 11 grams/doc)
        "widest_rows": n * 11,
        "ok": got == want and ranks_ok,
    }


def stress_train_classifier(spark, n=1_000_000, n_buckets=1024, lr=0.5,
                            iters=3):
    """Scenario E2 — logistic-regression training at 1M labeled docs,
    EXACT weights asserted. The corpus is 40 distinct texts (20 per
    class, disjoint vocabularies) replicated 25k× each; because the
    per-doc residual depends only on the doc's features, a sequential
    Python reference over the 40 distinct docs with multiplicity
    weighting reproduces the distributed gradient EXACTLY (the integer
    discipline makes the sum order-independent), so all trained
    nano-weights are asserted bit-identical — the scenarios-A-D
    standard, not a loss-goes-down smoke check."""
    import math
    from decimal import ROUND_HALF_UP, Decimal
    import hashlib

    from etl_demos_spark.operators import classifier as clf

    # the sequential reference weights every distinct text's gradient by
    # the UNIFORM multiplicity n // 40 — with n % 40 != 0 the cycle gives
    # some texts one extra copy and the reference silently diverges,
    # misreporting a harness artifact as an engine determinism bug
    assert n % 40 == 0, f"n must be a multiple of 40 (got {n})"
    texts = []  # 40 distinct docs: 20 class-A, 20 class-B, disjoint vocab
    for v in range(20):
        texts.append(_A_TEXTS[v % len(_A_TEXTS)] + f" mark{v}")
    for v in range(20):
        texts.append(_B_TEXTS[v % len(_B_TEXTS)] + f" mark{20 + v}")
    mult = n // 40
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        _cycle_text(F.col("id"), texts).alias("text"),
    )
    labels = spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 40 < 20).cast("long").alias("y"),
    )
    feats = clf.hashed_features(docs, "text", "doc_id", n_buckets)
    t0 = time.time()
    w_got = {
        r["bucket"]: r["w_int"]
        for r in clf.train_logreg(
            feats, labels, n_buckets=n_buckets, lr=lr, iters=iters
        ).collect()
    }
    wall = time.time() - t0

    # -- sequential reference over the 40 distinct docs, multiplicity-
    # weighted (mult identical copies of each → weight the gradient)
    def md5_long(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def round0(x):
        return int(Decimal(repr(x)).quantize(Decimal(1), rounding=ROUND_HALF_UP))

    dfeats: dict[tuple[int, int], int] = {}
    for v, text in enumerate(texts):
        for tok in text.lower().split():
            b = md5_long(tok) % n_buckets
            dfeats[(v, b)] = dfeats.get((v, b), 0) + 1
    for v in range(40):
        dfeats[(v, -1)] = 1  # bias
    y = {v: (1.0 if v < 20 else 0.0) for v in range(40)}
    w_ref: dict[int, int] = {}
    for _ in range(iters):
        margins = {v: 0 for v in range(40)}
        for (v, b), cnt in dfeats.items():
            margins[v] += cnt * w_ref.get(b, 0)
        r_int = {}
        for v in range(40):
            p = 1.0 / (1.0 + math.exp(-(margins[v] / 1.0e9)))
            r_int[v] = round0((p - y[v]) * 1.0e9)
        grad: dict[int, int] = {}
        for (v, b), cnt in dfeats.items():
            grad[b] = grad.get(b, 0) + mult * cnt * r_int[v]
        for b, g_int in grad.items():
            cur = w_ref.get(b, 0) / 1.0e9
            upd = cur - lr * ((g_int / 1.0e9) / n)
            w_ref[b] = int(round(upd * 1.0e9))
    w_ref = {b: v for b, v in w_ref.items() if v != 0 or b in w_got}
    return {
        "scenario": "train_classifier_1M",
        "n_docs": n,
        "iters": iters,
        "wall_s": round(wall, 2),
        "n_weights": len(w_got),
        "weights_bit_identical": w_got == w_ref,
        # widest intermediate: the per-doc feature rows (≈ 7 buckets/doc)
        "widest_rows": n * 7,
        "ok": w_got == w_ref,
    }


def stress_multimodal_decode(spark, n=1_000_000):
    """Scenario F — the Arrow decode path at 1M images (VERDICT r5
    rec 7): every image is a REAL netpbm file generated by JVM
    expressions (never a driver loop), pushed through
    extract_image_meta (header decode) AND image_channel_stats (full
    raster decode + per-channel moments), with EXACT planted statistics
    asserted distributedly — the scenarios-A-E standard.

    Construction: image i is w×8 (w = 4 + i%13), grayscale (P5) for
    even i / RGB (P6) for odd, raster = first half pixels value
    a = 40 + i%60, second half b = 100 + i%28. Every value ≤ 127 so the
    UTF-8 encode of the generator string is byte-identity, and each
    channel sees exactly w·4 a's and w·4 b's, making the planted truth
    closed-form AND IEEE-exact: mean = (a+b)/2 (integer sum, power-of-2
    divide), std = sqrt((a²+b²)/2 − mean²) = (b−a)/2 (a representable
    half-integer whose square is exact, so correctly-rounded sqrt
    returns it bit-for-bit). Mismatch counts are computed in Spark —
    the driver never collects a row per image."""
    imgs = spark.range(n).selectExpr(
        "id",
        """encode(concat(
             case when id % 2 = 0 then 'P5' else 'P6' end, char(10),
             cast(cast(4 + id % 13 as int) as string), ' 8', char(10),
             '255', char(10),
             repeat(char(40 + id % 60),
                    cast((4 + id % 13) * 4
                         * (case when id % 2 = 0 then 1 else 3 end) as int)),
             repeat(char(100 + id % 28),
                    cast((4 + id % 13) * 4
                         * (case when id % 2 = 0 then 1 else 3 end) as int))
           ), 'UTF-8') as content""",
    )

    from etl_demos_spark.operators import multimodal

    t0 = time.time()
    meta = multimodal.extract_image_meta(imgs)
    meta_bad = (
        meta.filter(
            (F.col("width") != 4 + F.col("id") % 13)
            | (F.col("height") != 8)
            | (
                F.col("mode")
                != F.when(F.col("id") % 2 == 0, "L").otherwise("RGB")
            )
        ).count()
    )
    n_meta = meta.count()

    feats = multimodal.image_channel_stats(imgs)
    per_ch = feats.select(
        "id",
        F.explode(F.arrays_zip("ch_mean", "ch_std")).alias("z"),
    ).select(
        "id",
        F.col("z.ch_mean").alias("m"),
        F.col("z.ch_std").alias("s"),
    )
    a = (40 + F.col("id") % 60).cast("double")
    b = (100 + F.col("id") % 28).cast("double")
    stats_bad = per_ch.filter(
        (F.col("m") != (a + b) / F.lit(2.0)) | (F.col("s") != (b - a) / F.lit(2.0))
    ).count()
    n_ch = per_ch.count()
    wall = time.time() - t0

    # channels per id-pair: 1 (even, L) + 3 (odd, RGB) = 4 → 2n for even n
    exp_ch = 2 * n if n % 2 == 0 else 2 * n - 1
    ok = meta_bad == 0 and stats_bad == 0 and n_meta == n and n_ch == exp_ch
    return {
        "scenario": "multimodal_decode_1M",
        "n_images": n,
        "wall_s": round(wall, 2),
        "meta_rows": n_meta,
        "meta_mismatches": meta_bad,
        "channel_rows": n_ch,
        "stat_mismatches": stats_bad,
        # widest intermediate: the raw payload bytes flowing through the
        # Arrow batches — header (~10 B) + raster (≤ 16·8·3 B) per image
        "widest_bytes_est": n * (10 + 16 * 8 * 3),
        "ok": ok,
    }


def main():
    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"
    spark = get_spark("stress-scale")
    spark.sparkContext.setLogLevel("ERROR")
    if quick:
        results = [
            stress_tiled_embedding_dedup(spark, n=250_000),
            stress_incremental_minhash(spark, corpus_n=5_000, batch_n=1_000),
            stress_gram_covariance(spark, n=100_000),
            stress_bfs_frontier(spark, n=500_000, hops=8),
            stress_dsir_select(spark, n=100_000, n_target=500),
            stress_train_classifier(spark, n=100_000),
            stress_multimodal_decode(spark, n=100_000),
        ]
    else:
        results = [
            stress_tiled_embedding_dedup(spark),
            stress_incremental_minhash(spark),
            stress_gram_covariance(spark),
            stress_bfs_frontier(spark),
            stress_dsir_select(spark),
            stress_train_classifier(spark),
            stress_multimodal_decode(spark),
        ]
    for r in results:
        print(json.dumps(r))
    if not all(r["ok"] for r in results):
        sys.exit(1)


if __name__ == "__main__":
    main()
