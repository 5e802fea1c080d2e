#!/usr/bin/env python
"""Runnable example: the training-data cleaning pipeline end to end.

    python examples/corpus_cleaning.py [sf_dir]

documents → quality filter → exact dedup → MinHash near-dup clustering →
canonical selection → PII redaction → eval-set decontamination →
sequence packing → deterministic shuffle → per-language corpus stats.
This is the LLM-data path the engine's extension operators exist for.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F

from etl_demos_spark.operators import dedup, text
from etl_demos_spark.operators.embedding_dedup import connected_components
from etl_demos_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("corpus-cleaning")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()

    # 0. host-level curation FIRST (the C4/RefinedWeb cut order): roll
    #    CDC chunk fingerprints up per host and drop hosts whose
    #    cross-host boilerplate ratio crosses the threshold — cheaper
    #    than doc-level cleaning and removes whole template farms the
    #    per-doc passes would fight one page at a time. drop_ratio is
    #    set aggressively here so the stage visibly fires on the
    #    synthetic corpus; production would start nearer the 0.30
    #    default. The surviving-host filter broadcasts (|hosts| rows).
    from etl_demos_spark.operators.domains import host_dedup_rollup

    roll = host_dedup_rollup(docs, "source", "doc_id", "text", drop_ratio=0.15)
    bad_hosts = roll.filter(F.col("verdict") == "drop").select(
        F.col("host").alias("source")
    )
    docs = docs.join(F.broadcast(bad_hosts), "source", "left_anti")
    n0b = docs.count()

    # 1. quality gate
    profiled = docs.withColumn("quality", text.quality_score("text"))
    kept = profiled.filter(F.col("quality") >= 0.5)
    n1 = kept.count()

    # 1b. LM quality tiers (the CCNet recipe): train a bigram LM on the
    #     surviving corpus, score every doc, drop the tail tier. Uses the
    #     approx-percentile bucketing — the no-global-sort scale path.
    model = text.bigram_lm_model(kept, "text")
    scored = text.lm_score_documents(kept, model, "doc_id", "text")
    tiers = text.lm_quality_buckets(scored, exact=False)
    tail = tiers.filter(F.col("lm_bucket") == 1).select("doc_id")
    kept = kept.join(tail, "doc_id", "left_anti")
    n1b = kept.count()

    # 2. exact dedup (normalized fingerprint, min-id canonical)
    exact = dedup.exact_dedup(kept, "text", "doc_id")
    n2 = exact.count()

    # 3. near-dup clustering: MinHash-LSH pairs → connected components →
    #    keep the min-id doc per cluster
    pairs = dedup.minhash_lsh_pairs(exact, "doc_id", "text", threshold=0.6)
    comps = connected_components(pairs)
    losers = comps.filter(F.col("node") != F.col("comp")).select(
        F.col("node").alias("doc_id")
    )
    clean = exact.join(losers, "doc_id", "left_anti")
    n3 = clean.count()

    # 4. PII scrubbing (typed placeholders, all JVM regexp_replace).
    #    MUST run before the CDC rebuild below: the rebuild re-joins the
    #    lowercased [A-Za-z0-9]+ token stream, which destroys the '@',
    #    '://' and '-' separators every PII pattern needs — redacting
    #    first means the placeholders (EMAIL etc.) survive tokenization
    #    as ordinary tokens and no raw PII reaches the packed output.
    clean = clean.withColumn("text", text.redact_pii("text"))

    # 4b. sub-document dedup: content-defined chunking cuts duplicated
    #     boilerplate (headers, license stamps) that floats inside
    #     otherwise-unique documents — whole-doc dedup can't see it.
    #     Keep-first: the earliest copy of every chunk survives. The
    #     rebuilt text is the normalized token stream (casing and
    #     punctuation are gone), so ONLY documents that actually lost a
    #     chunk are rewritten — everything else keeps its original
    #     text. localCheckpoint: the CDC plan feeds both the audit
    #     collect and the join; without it Spark computes it twice.
    cdc = dedup.remove_duplicated_cdc_chunks(clean, "doc_id", "text").localCheckpoint()
    cut = cdc.agg(F.sum("removed_tokens")).collect()[0][0] or 0
    rebuilt = cdc.filter(F.col("removed_tokens") > 0).select(
        F.col("id").alias("doc_id"), F.col("clean_text").alias("cdc_text")
    )
    clean = (
        clean.join(rebuilt, "doc_id", "left")
        .withColumn("text", F.coalesce("cdc_text", "text"))
        .drop("cdc_text")
    )

    # 5. decontamination against a held-out eval set (hash-bucket 20%
    #    stands in for the benchmark suite here). n=8: short grams
    #    over-trigger on boilerplate — the standard rule is 8-13-gram
    #    overlap, long enough that a collision means real leakage.
    from etl_demos_spark.operators.sampling import hash_bucket
    from etl_demos_spark.operators import trainprep

    b = hash_bucket(F.col("doc_id"), 10)
    train, evalset = clean.filter(b < 8), clean.filter(b >= 8)
    train = trainprep.decontaminate(train, evalset, n=8)
    n4 = train.count()

    print(
        f"documents: {n0} → host curation: {n0b} "
        f"→ quality≥0.5: {n1} → LM head+middle: {n1b} "
        f"→ exact-dedup: {n2} → near-dedup: {n3} "
        f"(chunk-dedup cut {cut} boilerplate tokens) "
        f"→ decontaminated train: {n4}"
    )

    # 6. pack into ~512-token sequences and fix the training order
    packed = trainprep.pack_sequences(
        train.withColumn("n_tokens", text.token_count("text")),
        "doc_id", "n_tokens", target=512, n_buckets=8,
    )
    order = trainprep.deterministic_shuffle(packed, "doc_id", seed="epoch0")
    n_seqs = order.select("bucket", "seq_id").distinct().count()
    print(f"packed into {n_seqs} training sequences (≈512 tokens each)")

    print("\nPer-language corpus stats after cleaning:")
    train.withColumn("n_tokens", text.token_count("text")).groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.avg("n_tokens"), 1).alias("avg_tokens"),
    ).orderBy(F.desc("n_docs")).show()
    return 0


if __name__ == "__main__":
    sys.exit(main())
