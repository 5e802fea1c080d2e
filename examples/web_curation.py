#!/usr/bin/env python
"""Runnable example: web-corpus curation and search end to end.

    python examples/web_curation.py [sf_dir]

documents (+ synthesized crawl URLs) → URL canonicalization → domain
rollup caps → LM quality tiers → BM25 search over the survivors →
mergeable distinct-visitor sketches → deterministic shard export.
Exercises the curation/search surface the way a crawl pipeline would.
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F

from etl_demos_spark.functions import urls as U
from etl_demos_spark.operators import search, sketches, text, trainprep
from etl_demos_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("web-curation")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # 1. synthesize crawl URLs (testdata has none) and canonicalize —
    #    campaign-link variants of one page must collapse before dedup
    crawled = docs.withColumn(
        "url",
        F.concat(
            F.lit("https://www.site-"),
            F.col("source"),
            F.lit(".com/p/"),
            F.col("doc_id").cast("string"),
            F.lit("?utm_campaign=x&ref=rss"),
        ),
    ).withColumn("url", U.canonical_url("url")).withColumn(
        "domain", U.registered_domain("url")
    )

    # 2. per-domain caps (crawl etiquette / anti-SEO-farm): keep at most
    #    cap docs per domain, best LM quality first
    model = text.bigram_lm_model(crawled, "text")
    scored = text.lm_score_documents(crawled, model, "doc_id", "text")
    tiers = text.lm_quality_buckets(scored, exact=False)
    ranked = crawled.join(tiers.select("doc_id", "avg_logp", "lm_bucket"), "doc_id")
    from pyspark.sql import Window

    w = Window.partitionBy("domain").orderBy(F.desc("avg_logp"), F.asc("doc_id"))
    capped = ranked.withColumn("__r", F.row_number().over(w)).filter(
        F.col("__r") <= 200
    ).drop("__r")
    print(f"docs: {docs.count()} → domain-capped, quality-ranked: {capped.count()}")

    # 3. BM25 search over the curated corpus
    idx = search.build_term_index(capped, "doc_id", "text")
    lens = search.doc_lengths(capped, "doc_id", "text")
    print("top hits for {join, fast, table}:")
    search.bm25_search(idx, lens, ["join", "fast", "table"], k=5).orderBy(
        "rank"
    ).show()

    # 4. distinct-doc sketches per (domain, lang): stored partials that
    #    answer any later rollup by sketch union, no raw re-scan
    partials = sketches.distinct_sketches(capped, ("domain", "lang"), "doc_id")
    by_domain = sketches.merge_sketch_rollup(partials, ("domain",))
    print("per-domain approx distinct docs (from merged partials):")
    by_domain.orderBy(F.desc("rows_in")).show(5)

    # 5. deterministic shard export in training order
    with tempfile.TemporaryDirectory() as tmp:
        trainprep.write_training_shards(
            capped.select("doc_id", "text"), f"{tmp}/shards", 4, seed="epoch0"
        )
        n = spark.read.parquet(f"{tmp}/shards").count()
        print(f"exported {n} docs into 4 rank-contiguous shards")
    return 0


if __name__ == "__main__":
    sys.exit(main())
