#!/usr/bin/env python
"""Runnable example: link-graph curation signals end to end.

    python examples/graph_analytics.py [sf_dir]

documents (+ synthesized out-links, the q_url_curation approach) →
PageRank quality prior → label-propagation communities over the
co-purchase graph → hop-bounded BFS proximity to the top-ranked seeds →
one joined per-document curation score. This is the graph surface a
web-corpus pipeline runs before sampling training data: rank pages,
find content farms (dense low-quality communities), and grade
everything else by link distance to a vetted whitelist.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F

from etl_demos_spark.operators import cooccur
from etl_demos_spark.operators.graph import (
    bfs_distances,
    label_propagation,
    pagerank,
)
from etl_demos_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("graph-analytics")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    n = docs.count()

    # 1. synthesize a deterministic 3-out-link graph (testdata carries
    #    no hyperlinks) — md5-derived targets, the q_url_curation idiom
    links = []
    for j in range(3):
        dst = (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"e{j}:"), F.col("doc_id").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % n
        )
        links.append(docs.select(F.col("doc_id").alias("src"), dst.alias("dst")))
    edges = (
        links[0]
        .unionByName(links[1])
        .unionByName(links[2])
        .filter(F.col("src") != F.col("dst"))
    )

    # 2. PageRank: the link-quality prior (8 damped rounds, exact-int
    #    quantized — bit-stable on any partitioning)
    ranks = pagerank(edges, iters=8)
    top = ranks.orderBy(F.desc("rank"), "node").limit(5)
    print("top-5 by pagerank:")
    top.show(truncate=False)

    # 3. communities over the co-purchase graph (support >= 2) — dense
    #    clusters of items bought together; in a web corpus the same
    #    pass over the link graph surfaces content farms
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pairs = cooccur.basket_pairs(
        li, "l_orderkey", "l_partkey", max_basket=64, min_support=2
    ).select(F.col("item_a").alias("a"), F.col("item_b").alias("b"))
    communities = label_propagation(pairs, iters=3, src="a", dst="b")
    sizes = (
        communities.groupBy("community")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .orderBy(F.desc("n_members"), "community")
    )
    print("largest co-purchase communities:")
    sizes.show(5, truncate=False)

    # 4. hop-bounded BFS from the top-ranked docs: the 'within-k-hops
    #    of a trusted seed set' proximity prior
    seeds = top.select("node")
    dist = bfs_distances(edges, seeds, iters=3, src="src", dst="dst")
    print("reach from top-5 seeds (3 hops):")
    dist.groupBy("dist").agg(F.count(F.lit(1)).alias("n_docs")).orderBy(
        "dist"
    ).show(truncate=False)

    # 5. the joined curation score every downstream sampler consumes:
    #    rank + proximity (unreached docs get the flat worst prior)
    scored = (
        ranks.join(dist, "node", "left")
        .select(
            F.col("node").alias("doc_id"),
            "rank",
            F.coalesce("dist", F.lit(99)).alias("seed_hops"),
        )
        .orderBy(F.desc("rank"))
    )
    n_scored = scored.count()
    print(f"scored {n_scored} documents")
    return 0 if n_scored == n else 1


if __name__ == "__main__":
    raise SystemExit(main())
