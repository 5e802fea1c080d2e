"""Record linkage: fuzzy (similarity) join between two sources.

The entity-resolution shape: two feeds describe overlapping entities
with textual drift; link records whose n-gram sets agree above a
Jaccard threshold. Classic ETL/master-data operator the reference's
warehouse would need the day two customer feeds arrive.

Plan shape (the scalable formulation):
- each side explodes to DISTINCT (id, gram) postings via the codegen'd
  slice/zip shingle path (operators/dedup.py — no interpreted lambdas);
- ONE equi-join on the gram (plus any blocking columns) generates
  candidates — work ∝ Σ shared-gram postings, never |L|×|R|;
- shared counts aggregate per pair; set sizes broadcast-join back;
  Jaccard = s / (n_a + n_b − s) filters.

All integer counts → the ratio is a single deterministic IEEE divide,
so the operator is oracle-twinnable bit-for-bit. Frequent-gram blocking
(drop grams with document frequency > max_df before the candidate join)
bounds the worst-case fan-out on boilerplate grams; it is OFF by
default because it makes the result approximate (pairs sharing only
frequent grams are missed) — the same trade documented for
dedup.jaccard_pairs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from etl_demos_spark.operators.dedup import exploded_shingles

__all__ = ["fuzzy_join"]


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    id_col: str,
    text_col: str = "text",
    threshold: float = 0.5,
    n: int = 3,
    block_cols: tuple[str, ...] = (),
    max_df: int | None = None,
) -> DataFrame:
    """(id_a, id_b, jaccard) — pairs across the two inputs whose distinct
    word n-gram sets have Jaccard ≥ threshold; ``block_cols`` must match
    exactly (they ride the gram join as extra equi-keys)."""
    # persist the shingle tables: each feeds 2 consumers in the plain
    # branch (per-id counts + candidate join) and 4 in the max_df branch
    # (counts, pruned candidate join, document-frequency union, full-gram
    # rejoin) — without this Spark re-tokenizes and re-shingles both
    # corpora once per consumer, and shingling is the dominant cost of
    # the family. Eviction left to the LRU (the dedup.py convention); at
    # corpus scale checkpoint to parquet instead.
    gl = exploded_shingles(left, id_col, text_col, n, extra=block_cols).distinct().persist()
    gr = exploded_shingles(right, id_col, text_col, n, extra=block_cols).distinct().persist()
    na = gl.groupBy("id").agg(F.count(F.lit(1)).alias("n_a"))
    nb = gr.groupBy("id").agg(F.count(F.lit(1)).alias("n_b"))
    a = gl.select(F.col("id").alias("id_a"), *block_cols, "g")
    b = gr.select(
        F.col("id").alias("id_b"),
        *[F.col(c).alias(f"_b_{c}") for c in block_cols],
        "g",
    )
    cond = [a["g"] == b["g"]] + [a[c] == b[f"_b_{c}"] for c in block_cols]
    if max_df is None:
        shared = (
            a.join(b, cond).groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("s"))
        )
    else:
        # blocking generates CANDIDATES only (bounding fan-out on
        # boilerplate grams); shared counts then run over the FULL gram
        # sets of the candidate pairs, so scores stay exact — only pairs
        # sharing no rare gram are missed.
        df_t = (
            gl.select("g").unionByName(gr.select("g"))
            .groupBy("g")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= max_df)
            .select("g")
        )
        a_r = a.join(df_t, "g")
        b_r = b.join(df_t, "g")
        cand = a_r.join(b_r, cond).select("id_a", "id_b").distinct()
        with_ga = cand.join(
            gl.select(F.col("id").alias("id_a"), F.col("g").alias("_ga")), "id_a"
        )
        grb = gr.select(F.col("id").alias("_idb"), F.col("g").alias("_gb"))
        shared = (
            with_ga.join(
                grb,
                (F.col("id_b") == grb["_idb"]) & (F.col("_ga") == grb["_gb"]),
            )
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("s"))
        )
    jac = F.col("s").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("s")
    )
    return (
        shared.join(na.withColumnRenamed("id", "id_a"), "id_a")
        .join(nb.withColumnRenamed("id", "id_b"), "id_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
