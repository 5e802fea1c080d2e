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
    # The shingle tables feed 2 consumers in the plain branch and 4 in
    # the max_df branch, so recompute-per-consumer looks wasteful — but
    # DON'T persist them: the exploded (id, gram) table is LARGER than
    # the corpus text, and caching it costs more than the codegen'd
    # scan→tokenize→shingle recompute. Measured (process-level A/B/A/B,
    # fresh JVM per arm, median-of-3 at sf0.1): persist 5.2-5.5 s vs
    # recompute 2.7-2.9 s — persist DOUBLES the operator. At genuine
    # corpus scale, where 4 full scans dominate instead, write the
    # shingle table to parquet once per side and read it back (a
    # storage-backed materialization, not executor-cache pressure).
    gl = exploded_shingles(left, id_col, text_col, n, extra=block_cols).distinct()
    gr = exploded_shingles(right, id_col, text_col, n, extra=block_cols).distinct()
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
