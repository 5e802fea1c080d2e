"""Cross-snapshot document versioning — CDC chunk diffs between crawls.

A recrawled corpus holds multiple snapshots of each document; training
pipelines need to know WHAT changed between them — untouched pages can
skip reprocessing, lightly-edited pages should not re-enter the corpus
as "new" text, rewrites should. Whole-document fingerprints only answer
changed-or-not; diffing at CDC chunk granularity (the
resync-after-insertion property of operators/dedup.py:cdc_chunks)
additionally measures HOW MUCH changed: a one-line edit disturbs only
the chunks containing it, every other chunk fingerprint still matches,
so the retained-token fraction is a direct, tokenizer-level estimate of
content reuse between versions.

Scale shape: two cdc_chunks passes (one per snapshot — each a codegen
scan + per-doc window + keyed groupBy), one (id, fp)-keyed full outer
join for the chunk-multiset intersection, one per-id rollup. All keys
uniform (ids, md5 fps); output is one row per document id, never per
chunk pair. Nothing quadratic, nothing driver-side.

No analogue in the reference repo (rytakahas/etl-demos) — part of the
LLM-training-data extension surface.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from etl_demos_spark.operators.dedup import cdc_chunks


def _chunk_multiset(
    df: DataFrame, id_col: str, text_col: str, w: int, mask: int
) -> DataFrame:
    """Per-(id, chunk_fp) multiplicity: (id, chunk_fp, n, tok).
    Equal fp ⇒ equal chunk text ⇒ equal token count, so min() is exact."""
    return (
        cdc_chunks(df, id_col, text_col, w, mask)
        .groupBy("id", "chunk_fp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("chunk_tokens").cast("long").alias("tok"),
        )
    )


def snapshot_chunk_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = 3,
    mask: int = 16,
) -> DataFrame:
    """Per-document version diff between two snapshots of a corpus.

    Chunks are compared as MULTISETS of CDC fingerprints per document:
    ``common_chunks`` = Σ min(copies_old, copies_new) per fingerprint,
    token-weighted twins for the token columns. ``change_ratio`` is
    the token-weighted Dice distance
    ``1 − 2·common_tokens/(old_tokens + new_tokens)`` — 0.0 for
    identical content, 1.0 for disjoint (and for pure adds/deletes);
    both-sides-empty documents score 0.0. ``status`` classifies:
    ``added`` (id only in ``new``), ``deleted`` (only in ``old``),
    ``unchanged`` (present in both, change_ratio = 0), ``modified``.
    Multiset semantics mean a pure reordering of whole chunks scores
    as unchanged — the chunk-dedup convention; order-sensitive
    pipelines should compare (chunk_idx, fp) streams instead.

    Presence comes from the snapshot frames themselves (an empty-text
    document still EXISTS), token totals from the chunk sums (zero
    for chunkless docs). NULL-id rows are dropped per the cdc_chunks
    contract.

    Output: one row per document id —
    ``(id, status, old_chunks, new_chunks, common_chunks, old_tokens,
    new_tokens, common_tokens, change_ratio)``."""
    oc = _chunk_multiset(old, id_col, text_col, w, mask)
    nc = _chunk_multiset(new, id_col, text_col, w, mask)
    j = oc.select("id", "chunk_fp", F.col("n").alias("n_o"), "tok").join(
        nc.select("id", "chunk_fp", F.col("n").alias("n_n"), "tok"),
        ["id", "chunk_fp", "tok"],
        "full_outer",
    )
    per_id = j.groupBy("id").agg(
        F.sum(F.coalesce("n_o", F.lit(0))).cast("long").alias("old_chunks"),
        F.sum(F.coalesce("n_n", F.lit(0))).cast("long").alias("new_chunks"),
        F.sum(F.least(F.coalesce("n_o", F.lit(0)), F.coalesce("n_n", F.lit(0))))
        .cast("long")
        .alias("common_chunks"),
        F.sum(F.coalesce("n_o", F.lit(0)) * F.col("tok"))
        .cast("long")
        .alias("old_tokens"),
        F.sum(F.coalesce("n_n", F.lit(0)) * F.col("tok"))
        .cast("long")
        .alias("new_tokens"),
        F.sum(
            F.least(F.coalesce("n_o", F.lit(0)), F.coalesce("n_n", F.lit(0)))
            * F.col("tok")
        )
        .cast("long")
        .alias("common_tokens"),
    )
    base = (
        old.filter(F.col(id_col).isNotNull())
        .select(F.col(id_col).alias("id"), F.lit(1).alias("__in_old"))
        .join(
            new.filter(F.col(id_col).isNotNull()).select(
                F.col(id_col).alias("id"), F.lit(1).alias("__in_new")
            ),
            "id",
            "full_outer",
        )
    )
    d = base.join(per_id, "id", "left")
    z = lambda c: F.coalesce(c, F.lit(0)).cast("long")  # noqa: E731
    tot = z("old_tokens") + z("new_tokens")
    change = F.when(tot > 0, F.round(1.0 - 2.0 * z("common_tokens") / tot, 4)).otherwise(
        F.lit(0.0)
    )
    return d.select(
        "id",
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("deleted"))
        .when(change == 0.0, F.lit("unchanged"))
        .otherwise(F.lit("modified"))
        .alias("status"),
        z("old_chunks").alias("old_chunks"),
        z("new_chunks").alias("new_chunks"),
        z("common_chunks").alias("common_chunks"),
        z("old_tokens").alias("old_tokens"),
        z("new_tokens").alias("new_tokens"),
        z("common_tokens").alias("common_tokens"),
        change.alias("change_ratio"),
    )


def churn_rollup(
    diff: DataFrame,
    dims: DataFrame | None = None,
    dim_col: str = "source",
    dims_id_col: str = "id",
) -> DataFrame:
    """Corpus-level churn report over :func:`snapshot_chunk_diff`
    output, optionally grouped by a dimension joined on id (e.g. the
    host). Token accounting: ``tokens_added`` = new-side tokens with no
    old twin, ``tokens_removed`` = old-side tokens with no new twin,
    ``tokens_retained`` = the common multiset — added + retained =
    new_tokens and removed + retained = old_tokens, per group.

    ``dims`` must carry its document id in ``dims_id_col`` (default
    ``"id"``, matching snapshot_chunk_diff's output) — named, never
    positional: renaming whatever column happens to be first silently
    renames a DIMENSION to the join key when a caller passes e.g.
    (source, doc_id), producing an empty join instead of an error
    (ADVICE r9).

    Output: ``([dim,] status, n_docs, tokens_added, tokens_removed,
    tokens_retained)``."""
    d = diff
    keys = ["status"]
    if dims is not None:
        if dims_id_col not in dims.columns:
            raise ValueError(
                f"churn_rollup: dims has no id column {dims_id_col!r} "
                f"(columns: {dims.columns}); pass dims_id_col="
            )
        if dim_col not in dims.columns:
            raise ValueError(
                f"churn_rollup: dims has no dimension column {dim_col!r} "
                f"(columns: {dims.columns}); pass dim_col="
            )
        d = d.join(
            dims.select(F.col(dims_id_col).alias("id"), dim_col), "id", "left"
        )
        keys = [dim_col, "status"]
    return d.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.col("new_tokens") - F.col("common_tokens"))
        .cast("long")
        .alias("tokens_added"),
        F.sum(F.col("old_tokens") - F.col("common_tokens"))
        .cast("long")
        .alias("tokens_removed"),
        F.sum("common_tokens").cast("long").alias("tokens_retained"),
    )
