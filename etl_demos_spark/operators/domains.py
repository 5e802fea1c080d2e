"""Host/domain-level dedup rollups — curation decisions per HOST.

Web-corpus cleaning recipes (C4, RefinedWeb, Dolma — all public) make
their biggest cuts at host granularity, not per document: a template
farm, a mirror, or a boilerplate-heavy domain is dropped wholesale once
its *aggregate* duplication profile crosses a threshold. These
operators produce that profile by rolling the CDC chunk fingerprints of
:mod:`etl_demos_spark.operators.dedup` up to the host level, so the
same sub-document granularity that powers chunk dedup also drives
domain curation — one fingerprint definition, two decision layers.

Scale shape: everything is keyed groupBys / equi-joins on uniform md5
fingerprints or host keys — no all-pairs stage anywhere. The one
quadratic risk (a chunk shared by H hosts fans into H² mirror pairs)
reuses :func:`etl_demos_spark.operators.cooccur.basket_pairs`, whose
``max_basket`` cap bounds the fan-out; run
:func:`etl_demos_spark.operators.cooccur.dropped_baskets` on the same
frame for the no-silent-caps audit of what the cap excluded.

No analogue in the reference repo (rytakahas/etl-demos) — this is part
of the LLM-training-data extension surface.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from etl_demos_spark.operators.cooccur import basket_pairs
from etl_demos_spark.operators.dedup import cdc_chunks


def host_chunk_stats(
    df: DataFrame,
    host_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = 3,
    mask: int = 16,
) -> DataFrame:
    """Per-(host, chunk-fingerprint) multiplicity: ``(host, chunk_fp,
    n_copies, chunk_tokens)``. The shared base of the rollup and the
    mirror detector — CDC chunks (disjoint, content-defined; see
    cdc_chunks for the resync property) joined back to their host and
    aggregated once. Chunk fp is md5 of the chunk text, so equal fp ⇒
    equal text ⇒ equal token count; min() below is exact, not a guess.

    Two keyed shuffles beyond cdc_chunks' own: the id-keyed host join
    and the (host, fp) groupBy — both uniform keys."""
    hosts = df.select(
        F.col(id_col).alias("id"), F.col(host_col).alias("host")
    )
    chunks = cdc_chunks(df, id_col, text_col, w, mask)
    return (
        chunks.join(hosts, "id")
        .groupBy("host", "chunk_fp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_copies"),
            F.min("chunk_tokens").cast("long").alias("chunk_tokens"),
        )
    )


def host_dedup_rollup(
    df: DataFrame,
    host_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = 3,
    mask: int = 16,
    review_ratio: float = 0.10,
    drop_ratio: float = 0.30,
) -> DataFrame:
    """Host-level duplication profile with a curation verdict.

    Per host: document and chunk volumes, WITHIN-host redundancy
    (extra copies of a fingerprint on the same host — template pages),
    CROSS-host sharing (fingerprints that also appear on another host
    — syndication/boilerplate/mirrors), both in chunk and token units,
    and a ``verdict`` banding on the cross-host token ratio:
    ``keep`` < ``review_ratio`` ≤ ``review`` < ``drop_ratio`` ≤
    ``drop``. Thresholds are explicit parameters, not policy baked in.

    Output: ``(host, n_docs, n_chunks, n_unique_fp, intra_dup_chunks,
    intra_dup_tokens, shared_fps, shared_tokens, total_tokens,
    intra_ratio, shared_ratio, verdict)``; ratios are NULL for a host
    with zero tokens (no evidence ≠ clean).

    Scale: fingerprint cardinality comes from ONE count window over
    the already-distinct (host, fp) stats — stats is per (host, fp),
    so COUNT(*) over the fp partition IS the distinct-host count, with
    no per-row set buffer and, critically, no groupBy+self-join that
    would duplicate the whole chunking pipeline into two plan subtrees
    (the first cut of this operator scanned and chunked the corpus
    TWICE for exactly that reason — caught by the plan pin in
    tests/test_physical_plans.py, which now asserts the text column is
    read once). The host rollup is as skewed as the host size
    distribution itself, which is exactly the skew AQE handles — and
    the aggregation is map-side partial first, so even a giant host
    arrives pre-combined.
    """
    from pyspark.sql import Window as W

    stats = host_chunk_stats(df, host_col, id_col, text_col, w, mask)
    # fingerprint -> on how many distinct hosts it occurs (see above)
    s = stats.withColumn(
        "n_hosts", F.count(F.lit(1)).over(W.partitionBy("chunk_fp"))
    )
    shared = F.col("n_hosts") > 1
    toks_all = F.col("n_copies") * F.col("chunk_tokens")
    per_host = s.groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("n_unique_fp"),
        F.sum("n_copies").cast("long").alias("n_chunks"),
        F.sum(F.col("n_copies") - 1).cast("long").alias("intra_dup_chunks"),
        F.sum((F.col("n_copies") - 1) * F.col("chunk_tokens"))
        .cast("long")
        .alias("intra_dup_tokens"),
        F.sum(F.when(shared, 1).otherwise(0)).cast("long").alias("shared_fps"),
        F.sum(F.when(shared, toks_all).otherwise(0))
        .cast("long")
        .alias("shared_tokens"),
        F.sum(toks_all).cast("long").alias("total_tokens"),
    )
    docs = df.groupBy(F.col(host_col).alias("host")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    ratio = lambda c: F.when(  # noqa: E731
        F.col("total_tokens") > 0,
        F.round(F.col(c).cast("double") / F.col("total_tokens"), 4),
    )
    out = docs.join(per_host, "host", "left").select(
        "host",
        "n_docs",
        F.coalesce("n_chunks", F.lit(0)).cast("long").alias("n_chunks"),
        F.coalesce("n_unique_fp", F.lit(0)).cast("long").alias("n_unique_fp"),
        F.coalesce("intra_dup_chunks", F.lit(0))
        .cast("long")
        .alias("intra_dup_chunks"),
        F.coalesce("intra_dup_tokens", F.lit(0))
        .cast("long")
        .alias("intra_dup_tokens"),
        F.coalesce("shared_fps", F.lit(0)).cast("long").alias("shared_fps"),
        F.coalesce("shared_tokens", F.lit(0))
        .cast("long")
        .alias("shared_tokens"),
        F.coalesce("total_tokens", F.lit(0)).cast("long").alias("total_tokens"),
        ratio("intra_dup_tokens").alias("intra_ratio"),
        ratio("shared_tokens").alias("shared_ratio"),
    )
    return out.withColumn(
        "verdict",
        F.when(F.col("shared_ratio").isNull(), F.lit("review"))
        .when(F.col("shared_ratio") >= drop_ratio, F.lit("drop"))
        .when(F.col("shared_ratio") >= review_ratio, F.lit("review"))
        .otherwise(F.lit("keep")),
    )


def host_mirror_pairs(
    df: DataFrame,
    host_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = 3,
    mask: int = 16,
    max_hosts_per_fp: int | None = 64,
    min_shared: int = 2,
) -> DataFrame:
    """Mirror/syndication detection: host pairs ranked by shared CDC
    chunk fingerprints. ``containment`` (shared / smaller host's
    fingerprint set) separates a full mirror or subset-mirror (→ 1.0)
    from two large hosts that merely share boilerplate; ``jaccard``
    is the symmetric overlap.

    Pair generation reuses cooccur.basket_pairs with basket =
    fingerprint, items = its hosts: dedup to distinct (fp, host), one
    collect_set per fp, codegen pair expansion — the H² fan-out of a
    universally-shared chunk is bounded by ``max_hosts_per_fp``
    (a chunk on >64 hosts is boilerplate, not mirror evidence; audit
    the exclusions with cooccur.dropped_baskets on the same frame).
    basket_pairs' own cap filters AFTER the collect_set, which is fine
    for session baskets but not for a web corpus where one boilerplate
    fingerprint can sit on millions of hosts — so the cap is applied
    HERE first, as a COUNT(*) window over the distinct (fp, host)
    frame (no set buffer anywhere), and the collect_set only ever sees
    surviving fingerprints (buffer bounded by the cap by construction).

    The (fp, host) frame feeds three consumers (cap filter → pairs,
    and the per-host sizes); an eager localCheckpoint computes the
    chunking pipeline ONCE instead of duplicating the corpus scan into
    each plan branch — at real scale this frame is the persisted
    chunk-stats table the curation pipeline materializes anyway.

    Output: ``(host_a, host_b, shared_fps, n_fp_a, n_fp_b,
    containment, jaccard)``, host_a < host_b."""
    from pyspark.sql import Window as W

    hf = (
        host_chunk_stats(df, host_col, id_col, text_col, w, mask)
        .select("chunk_fp", "host")
        .localCheckpoint(eager=True)
    )
    capped = hf
    if max_hosts_per_fp is not None:
        capped = (
            hf.withColumn(
                "__nh", F.count(F.lit(1)).over(W.partitionBy("chunk_fp"))
            )
            .filter(F.col("__nh") <= max_hosts_per_fp)
            .drop("__nh")
        )
    pairs = basket_pairs(
        capped,
        basket_col="chunk_fp",
        item_col="host",
        max_basket=None,
        min_support=min_shared,
    ).select(
        F.col("item_a").alias("host_a"),
        F.col("item_b").alias("host_b"),
        F.col("support").alias("shared_fps"),
    )
    sizes = hf.groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("n_fp")
    )
    return (
        pairs.join(sizes.withColumnsRenamed({"host": "host_a", "n_fp": "n_fp_a"}), "host_a")
        .join(sizes.withColumnsRenamed({"host": "host_b", "n_fp": "n_fp_b"}), "host_b")
        .select(
            "host_a",
            "host_b",
            "shared_fps",
            "n_fp_a",
            "n_fp_b",
            F.round(
                F.col("shared_fps").cast("double")
                / F.least("n_fp_a", "n_fp_b"),
                4,
            ).alias("containment"),
            F.round(
                F.col("shared_fps").cast("double")
                / (F.col("n_fp_a") + F.col("n_fp_b") - F.col("shared_fps")),
                4,
            ).alias("jaccard"),
        )
    )
