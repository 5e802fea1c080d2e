"""Training-data preparation: decontamination, sequence packing,
deterministic corpus shuffling.

The operations a pretraining pipeline runs AFTER dedup/quality filtering
(operators/dedup.py, operators/text.py) and BEFORE export — extensions
beyond the reference's relational surface, same engine conventions.

Scale design:

- **Decontamination** (eval-set n-gram overlap): the standard rule —
  a training document sharing any word n-gram with an evaluation
  document is contaminated and dropped. Implemented as an
  inverted-index equi-join on the gram: explode both sides to
  (gram, doc), join on gram. Work is proportional to true collisions,
  never |train| x |test|; the join key is near-uniform (natural-language
  grams have a long tail, and the eval side is tiny by construction), so
  one ordinary hash-shuffle each side. At 100 TB the eval index is MBs —
  Spark broadcasts it and the train side never shuffles at all.
- **Sequence packing**: assign documents to fixed-token-budget training
  sequences. Exact first-fit is inherently sequential, so the scalable
  form packs WITHIN hash buckets: documents land in ``n_buckets``
  independent streams (uniform content hash), each stream packs in
  deterministic id order with one window cumsum — sequence number =
  floor(exclusive_prefix_tokens / target). Buckets pack in parallel
  (the window partitions by bucket — no global sort, no single-reducer
  bottleneck); a sequence may overrun the budget by at most its last
  document, the usual streaming-packing bound — callers chunk documents
  longer than ``target`` first.
- **Mixture resampling**: per-source replication at fractional rates
  (temperature-weighted mixing). Rates compile to a CASE expression and
  replication to one explode — no joins, no shuffle, no RNG; output
  volume is exactly the mixture budget.
- **Deterministic shuffle**: global training order as rank over a keyed
  hash (md5 of seed||id) — reproducible across runs AND engines, unlike
  RNG shuffles. Spark executes the global sort as a range-partitioned
  sort (sample → balanced ranges), the same plan it uses for any
  ORDER BY: no single-machine sort at any scale. For file export,
  pair with repartitionByRange on the same rank.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from etl_demos_spark.operators.dedup import exploded_shingles
from etl_demos_spark.operators.sampling import hash_bucket


def contamination_report(
    train: DataFrame,
    test: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """(train_id, n_shared_grams): training docs sharing >= 1 word n-gram
    with any test doc, with the count of distinct offending grams.

    Gram semantics match the dedup family (lowercased word tokens,
    distinct n-grams — operators/dedup.py:shingled_docs). The join runs
    on xxhash64 of the gram, not the gram string: n-gram strings are
    ~(6·n) bytes and dominate shuffle/compare cost, the hash is 8 —
    counts are exact up to a ~(distinct grams)²/2⁶⁴ collision
    probability, negligible at any corpus size that fits in a cluster.
    """
    tr = _gram_hashes(train, id_col, text_col, n).withColumnRenamed("id", "train_id")
    te = _gram_hashes(test, id_col, text_col, n).select("gh").distinct()
    return tr.join(te, "gh").groupBy("train_id").agg(
        F.count_distinct(F.col("gh")).alias("n_shared_grams")
    )


def _gram_hashes(
    df: DataFrame, id_col: str, text_col: str, n: int, extra: tuple[str, ...] = ()
) -> DataFrame:
    """(id, *extra, gh): codegen'd shingle rows → 64-bit gram hashes.

    Uses dedup.exploded_shingles (arrays_zip/slice/explode — no
    interpreted lambdas, no per-doc array_distinct). Rows are NOT
    deduped per document; every consumer here applies ``distinct()`` /
    ``count_distinct`` downstream, so reported gram counts keep exact
    set semantics while the hot path stays whole-stage codegen."""
    return exploded_shingles(df, id_col, text_col, n, extra=extra).select(
        "id", *extra, F.xxhash64("g").alias("gh")
    )


def contamination_report_split(
    df: DataFrame,
    test_flag: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """contamination_report for a corpus-internal split (train and eval
    rows in ONE table, distinguished by ``test_flag``). Convenience
    shape, not a perf win: the two differently-filtered consumers of
    the shingle lineage get their ``__is_test`` filters pushed BELOW
    the shingling by Catalyst, so each surviving row is shingled once
    per side it belongs to — the same total work as calling
    contamination_report on two pre-filtered frames. NULL flags are
    treated as train (coalesced false): a row must land on exactly one
    side, never vanish from both."""
    g = _gram_hashes(
        df.withColumn("__is_test", F.coalesce(test_flag, F.lit(False))),
        id_col, text_col, n, ("__is_test",),
    )
    tr = g.filter(~F.col("__is_test")).select(F.col("id").alias("train_id"), "gh")
    te = g.filter(F.col("__is_test")).select("gh").distinct()
    return tr.join(te, "gh").groupBy("train_id").agg(
        F.count_distinct(F.col("gh")).alias("n_shared_grams")
    )


def decontaminate(
    train: DataFrame,
    test: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Training rows minus contaminated ones (left_anti on the report)."""
    bad = contamination_report(train, test, id_col, text_col, n).select(
        F.col("train_id").alias(id_col)
    )
    return train.join(bad, id_col, "left_anti")


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    count_col: str = "n_tokens",
    target: int = 512,
    n_buckets: int = 8,
) -> DataFrame:
    """Assign each document a (bucket, seq_id, seq_pos): greedy packing
    into ~``target``-token sequences within each of ``n_buckets``
    parallel streams. Deterministic (content-hash bucket, id order)."""
    b = hash_bucket(F.col(id_col), n_buckets).alias("bucket")
    w = Window.partitionBy("bucket").orderBy(id_col)
    cum_excl = F.coalesce(
        F.sum(count_col).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    out = df.select(F.col(id_col), F.col(count_col), b).withColumn(
        "seq_id", F.floor(cum_excl / F.lit(target))
    )
    wseq = Window.partitionBy("bucket", "seq_id").orderBy(id_col)
    return out.withColumn("seq_pos", F.row_number().over(wseq) - F.lit(1))


def mixture_sample(
    df: DataFrame,
    source_col: str,
    key: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    buckets: int = 10_000,
    copy_col: str = "copy_id",
) -> DataFrame:
    """Source-mixture resampling for training export: each row is
    replicated ``rate`` times, where ``rate`` comes from its source's
    entry in ``rates`` (e.g. temperature-weighted mixing — upweight
    high-quality sources past 1.0, downsample bulk web below it).

    Fractional rates are exact in expectation and DETERMINISTIC per key:
    a rate of 2.4 emits 2 full copies of every row plus a third copy for
    the 40% of rows whose content-hash bucket falls under the fraction —
    no RNG state, stable across runs, backfills, and engines. A rate of
    0 drops the source (explode of an empty array removes the row).

    Scale shape: one narrow projection (CASE rate lookup compiled into
    the plan — no join for a literal rate map) + explode. Output size is
    exactly the mixture budget; nothing shuffles. ``copy_col``
    distinguishes replicas so a downstream deterministic_shuffle spreads
    copies apart instead of deduping them."""
    rate = None
    for s, r in rates.items():
        cond = F.col(source_col) == s
        rate = F.when(cond, float(r)) if rate is None else rate.when(cond, float(r))
    rate = rate.otherwise(float(default_rate)) if rate is not None else F.lit(float(default_rate))

    n_full = F.floor(rate).cast("int")
    n_copies = F.ceil(rate).cast("int")
    frac_thr = F.round((rate - F.floor(rate)) * buckets).cast("long")
    copies = F.when(
        n_copies >= 1, F.sequence(F.lit(1), n_copies)
    ).otherwise(F.array().cast("array<int>"))
    out = df.withColumn(copy_col, F.explode(copies))
    keep = (F.col(copy_col) <= n_full) | (
        hash_bucket(F.col(key), buckets) < frac_thr
    )
    return out.filter(keep)


def temperature_rates(
    df: DataFrame,
    source_col: str,
    alpha: float = 0.7,
    budget_rows: int | None = None,
) -> DataFrame:
    """Per-source replication rates for temperature-weighted mixing
    (multilingual-LM recipe): target share ∝ count^alpha, so alpha=1 is
    natural proportions and alpha=0 is uniform. Returns (source, n_rows,
    rate) where rate = budget * share / n_rows; with budget_rows=None the
    budget is the corpus size (pure re-balance). One tiny aggregate —
    feed the collected map into mixture_sample's ``rates``."""
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n_rows"))
    total_w = counts.agg(
        F.sum(F.pow(F.col("n_rows"), F.lit(alpha))).alias("tw"),
        F.sum("n_rows").alias("tn"),
    )
    j = counts.crossJoin(F.broadcast(total_w))
    budget = F.lit(budget_rows) if budget_rows is not None else F.col("tn")
    return j.select(
        source_col,
        "n_rows",
        (budget * F.pow(F.col("n_rows"), F.lit(alpha)) / F.col("tw") / F.col("n_rows")).alias("rate"),
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 128,
    stride: int = 96,
) -> DataFrame:
    """Fixed-size overlapping character chunks — the context-window prep
    step before embedding / packing (documents longer than a model's
    window are cut into ``size``-char pieces every ``stride`` chars;
    ``stride < size`` overlaps chunks so no boundary context is lost).

    Scale path: pure JVM built-ins — ``sequence`` 0..last_chunk,
    ``explode``, ``substr`` — one narrow pipeline, no shuffle, no Python.
    Output volume is exactly ``ceil(len/stride)`` rows per doc; an empty
    document emits one empty chunk (len 0 → last = 0). The UDTF variant
    below (`chunk_documents_udtf`) computes the identical result through
    Spark's Python UDTF surface and exists to prove that surface; THIS
    form is the one to use in a 100 TB pipeline.
    """
    if size <= 0 or stride <= 0:
        raise ValueError("size and stride must be positive")
    txt = F.coalesce(F.col(text_col), F.lit(""))  # null text ≡ empty doc
    last = F.greatest(
        F.lit(0), F.floor((F.length(txt) - F.lit(1)) / F.lit(float(stride)))
    ).cast("int")
    out = df.select(
        F.col(id_col),
        txt.alias("__txt"),
        F.explode(F.sequence(F.lit(0), last)).alias("chunk_idx"),
    )
    chunk = F.col("__txt").substr(
        F.col("chunk_idx") * F.lit(stride) + F.lit(1), F.lit(size)
    )
    return out.select(
        id_col,
        "chunk_idx",
        chunk.alias("chunk"),
        F.length(chunk).alias("chunk_chars"),
    )


def chunk_documents_udtf(
    spark,
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 128,
    stride: int = 96,
) -> DataFrame:
    """`chunk_documents` through Spark's Python UDTF surface (§2.9):
    a table function lateral-joined per row, yielding one row per chunk.
    Registered + invoked via SQL ``LATERAL`` — the canonical UDTF call
    shape. Row-at-a-time Python; kept as the UDF-surface proof and pinned
    equal to the built-in form in tests/test_trainprep.py. Use
    `chunk_documents` for real workloads."""
    from pyspark.sql.functions import udtf

    if size <= 0 or stride <= 0:
        raise ValueError("size and stride must be positive")

    class _Chunk:
        def eval(self, doc_id, text):
            t = text or ""
            last = max(0, (len(t) - 1) // stride)
            for i in range(last + 1):
                piece = t[i * stride : i * stride + size]
                yield doc_id, i, piece, len(piece)

    # carry the id column's ACTUAL type through the UDTF schema — the
    # sibling chunk_documents preserves any id type, and a hardcoded
    # long would make string ids die in Arrow conversion
    id_type = df.schema[id_col].dataType.simpleString()
    chunker = udtf(
        _Chunk,
        returnType=(
            f"{id_col}: {id_type}, chunk_idx: int, chunk: string, "
            f"chunk_chars: int"
        ),
    )
    spark.udtf.register("chunk_doc_udtf", chunker)
    df.select(F.col(id_col), F.col(text_col)).createOrReplaceTempView(
        "__chunk_udtf_input"
    )
    return spark.sql(
        f"SELECT c.* FROM __chunk_udtf_input d, "
        f"LATERAL chunk_doc_udtf(d.{id_col}, d.{text_col}) c"
    )


def deterministic_shuffle(
    df: DataFrame, id_col: str = "doc_id", seed: str = "s0", rank_col: str = "shuffle_rank"
) -> DataFrame:
    """Global pseudo-random training order, stable across runs and
    engines: rank by md5(seed || id). Ties are impossible for distinct
    ids (md5 collision aside), so the order is total.

    Ranks come from operators/keys.py:dense_ids (range exchange +
    per-partition numbering + broadcast offsets), NOT a global
    Window.orderBy — that would be a single-partition sort at scale."""
    from etl_demos_spark.operators.keys import dense_ids

    key = F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string")))
    return dense_ids(
        df.withColumn("__shuffle_key", key), ["__shuffle_key"], rank_col
    ).drop("__shuffle_key")


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    seed: str = "epoch0",
) -> None:
    """Export the corpus as ``n_shards`` parquet files in deterministic
    training order: deterministic_shuffle rank → ``repartitionByRange``
    on the rank (each shard owns one contiguous rank slice, sampled
    split points keep shards balanced) → in-shard sort → write with one
    file per partition.

    The dataloader contract this satisfies: reading shard files in
    filename order and rows in file order replays the exact global
    shuffle order, and any shard subset is a contiguous, reproducible
    slice — resumable without coordination. No global single-machine
    sort anywhere: the rank is dense_ids (range exchange + offsets) and
    the range repartition samples split points."""
    ranked = deterministic_shuffle(df, id_col, seed, "shuffle_rank")
    (
        ranked.repartitionByRange(n_shards, F.col("shuffle_rank"))
        .sortWithinPartitions("shuffle_rank")
        .write.mode("overwrite")
        .parquet(path)
    )
