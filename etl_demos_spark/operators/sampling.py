"""Sampling and splitting for training-data pipelines.

- ``split_by_hash``: deterministic train/val/test assignment from a
  content-stable hash of the key — the only split that survives
  re-runs, backfills, and engine changes (md5 hex-range comparison is
  bit-identical everywhere; row-position or RNG splits are not). This is
  the standard leakage-safe split: a document's assignment never changes
  when the corpus around it does.
- ``stratified_sample``: per-stratum Bernoulli sampling (sampleBy) for
  rebalancing corpora by language/source; seeded → reproducible within
  an engine.
- ``deterministic_sample``: keyed-hash Bernoulli sample — like
  split_by_hash, stable across runs AND engines (no RNG state).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def hash_bucket(key: Column | str, buckets: int = 100) -> Column:
    """Stable bucket in [0, buckets) from the md5 of the key's string form.

    Uses the first 8 hex chars as an integer (via conv) — engine-portable
    (md5 is md5; hex parsing is exact) and uniform. NULL keys coalesce to
    a sentinel so they land deterministically in ONE bucket instead of
    yielding a NULL bucket — a NULL bucket would make split_by_hash's
    when-chain assign NO split and every downstream split filter silently
    drop those rows."""
    c = F.col(key) if isinstance(key, str) else key
    s = F.coalesce(c.cast("string"), F.lit("\x00null"))
    return (F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long") % buckets)


def split_by_hash(
    df: DataFrame,
    key: str,
    splits: Sequence[tuple[str, int]] = (("train", 90), ("val", 5), ("test", 5)),
    split_col: str = "split",
) -> DataFrame:
    """Assign each row to a named split by hash-bucket ranges (percents
    must sum to 100). Deterministic per key forever."""
    total = sum(p for _, p in splits)
    if total != 100:
        raise ValueError(f"split percents must sum to 100, got {total}")
    b = hash_bucket(key, 100)
    expr = None
    lo = 0
    for name, pct in splits:
        cond = (b >= lo) & (b < lo + pct)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo += pct
    return df.withColumn(split_col, expr)


def deterministic_sample(df: DataFrame, key: str, fraction: float, buckets: int = 10_000) -> DataFrame:
    """Keep rows whose key-hash bucket falls under fraction — reproducible
    across runs/engines, unlike df.sample's RNG."""
    return df.filter(hash_bucket(key, buckets) < int(round(fraction * buckets)))


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: Mapping, seed: int = 42
) -> DataFrame:
    """Per-stratum Bernoulli sampling (corpus rebalancing)."""
    return df.sampleBy(strata_col, dict(fractions), seed)


def stratified_sample_by_hash(
    df: DataFrame,
    strata_col: str,
    key: str,
    fractions: Mapping,
    buckets: int = 100,
) -> DataFrame:
    """Per-stratum DETERMINISTIC downsampling: keep a row iff its key-hash
    bucket falls under its stratum's fraction. Unlike ``sampleBy`` (RNG
    state, engine-local), assignments are stable across runs, backfills,
    and engines, and no driver-side distinct-strata pass is needed — the
    fraction map compiles into one CASE threshold expression. Strata
    absent from ``fractions`` are kept whole."""
    b = hash_bucket(key, buckets)
    thr = None
    for stratum, f in fractions.items():
        cond = F.col(strata_col) == stratum
        t = int(round(f * buckets))
        thr = F.when(cond, t) if thr is None else thr.when(cond, t)
    thr = thr.otherwise(buckets) if thr is not None else F.lit(buckets)
    return df.filter(b < thr)


def weighted_sample_topk(
    df: DataFrame,
    weight_col: str,
    k: int,
    key: str,
    seed: str = "ws0",
    key_out: str = "ws_key",
) -> DataFrame:
    """Weight-proportional sample WITHOUT replacement, deterministic
    across runs AND engines — the Efraimidis–Spirakis exponential-race
    scheme with the RNG replaced by a content hash.

    Each row draws u ∈ (0, 1] from md5(seed‖key) (first 12 hex chars —
    48 exact bits) and races with key −ln(u)/w; the k smallest keys win,
    which samples exactly proportional-to-weight without replacement.
    One narrow projection + a distributed top-k (orderBy+limit runs as
    per-partition partial top-k, only k rows reach the final stage) —
    no RNG state, no sequential pass, re-runs and backfills pick the
    same rows.

    The race runs in the LOG domain: key = ln(−ln u) − ln w, a strictly
    monotone transform of the textbook −ln(u)/w. The transform matters
    for the rounding convention: the emitted key is rounded to 6 places
    with an id tie-break so engine-specific ln() ULPs cannot reorder the
    selection, and in log space that 1e-6 is RELATIVE precision at every
    weight scale — rounding −ln(u)/w absolutely would collapse all keys
    to a handful of values once weights reach ~1e6 (keys ≤ 36/w),
    silently degenerating selection to lowest-id-first. u is the 48-bit
    md5 uniform shifted by +0.5 so u ∈ (0, 1) strictly — at the +1.0
    shift u could reach exactly 1 and ln(−ln 1) = −∞ would win a slot
    unconditionally (a birthday certainty at corpus scale).

    Rows with weight ≤ 0 or NULL never win (filtered), and NULL keys are
    filtered too — a NULL key has no deterministic draw (its race key
    would be NULL, which Spark sorts FIRST, i.e. an automatic win).
    """
    c = F.col(key)
    w = F.col(weight_col).cast("double")
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(seed), c.cast("string"))), 1, 12),
            16,
            10,
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(16**12))
    race = F.round(F.log(-F.log(u)) - F.log(w), 6)
    return (
        df.filter(w > 0)
        .filter(c.isNotNull())
        .withColumn(key_out, race)
        .orderBy(F.col(key_out).asc(), c.asc())
        .limit(k)
    )


def mixture_plan(
    df: DataFrame,
    group_col: str,
    weights: dict[str, float],
    budget_tokens: int,
    text_col: str = "text",
    max_epochs: float = 4.0,
) -> DataFrame:
    """Training-mixture planner: turn target mixture WEIGHTS plus a
    token BUDGET into per-group sampling rates — the arithmetic layer
    that sits above the rate-based samplers (epoch replication in
    q_mixture_sample) and below the packer. Public recipe shape
    (Pile/Dolma-style mixture tables): weight w_g of the budget goes
    to group g, so rate_g = (w_g / Σw over PRESENT groups) · B /
    tokens_g epochs of g's data; rates are capped at ``max_epochs``
    (oversampling a tiny source beyond a few epochs hurts more than
    the mixture miss) and the induced shortfall is REPORTED, not
    silently eaten — the no-silent-caps discipline.

    Groups absent from ``weights`` get weight 0.0 (excluded, visible
    as rate 0 rows). Weight KEYS absent from the corpus surface as
    zero-count rows with their weight still in the renormalizing sum —
    a typo'd source name shows up as a dead row carrying visible
    budget mass instead of silently redistributing its share to the
    other groups (the no-silent-caps discipline, both directions).
    One groupBy + one full-outer join against the |weights|-row
    literal frame (both sides are group-level — tiny; full outer can't
    broadcast, and needn't) + one |groups|-row global window for the
    renormalization — nothing driver-side, nothing quadratic. The
    renormalizing sum runs over weights QUANTIZED to 1e-6 BIGINT units
    (a double sum over an unordered window is ulp-order-dependent;
    integer sums are not — the engine-portability idiom the pagerank /
    bitext margins use), so every rate is a deterministic function of
    exact integers and the DuckDB oracle replays it bit-for-bit.

    Output: ``(group, n_docs, total_tokens, weight, rate,
    epochs, planned_tokens, shortfall_tokens)`` — rate is the uncapped
    ask, epochs the capped plan; planned = round(epochs·tokens),
    shortfall = round((rate−epochs)·tokens) where capped, 0 otherwise.
    """
    from pyspark.sql import Window as W

    from etl_demos_spark.operators.text import token_count

    g = df.groupBy(F.col(group_col).alias("group")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(token_count(text_col)).cast("long").alias("total_tokens"),
    )
    # full outer against the literal weights frame: observed groups
    # missing a weight get 0.0; weight keys missing from the corpus
    # KEEP their row (n_docs/total_tokens 0) and their mass in the sum
    wdf = df.sparkSession.createDataFrame(
        [(k, float(v)) for k, v in sorted(weights.items())],
        "group string, weight double",
    )
    g = (
        g.join(wdf, "group", "full_outer")
        .select(
            "group",
            F.coalesce("n_docs", F.lit(0)).cast("long").alias("n_docs"),
            F.coalesce("total_tokens", F.lit(0))
            .cast("long")
            .alias("total_tokens"),
            F.coalesce("weight", F.lit(0.0)).alias("weight"),
        )
        .withColumn(
            "__wq", F.round(F.col("weight") * 1_000_000).cast("long")
        )
        .withColumn("__wsumq", F.sum("__wq").over(W.partitionBy()))
    )
    rate = F.when(
        (F.col("total_tokens") > 0) & (F.col("__wsumq") > 0),
        F.col("__wq").cast("double")
        / F.col("__wsumq").cast("double")
        * F.lit(float(budget_tokens))
        / F.col("total_tokens").cast("double"),
    ).otherwise(F.lit(0.0))
    g = g.withColumn("rate", rate).withColumn(
        "epochs", F.least(F.col("rate"), F.lit(float(max_epochs)))
    )
    return g.select(
        "group",
        "n_docs",
        "total_tokens",
        "weight",
        F.round("rate", 6).alias("rate"),
        F.round("epochs", 6).alias("epochs"),
        F.round(F.col("epochs") * F.col("total_tokens"))
        .cast("long")
        .alias("planned_tokens"),
        F.round((F.col("rate") - F.col("epochs")) * F.col("total_tokens"))
        .cast("long")
        .alias("shortfall_tokens"),
    )
