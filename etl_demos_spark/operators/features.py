"""Numeric feature preparation: standardization, winsorization, binning.

The tabular-feature half of training-data prep (text/embedding prep live
in text.py / embeddings.py / trainprep.py): models want group-normalized,
outlier-clipped, binned numeric columns, and at 100 TB each of these must
be a one-or-two-shuffle plan, not a per-row Python loop.

Shapes (all JVM built-ins, no Python in any path):
- z-score: ONE keyed partial-agg shuffle for the group moments (tiny
  output — one row per group), broadcast-joined back; the fact side
  never shuffles.
- winsorize: per-group exact interpolated percentiles (sort-based agg —
  fine to ~10⁸ rows/group, swap in percentile_approx at full corpus
  scale), broadcast-joined back, clip is a pure projection.
- equi-width histogram: min/max agg (one shuffle, one row), then a
  codegen'd bucket expression + count agg.
- equi-depth histogram: ntile over a deterministic total order — one
  range-partitioned sort, the same machinery as a global ORDER BY.

Cross-engine determinism (oracle pairing, workload.py conventions):
moments are DECIMAL sums of 1e-6-rounded values (order-independent under
any task scheduling — a raw float sum is not); x² is rounded to 1e-6
*after* the IEEE multiply so both engines square the same double; the
final mean/variance arithmetic is a fixed sequence of double ops on
those exact sums. Interpolated percentiles use the identical definition
in Spark (`percentile`) and DuckDB (`quantile_cont`). ntile ties are
broken by a total order (value, id) so bucket membership is unique.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def _rounded(col: str) -> Column:
    return F.round(F.col(col).cast("double"), 6)


def group_moments(
    df: DataFrame,
    cols: Sequence[str],
    group_by: str,
) -> DataFrame:
    """Per-group (n, mean, std_pop) for each column — decimal-exact sums,
    deterministic double finish. One keyed partial-agg shuffle; output is
    one row per group (broadcastable by construction)."""
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in cols:
        xd = _rounded(c)
        x2 = F.round(xd * xd, 6)
        aggs.append(F.sum(xd.cast("decimal(26,6)")).alias(f"_sum_{c}"))
        aggs.append(F.sum(x2.cast("decimal(32,6)")).alias(f"_sumsq_{c}"))
    g = df.groupBy(group_by).agg(*aggs)
    out_cols = [F.col(group_by), F.col("n")]
    for c in cols:
        s = F.col(f"_sum_{c}").cast("double")
        s2 = F.col(f"_sumsq_{c}").cast("double")
        n = F.col("n").cast("double")
        mean = s / n
        var = F.greatest(s2 / n - mean * mean, F.lit(0.0))
        out_cols.append(mean.alias(f"mean_{c}"))
        out_cols.append(F.sqrt(var).alias(f"std_{c}"))
    return g.select(*out_cols)


def zscore(
    df: DataFrame,
    cols: Sequence[str],
    group_by: str,
    round_to: int = 6,
) -> DataFrame:
    """Group-standardized copies of ``cols`` (``<col>_z``): (x − μ)/σ per
    group, σ the population std. Zero-variance groups yield NULL (no
    signal to scale). The moments row-set is tiny → broadcast join; the
    fact side stays un-shuffled."""
    stats = group_moments(df, cols, group_by)
    out = df.join(F.broadcast(stats), group_by)
    for c in cols:
        z = (_rounded(c) - F.col(f"mean_{c}")) / F.col(f"std_{c}")
        out = out.withColumn(
            f"{c}_z",
            F.when(F.col(f"std_{c}") == 0.0, F.lit(None).cast("double")).otherwise(
                F.round(z, round_to)
            ),
        )
    return out.drop("n", *[f"mean_{c}" for c in cols], *[f"std_{c}" for c in cols])


def winsorize(
    df: DataFrame,
    cols: Sequence[str],
    group_by: str,
    p_lo: float = 0.01,
    p_hi: float = 0.99,
    exact: bool = True,
    round_to: int = 6,
) -> DataFrame:
    """Outlier-clipped copies of ``cols`` (``<col>_w``): values clamped to
    the group's [p_lo, p_hi] interpolated percentiles. ``exact=True``
    (sort-based aggregate, oracle-comparable) for bounded groups;
    ``exact=False`` switches to the mergeable GK sketch for full-corpus
    scale. Bounds join back broadcast; the clip is a projection."""
    fn = F.percentile if exact else F.percentile_approx
    # both bounds from ONE percentile buffer per column (the array
    # form) — separate p_lo/p_hi aggs each buffered and sorted the
    # whole group twice (see quantile_profile)
    aggs = [
        fn(F.col(c).cast("double"), F.array(F.lit(p_lo), F.lit(p_hi))).alias(
            f"_b_{c}"
        )
        for c in cols
    ]
    bounds = df.groupBy(group_by).agg(*aggs).select(
        group_by,
        *[
            x
            for c in cols
            for x in (
                F.col(f"_b_{c}")[0].alias(f"_lo_{c}"),
                F.col(f"_b_{c}")[1].alias(f"_hi_{c}"),
            )
        ],
    )
    out = df.join(F.broadcast(bounds), group_by)
    for c in cols:
        clipped = F.least(
            F.greatest(F.col(c).cast("double"), F.col(f"_lo_{c}")), F.col(f"_hi_{c}")
        )
        out = out.withColumn(f"{c}_w", F.round(clipped, round_to))
    drop = [f"_lo_{c}" for c in cols] + [f"_hi_{c}" for c in cols]
    return out.drop(*drop)


def equi_width_hist(
    df: DataFrame,
    col: str,
    bins: int = 10,
) -> DataFrame:
    """Equi-width histogram: bucket i covers [lo + i·w, lo + (i+1)·w),
    the max value folded into the last bucket. min/max come from one
    aggregate (exact, order-independent); the bucket id is a codegen'd
    floor expression, so the histogram is scan + two tiny shuffles.
    Output: (bucket, n, bucket_lo, bucket_hi) for non-empty buckets."""
    ext = df.agg(
        F.min(F.col(col).cast("double")).alias("lo"),
        F.max(F.col(col).cast("double")).alias("hi"),
    )
    x = F.col(col).cast("double")
    w = (F.col("hi") - F.col("lo")) / F.lit(float(bins))
    bucket = F.when(F.col("hi") == F.col("lo"), F.lit(0)).otherwise(
        F.least(
            F.lit(bins - 1), F.floor((x - F.col("lo")) / w).cast("int")
        )
    )
    counted = (
        df.crossJoin(F.broadcast(ext))
        .select(bucket.cast("long").alias("bucket"), "lo", "hi")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.first("lo").alias("lo"),
            F.first("hi").alias("hi"),
        )
    )
    bw = (F.col("hi") - F.col("lo")) / F.lit(float(bins))
    return counted.select(
        "bucket",
        "n",
        F.round(F.col("lo") + F.col("bucket") * bw, 6).alias("bucket_lo"),
        F.round(F.col("lo") + (F.col("bucket") + F.lit(1)) * bw, 6).alias("bucket_hi"),
    )


def equi_depth_hist(
    df: DataFrame,
    col: str,
    id_col: str,
    bins: int = 10,
) -> DataFrame:
    """Equi-depth (equal-count) histogram via ``ntile`` over the total
    order (value, id) — ties split deterministically, so bucket
    membership is unique and cross-engine stable. An unpartitioned
    window is a SINGLE-PARTITION sort (the W2 hazard) — this form is the
    oracle-comparable reference for profiling-sized inputs; at corpus
    scale use :func:`equi_depth_hist_scale` (distributed rank via
    ``dense_ids``, pinned bucket-identical in tests).
    Output: (bucket, n, lo, hi)."""
    x = F.col(col).cast("double")
    w = Window.orderBy(x.asc(), F.col(id_col).asc())
    return (
        df.select(x.alias("_x"), F.ntile(bins).over(w).alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("_x"), 6).alias("lo"),
            F.round(F.max("_x"), 6).alias("hi"),
        )
        .select(F.col("bucket").cast("long").alias("bucket"), "n", "lo", "hi")
    )


def equi_depth_hist_scale(
    df: DataFrame,
    col: str,
    id_col: str,
    bins: int = 10,
) -> DataFrame:
    """Distributed equi-depth histogram: global rank via ``dense_ids``
    (repartitionByRange + per-partition numbering + tiny offset join —
    no single-task sort), then the exact ntile bucket formula applied as
    an expression: with n rows, the first n % bins buckets take
    ⌈n/bins⌉ rows, the rest ⌊n/bins⌋ — bucket-identical to
    :func:`equi_depth_hist` (pinned in tests/test_features.py). The only
    driver-side values are the row count and range boundaries."""
    from etl_demos_spark.operators.keys import dense_ids

    n = df.count()
    q, r = divmod(n, bins)
    x = F.col(col).cast("double")
    ranked = dense_ids(
        df.select(x.alias("_x"), F.col(id_col).alias("_id")),
        order_by=["_x", "_id"],
        key_name="_rank",
    )
    big = q + 1  # size of the first r buckets
    if q == 0:
        # fewer rows than bins: ntile gives one row per bucket
        bucket = F.col("_rank") - 1
    else:
        bucket = F.when(
            F.col("_rank") <= r * big, (F.col("_rank") - 1) / big
        ).otherwise(r + (F.col("_rank") - 1 - r * big) / q)
    return (
        ranked.select(F.floor(bucket).cast("long").alias("bucket0"), "_x")
        .groupBy("bucket0")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("_x"), 6).alias("lo"),
            F.round(F.max("_x"), 6).alias("hi"),
        )
        .select((F.col("bucket0") + 1).cast("long").alias("bucket"), "n", "lo", "hi")
    )


def psi_drift(
    ref: "DataFrame",
    cur: "DataFrame",
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 10,
) -> "DataFrame":
    """Population Stability Index between a reference and a current
    sample of ``value_col`` — THE deployed-model drift monitor:
    PSI = Σ_bins (pᵢ − qᵢ)·ln(pᵢ/qᵢ). Fixed-width bins over [lo, hi]
    (fixed cut points, not data-dependent quantiles, so two engines — 
    and two days' runs — bin identically; out-of-range values clamp to
    the edge bins) with +1 Laplace smoothing per bin so empty bins
    stay finite, the DSIR smoothing discipline. Two combiner-friendly
    bin-count aggs (output ∝ n_bins, never rows), proportions as exact
    integer ratios, one ln per bin, per-bin terms rounded 9 and summed
    — oracle-pairable end-to-end. Interpretation thresholds (industry
    convention): < 0.1 stable, 0.1–0.25 moderate, > 0.25 shifted.

    Returns a 1-row (psi, n_ref, n_cur) DataFrame."""
    width = (hi - lo) / n_bins

    def binned(df: "DataFrame", name: str) -> "DataFrame":
        b = F.least(
            F.lit(n_bins - 1),
            F.greatest(
                F.lit(0),
                F.floor(
                    (F.col(value_col).cast("double") - F.lit(lo))
                    / F.lit(width)
                ).cast("long"),
            ),
        )
        return df.select(b.alias("bin")).groupBy("bin").agg(
            F.count(F.lit(1)).cast("long").alias(name)
        )
    rb = binned(ref, "c_ref")
    cb = binned(cur, "c_cur")
    allbins = ref.sparkSession.range(n_bins).select(
        F.col("id").alias("bin")
    )
    j = (
        allbins.join(rb, "bin", "left")
        .join(cb, "bin", "left")
        .select(
            "bin",
            (F.coalesce("c_ref", F.lit(0)) + 1).alias("sr"),
            (F.coalesce("c_cur", F.lit(0)) + 1).alias("sc"),
        )
    )
    from pyspark.sql import Window as W

    wall = W.partitionBy()
    t = j.select(
        "sr", "sc",
        F.sum("sr").over(wall).alias("tr"),
        F.sum("sc").over(wall).alias("tc"),
    )
    p = F.col("sr").cast("double") / F.col("tr").cast("double")
    q = F.col("sc").cast("double") / F.col("tc").cast("double")
    term = F.round((p - q) * F.log(p / q), 9)
    return t.select(term.alias("term"), "tr", "tc").agg(
        F.round(F.sum("term"), 9).alias("psi"),
        (F.max("tr") - F.lit(n_bins)).cast("long").alias("n_ref"),
        (F.max("tc") - F.lit(n_bins)).cast("long").alias("n_cur"),
    )


# Poisson(1) CDF cut points for the deterministic bootstrap weights;
# shortest-round-trip decimal reprs so any engine parses the identical
# doubles (the HLL/DSIR literal discipline)
POISSON1_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238463,
    0.9963401531726563,
    0.9994058151824183,
    0.999916758850712,
    0.9999897508033253,
)


def poisson_weight(u):
    """Poisson(1) draw by inverse CDF over a uniform — a CASE ladder
    both engines evaluate identically (capped at 8; P(X>8) ≈ 1e-6)."""
    w = F.lit(8)
    for k in range(len(POISSON1_CDF) - 1, -1, -1):
        w = F.when(u < F.lit(POISSON1_CDF[k]), F.lit(k)).otherwise(w)
    return w.cast("long")


def poisson_bootstrap_ci(
    df: "DataFrame",
    value_col: str,
    id_col: str,
    n_replicas: int = 50,
    alpha: float = 0.05,
    scale: int = 100,
    base_hash: str = "md5",
) -> "DataFrame":
    """Bootstrap confidence interval for the mean in ONE distributed
    pass — the Poisson bootstrap (Chamandy et al., Google 2012): true
    multinomial resampling needs global coordination, but per-row
    independent Poisson(1) weights approximate it with no shuffle of
    the raw data at all. Weights come from the portable md5 uniform of
    (id, replica) — deterministic, replayable, engine-reproducible (the
    DSIR/Gumbel discipline), and replica sums stay EXACT: values are
    quantized to integer cents (1/``scale``; lossless for 2-decimal
    inputs), weights are integers, so every accumulated sum is an
    order-independent int64 — the Gram-pass discipline, and ~5× faster
    than a DECIMAL path through codegen. Doubles appear only in the
    per-replica mean division (rounded 6) and the final order-statistic
    pick.

    Scale shape: rows × B exploded weight rows collapse through ONE
    combiner-friendly replica-keyed agg (B output rows); the CI is two
    order statistics of B means (percentile_disc convention: value at
    rank ⌈q·B⌉). Returns 1 row (n_rows, mean, ci_lo, ci_hi,
    n_replicas)."""
    from etl_demos_spark.operators.dedup import md5_long
    from pyspark.sql import Window as W

    b = F.explode(F.sequence(F.lit(0), F.lit(n_replicas - 1))).alias("b")
    base = df.select(
        F.col(id_col).alias("__id"),
        F.round(F.col(value_col).cast("double") * scale, 0)
        .cast("long")
        .alias("__v"),
    )
    # Parallelism floor for the replica stage (r12, measured 7.2 → 2.5 s
    # median at sf0.1, identical output — perf/ab_bootstrap_r12.json):
    # the md5-per-(row, replica) hash is the query's honest dominant
    # cost, but it inherits the SCAN's partitioning through the narrow
    # explode — a single-row-group bench table plans ~3 partitions, so
    # the 50× exploded hash stage ran on 3 of 32 cores. Round-robin
    # repartition of the PRE-explode (id, value) rows is a few-MB
    # shuffle (narrow rows, never the exploded 50×) and is retry-safe
    # (sortBeforeRepartition; downstream sums are order-independent
    # ints). Scale-gated: corpora whose scans already plan >= the
    # session parallelism skip the shuffle entirely.
    n_par = df.sparkSession.sparkContext.defaultParallelism
    if base.rdd.getNumPartitions() < n_par:
        base = base.repartition(n_par)
    reps = base.select("__id", "__v", b)
    key = F.concat(
        F.col("__id").cast("string"), F.lit(":"), F.col("b").cast("string")
    )
    h = (
        md5_long(key)
        if base_hash == "md5"
        else F.pmod(F.xxhash64(key), F.lit(1 << 52))
    )
    u = ((h % F.lit(1 << 52)).cast("double") + F.lit(0.5)) / F.lit(
        float(1 << 52)
    )
    # TWO projections, deliberately: poisson_weight is a 9-branch CASE
    # ladder over u, and expressions inside conditional branches are
    # exempt from codegen subexpression elimination — inlining u would
    # re-compute the md5 once PER BRANCH (measured 9.4 s vs 5.1 s for
    # the 5M-row stage at sf0.1). CollapseProject keeps the split
    # because u is non-cheap and referenced 9 times.
    weighted = reps.select("b", "__v", u.alias("__u")).select(
        "b", "__v", poisson_weight(F.col("__u")).alias("w")
    )
    per_rep = weighted.groupBy("b").agg(
        F.sum(F.col("w") * F.col("__v")).cast("long").alias("s"),
        F.sum("w").cast("long").alias("n"),
    )
    mean_b = per_rep.select(
        "b",
        F.when(
            F.col("n") > 0,
            F.round(
                F.col("s").cast("double")
                / F.col("n").cast("double")
                / F.lit(float(scale)),
                6,
            ),
        ).otherwise(F.lit(None).cast("double")).alias("m"),
    ).filter(F.col("m").isNotNull())
    wnd = W.partitionBy().orderBy("m", "b")
    ranked = mean_b.select(
        "m", F.row_number().over(wnd).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy()).alias("nb"),
    )
    lo_rank = F.ceil(F.lit(alpha / 2.0) * F.col("nb")).cast("int")
    hi_rank = F.ceil(F.lit(1.0 - alpha / 2.0) * F.col("nb")).cast("int")
    ci = ranked.agg(
        F.max(F.when(F.col("rn") == lo_rank, F.col("m"))).alias("ci_lo"),
        F.max(F.when(F.col("rn") == hi_rank, F.col("m"))).alias("ci_hi"),
    )
    overall = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.round(
            F.sum("__v").cast("double")
            / F.count(F.lit(1)).cast("double")
            / F.lit(float(scale)),
            6,
        ).alias("mean"),
    )
    return overall.crossJoin(ci).select(
        "n_rows", "mean", "ci_lo", "ci_hi",
        F.lit(n_replicas).cast("long").alias("n_replicas"),
    )


def mad_outlier_counts(
    df: "DataFrame",
    group_col: str,
    value_col: str,
    k: float = 3.0,
) -> "DataFrame":
    """Robust anomaly detection per group: median + MAD (median
    absolute deviation), flag |x − med| > k·1.4826·MAD (1.4826 makes
    MAD a consistent σ estimator under normality). Two grouped exact
    interpolated percentiles (Spark ``percentile`` ≡ DuckDB
    ``quantile_cont`` — the repo's established pairing) with the tiny
    per-group medians broadcast back between passes; at full corpus
    swap in percentile_approx, same plan shape (the quantile_profile
    discipline). Returns (group, med, mad, n, n_outliers)."""
    med = df.groupBy(group_col).agg(
        F.round(F.percentile(value_col, F.lit(0.5)), 6).alias("med")
    )
    dev = df.join(F.broadcast(med), group_col).select(
        group_col, "med",
        F.abs(F.col(value_col) - F.col("med")).alias("ad"),
        F.col(value_col).alias("__v"),
    )
    mad = dev.groupBy(group_col).agg(
        F.round(F.percentile("ad", F.lit(0.5)), 6).alias("mad")
    )
    j = dev.join(F.broadcast(mad), group_col)
    thresh = F.lit(1.4826) * F.col("mad") * F.lit(k)
    return (
        j.groupBy(group_col, "med", "mad")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(
                F.when(F.abs(F.col("__v") - F.col("med")) > thresh, 1)
                .otherwise(0)
            ).cast("long").alias("n_outliers"),
        )
    )


def groupwise_ols(
    df: "DataFrame",
    group_col: str,
    x_col,
    y_col,
    scale: int = 100,
) -> "DataFrame":
    """Per-group simple linear regression (trend per key) in ONE
    combiner-friendly pass — the moment trick: slope = (nΣxy − ΣxΣy) /
    (nΣx² − (Σx)²), intercept = (Σy − slope·Σx)/n, r² from the same
    five sums. Inputs are quantized to 1/``scale`` integers so every
    moment is an EXACT int64/decimal sum (the Gram-pass discipline —
    order-independent, engine-portable); doubles appear only in the
    final closed-form division, rounded 6. Degenerate groups (zero x
    variance) return NULL slope rather than dividing by zero.

    Returns (group, n, slope, intercept, r2)."""
    xq = F.round(F.col(x_col).cast("double") * scale, 0).cast("long")
    yq = F.round(F.col(y_col).cast("double") * scale, 0).cast("long")
    m = df.select(F.col(group_col).alias("g"), xq.alias("x"), yq.alias("y"))
    # cast the OPERAND, not the result: a cast applied after F.sum(long)
    # would let the accumulation itself run in wrapping int64 — with
    # quantized values ~1e8·scale and large groups the sum (and the
    # x·y products, ~1e20) exceed 2^63 long before the cast. decimal
    # inside the sum keeps every moment exact, matching the DuckDB
    # oracle's HUGEINT sums (the gram_matrix discipline,
    # embeddings.py:331). decimal(19,0)² → decimal(38,0) product fits:
    # two int64 operands multiply to < 8.6e37 < 1e38.
    xd = F.col("x").cast("decimal(19,0)")
    yd = F.col("y").cast("decimal(19,0)")
    agg = m.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
        F.sum((xd * yd).cast("decimal(38,0)")).alias("sxy"),
        F.sum((xd * xd).cast("decimal(38,0)")).alias("sxx"),
        F.sum((yd * yd).cast("decimal(38,0)")).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    cov = n * sxy - sx * sy
    slope = F.when(vx > 0, cov / vx)
    intercept = F.when(
        vx > 0, (sy - (cov / vx) * sx) / n / F.lit(float(scale))
    )
    r2 = F.when((vx > 0) & (vy > 0), (cov * cov) / (vx * vy))
    return agg.select(
        F.col("g").alias(group_col),
        "n",
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
        F.round(r2, 6).alias("r2"),
    )
