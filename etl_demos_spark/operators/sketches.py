"""Mergeable sketch aggregates (Apache DataSketches via Spark built-ins).

The 100 TB pattern these enable: *pre-aggregate once, re-aggregate
cheaply forever*. A distinct-count over an arbitrary date range normally
re-scans the raw data per question; with per-(key, day) HLL sketch
partials stored (a few KB each), any range/rollup answer is a union of
sketches — work ∝ number of partials, never raw rows. HLL register
updates are max-operations, so sketches are insertion-order-independent
and deterministic for a given input set and lg_k: union-of-dailies is
byte-equivalent in estimate to the whole-corpus sketch (asserted in
tests/test_scale_utils.py).

DuckDB cannot reproduce DataSketches binaries, so oracle pairing for the
workload query uses exact distinct counts for the hash-checked columns
and expresses the sketch property as a within-tolerance boolean (the
honest cross-engine form; the exact-equality mergeability check lives in
the pytest suite).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def distinct_sketches(
    df: DataFrame,
    group_cols: tuple[str, ...],
    value_col: str,
    lg_k: int = 14,
) -> DataFrame:
    """Per-group HLL sketch partials of ``value_col`` (binary, ~2^lg_k
    bytes max each). One combiner-friendly hash agg — sketch updates
    happen map-side; the shuffle carries one sketch per group per
    partition, not rows. Store these (e.g. per day) as the reusable
    pre-aggregate."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("sketch"),
        F.count(F.lit(1)).alias("rows_in"),
    )


def merge_sketch_rollup(
    sketches: DataFrame,
    rollup_cols: tuple[str, ...],
    sketch_col: str = "sketch",
) -> DataFrame:
    """Re-aggregate stored partials to a coarser grouping: union the
    sketches, then estimate. Input rows ∝ finer-grain groups (tiny);
    no raw data touched. The same shape answers date-range questions:
    filter the partials to the range, then merge."""
    return sketches.groupBy(*rollup_cols).agg(
        F.hll_sketch_estimate(F.hll_union_agg(sketch_col)).alias("approx_distinct"),
        F.sum("rows_in").cast("long").alias("rows_in"),
    )


# ---------------------------------------------------------------------------
# Count-min sketch (heavy hitters / frequency estimation)
# ---------------------------------------------------------------------------


def _md5_mod(key, i: int, modulus: int):
    """md5("i:key") → first 8 hex digits → long → mod ``modulus`` — the
    repo's ONE engine-portable per-hash-function idiom (sampling.py),
    shared by CMS buckets and Bloom bit positions so the two can never
    silently de-sync from each other or from the DuckDB oracles built
    against the expression."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{i}:"), key.cast("string"))), 1, 8),
            16,
            10,
        ).cast("long")
        % modulus
    )


def _cms_bucket(key, i: int, width: int):
    """Row-i bucket for a key (see _md5_mod)."""
    return _md5_mod(key, i, width)


def cms_build(
    df: DataFrame,
    key_col,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Count-min sketch of a key stream as a (row, col, cnt) table
    (≤ depth×width rows — KBs, whatever the input size).

    ONE pass, one combiner-friendly shuffle keyed on (row, col) — the
    explode emits ``depth`` rows per input but partial aggregation
    collapses them map-side to at most depth×width cells per task.
    Mergeable by construction: the sketch of a union is the (row, col)
    SUM of the parts — store per-partition/per-day partials and
    re-aggregate forever, the HLL pattern above for *frequencies*.
    Estimates are deterministic (md5 buckets, exact integer counts):
    est(k) = min over rows of cnt[row, bucket(row, k)] ≥ true count,
    with the classic (ε=e/width, δ=e^−depth) overcount bound."""
    key = key_col if not isinstance(key_col, str) else F.col(key_col)
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"), _cms_bucket(key, i, width).alias("col")
            )
            for i in range(depth)
        ]
    )
    return (
        df.select(F.explode(cells).alias("s"))
        .groupBy(F.col("s.row").alias("row"), F.col("s.col").alias("col"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    keys: DataFrame,
    cms: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-query the sketch for each key in ``keys``: min over the
    depth rows of the key's bucket count. The probe side fans out to
    ``depth`` rows per key and equi-joins the tiny sketch (broadcast);
    buckets never touched by any key count as 0."""
    key = F.col(key_col)
    probes = keys.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"), _cms_bucket(key, i, width).alias("col")
                    )
                    for i in range(depth)
                ]
            )
        ).alias("s"),
    ).select(key_col, F.col("s.row").alias("row"), F.col("s.col").alias("col"))
    joined = probes.join(F.broadcast(cms), ["row", "col"], "left")
    return joined.groupBy(key_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("est")
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch — the hash-portable alternative
# ---------------------------------------------------------------------------


def kmv_sketch(
    df: DataFrame,
    group_cols: tuple[str, ...],
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group KMV distinct sketch (Bar-Yossef et al. 2002): the k
    smallest DISTINCT 60-bit md5-derived hashes of ``value_col``. Unlike
    the HLL binaries above, every byte of this sketch is reproducible by
    any engine with md5 — so the sketch *itself* (not just its estimate)
    is cross-engine hash-certifiable, the same portability discipline as
    the count-min sketch and the MinHash signatures.

    Mergeable: union two groups' sketches and re-take the k smallest —
    identical to sketching the concatenated input (set-min commutes with
    union; asserted in tests). Scale shape: distinct-hash shuffle (16 B
    keys, combiner-friendly) then one per-group top-k window — the
    WindowGroupLimit rank pushdown keeps per-group state at k rows,
    never the distinct-value list.

    Returns (group_cols..., h, rn): the sketch as rows, rn ∈ [1, k]
    ascending by hash."""
    from etl_demos_spark.operators.dedup import md5_long
    from pyspark.sql import Window as W

    d = (
        df.select(*group_cols, F.col(value_col).cast("string").alias("__v"))
        .select(*group_cols, md5_long(F.col("__v")).alias("h"))
        .distinct()
    )
    wnd = W.partitionBy(*group_cols).orderBy("h")
    return (
        d.withColumn("rn", F.row_number().over(wnd).cast("long"))
        .filter(F.col("rn") <= k)
    )


def kmv_estimate(
    sketch: DataFrame,
    group_cols: tuple[str, ...],
    k: int = 64,
) -> DataFrame:
    """Distinct-count estimate from a KMV sketch: if the group holds
    fewer than k hashes the count is EXACT (= rows kept); otherwise the
    unbiased estimator (k-1) / U_(k) with U_(k) = kth_min / 2^60.
    Rounded to 4 decimals so both engines' double division hashes
    identically. Error ~ 1/sqrt(k-2) (~13% at k=64; grow k for
    precision — the sketch stays k rows per group)."""
    two60 = float(1 << 60)
    agg = sketch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.max("h").alias("kth"),
    )
    est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) / (F.col("kth").cast("double") / F.lit(two60))
    )
    return agg.select(
        *group_cols,
        "n_kept",
        F.round(est, 4).alias("est_distinct"),
    )


# ---------------------------------------------------------------------------
# Portable HyperLogLog — md5-derived registers, engine-reproducible
# ---------------------------------------------------------------------------

HLL_P = 8                       # 2^8 = 256 registers
_HLL_REM_BITS = 60 - HLL_P      # 52 rho bits from the 60-bit md5 hash
_HLL_MAX_RHO = _HLL_REM_BITS + 1


def hll_registers(
    df: DataFrame,
    group_cols: tuple[str, ...],
    value_col: str,
    p: int = HLL_P,
) -> DataFrame:
    """Per-group HyperLogLog registers (Flajolet et al. 2007) built from
    the portable 60-bit md5 hash — every register value is an exact
    integer any engine reproduces (``CAST('0x'||substr(md5(v),1,15) AS
    BIGINT)``, bucket = h % m, rho = 1 + leading zeros of the remaining
    60−p bits via ``length(bin(rem))`` — both Spark and DuckDB render
    ``bin`` without leading zeros), unlike the DataSketches binaries in
    :func:`distinct_sketches` whose estimate can only be bound-checked.

    Scale shape: ONE combiner-friendly hash agg — partial max(rho) per
    (group, bucket) map-side, so the shuffle carries ≤ m rows per group
    per partition regardless of input rows. Mergeable by max (union of
    register tables == registers of the union; property-tested).

    Returns (group_cols..., bucket, r) with r = max rho ∈ [1, 61−p]."""
    from etl_demos_spark.operators.dedup import md5_long

    m = 1 << p
    rem_bits = 60 - p
    h = md5_long(F.col(value_col).cast("string"))
    rem = F.shiftrightunsigned(h, p)
    rho = F.when(rem == 0, F.lit(rem_bits + 1)).otherwise(
        F.lit(rem_bits + 1) - F.length(F.bin(rem))
    )
    return (
        df.select(
            *group_cols,
            (h % m).cast("long").alias("bucket"),
            rho.cast("long").alias("rho"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("r"))
    )


def hll_estimate(
    registers: DataFrame,
    group_cols: tuple[str, ...],
    p: int = HLL_P,
) -> DataFrame:
    """Cardinality estimate from portable HLL registers, with the
    harmonic sum kept EXACT: each register contributes the integer
    2^(rmax − r) (rmax = 61−p ≥ r), absent registers contribute
    2^rmax each — Σ < m·2^rmax < 2^63, so ``s_int`` is an exact int64
    both engines agree on bit-for-bit; doubles appear only in the final
    one-division estimate. Standard small-range correction: linear
    counting m·ln(m/zeros) when E ≤ 2.5m and zeros > 0. ``est`` is
    rounded to 4 decimals (the KMV discipline) so the division and the
    libm ln hash identically across engines.

    Returns (group_cols..., zeros, s_int, est)."""
    m = 1 << p
    rmax = 61 - p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("present"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {rmax} - r)"))
        .cast("long")
        .alias("s_present"),
    )
    zeros = (F.lit(m) - F.col("present")).cast("long")
    s_int = (
        F.col("s_present")
        + zeros * F.lit(1 << rmax).cast("long")
    ).cast("long")
    raw = (
        F.lit(alpha * m * m)
        * F.lit(float(1 << rmax))
        / F.col("s_int").cast("double")
    )
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (F.col("zeros") > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("zeros").cast("double")),
    ).otherwise(raw)
    return (
        agg.select(*group_cols, zeros.alias("zeros"), s_int.alias("s_int"))
        .select(*group_cols, "zeros", "s_int", F.round(est, 4).alias("est"))
    )


def kmv_set_estimate(
    sk_a: DataFrame,
    sk_b: DataFrame,
    join_cols: tuple[str, ...],
    k: int = 64,
) -> DataFrame:
    """Set-operation estimates from two KMV sketches (Beyer et al.,
    SIGMOD 2007): the scale answer to "how much do two corpora
    overlap" — no distinct-join over raw data, just the two k-row
    sketches. Combine both hash sets, keep the k smallest of the
    union per group; with u_k = kth/2^60 and K∩ = survivors present
    in BOTH sketches:

        |A∪B| ≈ (k−1)/u_k       (exact = survivor count below k)
        ρ = K∩ / kept           (Jaccard estimate; exact below k)
        |A∩B| ≈ ρ · |A∪B|

    Everything is deterministic integer/md5 state plus one rounded
    division, so the estimates themselves are cross-engine
    hash-certifiable — same discipline as :func:`kmv_estimate`.

    Scale shape: a k-row-per-group full-outer join + one windowed
    top-k — input ∝ sketches, never the underlying sets. Groups
    present in only one sketch degrade gracefully (K∩ = 0).

    Returns (join_cols..., kept, k_inter, jacc, est_union,
    est_inter)."""
    from pyspark.sql import Window as W

    a = sk_a.select(*join_cols, "h").withColumn("in_a", F.lit(1))
    b = sk_b.select(*join_cols, "h").withColumn("in_b", F.lit(1))
    m = a.join(b, [*join_cols, "h"], "full_outer").select(
        *join_cols,
        "h",
        F.coalesce("in_a", F.lit(0)).alias("in_a"),
        F.coalesce("in_b", F.lit(0)).alias("in_b"),
    )
    wnd = W.partitionBy(*join_cols).orderBy("h")
    topk = m.withColumn("rn", F.row_number().over(wnd)).filter(
        F.col("rn") <= k
    )
    two60 = float(1 << 60)
    agg = topk.groupBy(*join_cols).agg(
        F.count(F.lit(1)).cast("long").alias("kept"),
        F.max("h").alias("kth"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("k_inter"),
    )
    est_union = F.when(
        F.col("kept") < k, F.col("kept").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) / (F.col("kth").cast("double") / F.lit(two60))
    )
    jacc = F.col("k_inter").cast("double") / F.col("kept").cast("double")
    return agg.select(
        *join_cols,
        "kept",
        "k_inter",
        F.round(jacc, 4).alias("jacc"),
        F.round(est_union, 4).alias("est_union"),
        F.round(jacc * est_union, 4).alias("est_inter"),
    )


# ---------------------------------------------------------------------------
# Bloom filter (membership pre-filter)
# ---------------------------------------------------------------------------
#
# The 100 TB pattern: a set of "interesting" keys (eval-set fingerprints
# for decontamination, deny-listed URLs, already-seen document ids) is
# compressed to a few KB of bitmap that BROADCASTS to every executor, so
# a full-corpus scan can drop non-candidates without a shuffle or a join
# against the key set. Only the (tiny) candidate stream proceeds to the
# exact check — the same two-phase shape Spark's own runtime bloom-join
# pruning uses (reference point: InjectRuntimeFilter), here exposed as a
# user-level, persistable, MERGEABLE artifact: word-wise bit_or of two
# bloom tables is exactly the bloom of the union of their key sets, so
# per-day/per-shard partials re-aggregate without re-reading keys.
#
# Portability: bit positions come from the repo's md5 idiom
# (md5("i:key") first 8 hex digits → long, mod n_bits), and the bitmap
# is packed as 32-bit words carried in BIGINTs — DuckDB's `<<` is
# overflow-checked at bit 63, so 64-bit words would trap on the sign
# bit; 32-bit words keep every value positive and bit-identical in both
# engines. A DuckDB oracle therefore reproduces the filter — words,
# probe verdicts, false positives — bit-for-bit, and the driver hash
# certifies the sketch math itself (the cms_build discipline).


def _bloom_pos(key, i: int, n_bits: int):
    """Hash-i bit position for a key (see _md5_mod)."""
    return _md5_mod(key, i, n_bits)


def bloom_build(
    df: DataFrame,
    key_col,
    n_bits: int = 4096,
    n_hashes: int = 4,
) -> DataFrame:
    """Build a bloom bitmap over ``key_col`` as a (word, bits) table of
    n_bits/32 rows. One exploded pass → word-keyed bit_or: the OR is
    computed map-side per partition (combiner agg), so the shuffle
    carries at most n_bits/32 rows per partition regardless of input
    size. Absent words mean 0 (probe side coalesces)."""
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    pos = F.explode(
        F.array(*[_bloom_pos(key, i, n_bits) for i in range(n_hashes)])
    ).alias("p")
    return (
        df.select(pos)
        .select(
            F.shiftright("p", 5).alias("word"),
            # 2^bit for bit<32 is exact in a double; F.shiftleft needs a
            # literal shift amount, so pow is the column-friendly form
            F.pow(F.lit(2.0), F.col("p").bitwiseAND(F.lit(31)))
            .cast("long")
            .alias("bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("bit").alias("bits"))
    )


def bloom_probe(
    df: DataFrame,
    bloom: DataFrame,
    key_col,
    n_bits: int = 4096,
    n_hashes: int = 4,
    flag_col: str = "bloom_hit",
) -> DataFrame:
    """Append ``flag_col`` (1 = maybe member, 0 = definitely not) to
    ``df``. No false negatives ever; false-positive rate ≈
    (1 − e^(−kn/m))^k. The bloom side is ≤ n_bits/32 rows →
    broadcast-hinted, so at corpus scale this is a map-only pass over
    ``df`` (zero shuffle of the probe stream) — the property that makes
    it a valid 100 TB pre-filter."""
    from pyspark.sql import functions as _F

    key = F.col(key_col) if isinstance(key_col, str) else key_col
    hit = None
    probed = df
    for i in range(n_hashes):
        p = _bloom_pos(key, i, n_bits)
        b = bloom.select(
            F.col("word").alias(f"__w{i}"), F.col("bits").alias(f"__b{i}")
        )
        probed = probed.join(
            _F.broadcast(b),
            F.shiftright(p, 5) == F.col(f"__w{i}"),
            "left",
        )
        this_hit = (
            F.coalesce(F.col(f"__b{i}"), F.lit(0)).bitwiseAND(
                F.pow(F.lit(2.0), p.bitwiseAND(F.lit(31))).cast("long")
            )
            != 0
        )
        hit = this_hit if hit is None else (hit & this_hit)
    return probed.withColumn(flag_col, hit.cast("int")).drop(
        *[c for i in range(n_hashes) for c in (f"__w{i}", f"__b{i}")]
    )


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union two bloom bitmaps: full-outer word join + OR. Exactly the
    bloom of the union of the key sets (property-tested), so per-shard
    partials compose without re-reading keys."""
    return (
        a.select("word", F.col("bits").alias("ba"))
        .join(b.select("word", F.col("bits").alias("bb")), "word", "full_outer")
        .select(
            "word",
            (
                F.coalesce("ba", F.lit(0)).bitwiseOR(F.coalesce("bb", F.lit(0)))
            ).alias("bits"),
        )
    )


def bottomk_sample(
    df: DataFrame,
    group_cols: tuple[str, ...],
    value_col: str,
    key_col,
    k: int = 256,
) -> DataFrame:
    """Per-group bottom-k row sample (Cohen & Kaplan 2007): the k rows
    whose md5-derived 60-bit hash of a UNIQUE row key is smallest. A
    deterministic uniform sample without replacement — the hash is the
    'random' tag, so every engine, run, backfill, and shard picks the
    IDENTICAL sample (the md5 discipline of kmv_sketch, applied to row
    sampling instead of distinct counting).

    Mergeable: bottom-k of the union == bottom-k over each shard's
    bottom-k, re-ranked (set-min commutes with union) — per-shard
    partials compose without re-reading rows, the property that makes
    the sketch a one-pass corpus operator at 100 TB. Scale shape: one
    combiner-friendly (group, hash) shuffle + one per-group top-k
    window (WindowGroupLimit keeps per-group state at k rows).

    The key string rides along as ``kk`` and breaks hash ties in every
    ordering: at corpus scale a 60-bit collision straddling rank k is a
    birthday certainty, and without a total order the 'identical
    everywhere' guarantee would silently fail exactly there.

    Returns (group_cols..., kk, h, rn, value_col) with rn ∈ [1, k]
    ascending by (hash, key).
    """
    from etl_demos_spark.operators.dedup import md5_long
    from pyspark.sql import Window as W

    key = key_col if not isinstance(key_col, str) else F.col(key_col)
    d = df.select(
        *group_cols,
        key.cast("string").alias("kk"),
        F.col(value_col),
    ).select(
        *group_cols, "kk", md5_long(F.col("kk")).alias("h"), F.col(value_col)
    )
    wnd = W.partitionBy(*group_cols).orderBy("h", "kk")
    return d.withColumn("rn", F.row_number().over(wnd).cast("long")).filter(
        F.col("rn") <= k
    )


def sample_quantiles(
    sample: DataFrame,
    group_cols: tuple[str, ...],
    value_col: str,
    probs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
) -> DataFrame:
    """Per-group quantile estimates from a ``bottomk_sample``: the
    p-quantile estimate is the sample value at rank ``ceil(p·m)`` (m =
    group sample size; type-1 / lower-step quantile, exactly
    SQL-replayable — no interpolation arithmetic to diverge on). With a
    uniform size-k sample the rank error is O(1/√k) of the population,
    the standard sample-quantile bound, independent of corpus size.

    Returns (group_cols..., p, est) — one row per group × prob.
    """
    from pyspark.sql import Window as W

    wnd = W.partitionBy(*group_cols).orderBy(value_col, "h", "kk")
    m = W.partitionBy(*group_cols)
    ranked = sample.select(
        *group_cols,
        "h",
        F.col(value_col),
        F.row_number().over(wnd).cast("long").alias("vr"),
        F.count(F.lit(1)).over(m).cast("long").alias("m"),
    )
    probe = F.explode(
        F.array(*[F.lit(float(p)) for p in probs])
    ).alias("p")
    return (
        ranked.select(*group_cols, "vr", "m", F.col(value_col), probe)
        .filter(F.col("vr") == F.ceil(F.col("p") * F.col("m")).cast("long"))
        .select(*group_cols, "p", F.col(value_col).alias("est"))
    )


def bottomk_merge(
    store: DataFrame,
    batch: DataFrame,
    group_cols: tuple[str, ...],
    k: int = 256,
) -> DataFrame:
    """Fold a new shard/micro-batch of bottom-k rows into an existing
    store: union + re-take the k smallest hashes per group. Because
    set-min commutes with union (property-pinned for bottomk_sample),
    the merged store is IDENTICAL to sampling the concatenated input —
    the foreachBatch streaming form and the per-shard rollup form are
    the same operator. Inputs MUST carry the (h, kk) pair exactly as
    produced by ``bottomk_sample`` — kk is the tie-break that makes the
    bottom-k order total (see its docstring); a store persisted without
    it cannot be folded. ``rn`` is recomputed."""
    from pyspark.sql import Window as W

    cols = [c for c in store.columns if c != "rn"]
    wnd = W.partitionBy(*group_cols).orderBy("h", "kk")
    return (
        store.select(*cols)
        .unionByName(batch.select(*cols))
        # idempotent fold: kk is a unique row key within a group, so a
        # replayed micro-batch (at-least-once foreachBatch) re-delivers
        # (group, kk) rows already in the store — ranked twice they
        # would burn two of the k slots and permanently bias the sample
        .dropDuplicates([*group_cols, "kk"])
        .withColumn("rn", F.row_number().over(wnd).cast("long"))
        .filter(F.col("rn") <= k)
    )
