"""Deduplication family: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale design (the whole point of these operators):

- **Exact**: hash-groupBy on a normalized fingerprint — one shuffle on the
  hash, combiner-friendly, no skew (md5 is uniform). The canonical-doc
  choice (min doc_id) is a deterministic tie-break.
- **N-gram Jaccard**: exact pairwise similarity via an inverted index
  (doc, shingle) self-join. Quadratic in the worst case — used as the
  *oracle* for the approximate paths and for small blocked domains.
- **MinHash + LSH**: the 100 TB path. k independent min-hashes per doc
  (one pass, xxhash64 with k seeds — JVM built-in, no UDF), banded into
  b bands of r rows; docs sharing a band-hash land in the same bucket →
  candidate pairs ∝ true near-dups, not n². Collision probability for
  Jaccard s is 1-(1-s^r)^b (the standard S-curve; Leskovec MMDS ch.3).
- **SimHash**: 64-bit weighted-projection signature; near-dups differ in
  ≤ h bits. Hamming-ball join done by splitting the signature into
  (h+1) chunks (pigeonhole: some chunk matches exactly) — equi-join on
  chunk value, verify Hamming distance on match.

Everything below is pure DataFrame ops — shuffles only on
shingle/band/chunk keys, never a cross join.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from etl_demos_spark.operators.text import WORD_RE, fingerprint


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one canonical row (min id) per normalized-text fingerprint."""
    fp = fingerprint(text_col).alias("__fp")
    winners = (
        df.select(F.col(id_col), fp)
        .groupBy("__fp")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return df.join(winners, id_col, "left_semi")


def duplicate_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-fingerprint multiplicity — the dedup report."""
    return (
        df.select(fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_copies"))
    )


# ---------------------------------------------------------------------------
# Shingling + exact n-gram Jaccard (inverted-index join)
# ---------------------------------------------------------------------------


def word_shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct word n-grams as an array<string> (built-ins only:
    tokenize → transform over sliding offsets → distinct)."""
    c = F.col(text) if isinstance(text, str) else text
    tokens = F.regexp_extract_all(F.lower(c), F.lit(WORD_RE), F.lit(0))
    count = F.greatest(F.size(tokens) - F.lit(n - 1), F.lit(0))
    grams = F.transform(
        F.sequence(F.lit(0), count - 1),
        lambda i: F.concat_ws(" ", F.slice(tokens, i + 1, n)),
    )
    return F.when(count > 0, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    block_col: str | None = None,
) -> DataFrame:
    """Exact Jaccard-similar pairs via inverted index:
    explode shingles → self-join on shingle (+ optional blocking key) →
    count intersections → |A∪B| = |A|+|B|−|A∩B|.

    Output: (id_a, id_b, jaccard) with id_a < id_b, jaccard ≥ threshold.
    """
    block = [block_col] if block_col else []
    docs = df.select(
        F.col(id_col).alias("id"),
        *[F.col(b) for b in block],
        word_shingles(text_col, n).alias("sh"),
    ).withColumn("n_sh", F.size("sh"))
    index = docs.select("id", *block, "n_sh", F.explode("sh").alias("g"))
    left = index
    right = index.select(
        F.col("id").alias("id2"),
        *[F.col(b).alias(f"{b}2") for b in block],
        F.col("n_sh").alias("n_sh2"),
        F.col("g").alias("g2"),
    )
    on = (left["g"] == right["g2"]) & (left["id"] < right["id2"])
    for b in block:
        on = on & (left[b] == right[f"{b}2"])
    inter = (
        left.join(right, on)
        .groupBy("id", "id2", "n_sh", "n_sh2")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    jac = F.col("n_inter") / (F.col("n_sh") + F.col("n_sh2") - F.col("n_inter"))
    return (
        inter.select(
            F.col("id").alias("id_a"),
            F.col("id2").alias("id_b"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signature(shingles: Column, num_hashes: int = 128) -> Column:
    """k min-hashes in one expression: min(xxhash64(shingle, seed_i)).
    Empty shingle sets get a sentinel signature (never collides)."""
    sig = F.array(
        *[
            F.array_min(F.transform(shingles, lambda g: F.xxhash64(g, F.lit(i))))
            for i in range(num_hashes)
        ]
    )
    return F.when(F.size(shingles) > 0, sig)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 128,
    bands: int = 32,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-dup candidate pairs via banded MinHash-LSH, verified with the
    signature-estimated Jaccard (matching fraction of the k min-hashes).

    Shuffles: one on band-hash (bucket join), one on (id_a, id_b) dedup of
    candidates. Never materializes n² pairs.
    """
    rows = num_hashes // bands
    docs = df.select(
        F.col(id_col).alias("id"), word_shingles(text_col, n).alias("sh")
    ).filter(F.size("sh") > 0)
    sigs = docs.select("id", minhash_signature(F.col("sh"), num_hashes).alias("sig"))
    banded = sigs.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",", *[F.element_at("sig", b * rows + r + 1) for r in range(rows)]
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("id", "sig", F.col("bk.band").alias("band"), F.col("bk.bucket").alias("bucket"))
    right = banded.select(
        F.col("id").alias("id2"), F.col("sig").alias("sig2"), "band", "bucket"
    )
    cands = (
        banded.join(right, ["band", "bucket"])
        .filter(F.col("id") < F.col("id2"))
        .select("id", "id2", "sig", "sig2")
        .dropDuplicates(["id", "id2"])
    )
    est = F.size(
        F.filter(
            F.zip_with("sig", "sig2", lambda a, b: a == b), lambda x: x
        )
    ) / F.lit(float(num_hashes))
    return (
        cands.select(
            F.col("id").alias("id_a"),
            F.col("id2").alias("id_b"),
            est.alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(shingles: Column) -> Column:
    """64-bit SimHash: sign of per-bit vote sums over feature hashes.
    Built-ins only: for each bit, count features with that bit set; bit in
    signature iff count > n/2 (strict majority; deterministic)."""
    hashes = F.transform(shingles, lambda g: F.xxhash64(g))
    n = F.size(shingles)
    bits = [
        F.when(
            F.size(
                F.filter(hashes, lambda h: h.bitwiseAND(F.lit(1 << i)) != 0)
            )
            * 2
            > n,
            F.lit(1 << i),
        ).otherwise(F.lit(0))
        for i in range(63)  # stay within signed long; bit 63 unused
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    max_hamming: int = 3,
) -> DataFrame:
    """Pairs within a Hamming ball via pigeonhole chunk join: split the
    64-bit signature into max_hamming+1 chunks; any pair within distance
    max_hamming agrees on ≥1 chunk → equi-join per chunk, verify exactly.
    """
    k = max_hamming + 1
    chunk_bits = 64 // k
    docs = df.select(
        F.col(id_col).alias("id"), word_shingles(text_col, n).alias("sh")
    ).filter(F.size("sh") > 0)
    sigs = docs.select("id", simhash64(F.col("sh")).alias("sig"))
    chunked = sigs.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk"),
                        F.shiftrightunsigned("sig", i * chunk_bits)
                        .bitwiseAND(F.lit((1 << chunk_bits) - 1))
                        .alias("val"),
                    )
                    for i in range(k)
                ]
            )
        ).alias("ck"),
    ).select("id", "sig", F.col("ck.chunk").alias("chunk"), F.col("ck.val").alias("val"))
    right = chunked.select(
        F.col("id").alias("id2"), F.col("sig").alias("sig2"), "chunk", "val"
    )
    return (
        chunked.join(right, ["chunk", "val"])
        .filter(F.col("id") < F.col("id2"))
        .select("id", "id2", "sig", "sig2")
        .dropDuplicates(["id", "id2"])
        .select(
            F.col("id").alias("id_a"),
            F.col("id2").alias("id_b"),
            hamming64(F.col("sig"), F.col("sig2")).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
