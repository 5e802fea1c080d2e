"""Property-based tests (hypothesis): engine operators vs first-principles
Python references on arbitrary inputs. Few examples per property — each
example is a Spark job — but unconstrained shapes catch what fixed
fixtures don't."""

from __future__ import annotations

import pytest

import datetime as dt
from decimal import Decimal

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_demos_spark.operators.keys import dedup_first
from etl_demos_spark.operators.skew import salted_sum
from etl_demos_spark.streaming.windows import sessionize_batch

SET = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

keys = st.integers(min_value=0, max_value=5)
cents = st.integers(min_value=-10_000, max_value=10_000)


@given(rows=st.lists(st.tuples(keys, cents), min_size=1, max_size=60))
@SET
def test_salted_sum_equals_plain_sum(spark, rows):
    df = spark.createDataFrame(
        [(k, Decimal(c) / 100) for k, c in rows], "k long, v decimal(12,2)"
    )
    got = {
        r["k"]: (r["n_rows"], r["sum_v"])
        for r in salted_sum(df, ["k"], {"sum_v": F.sum("v")}, buckets=4).collect()
    }
    expect: dict[int, list] = {}
    for k, c in rows:
        e = expect.setdefault(k, [0, Decimal(0)])
        e[0] += 1
        e[1] += Decimal(c) / 100
    assert got == {k: (n, s) for k, (n, s) in expect.items()}


@given(rows=st.lists(st.tuples(keys, st.integers(0, 10**6)), min_size=1, max_size=50))
@SET
def test_dedup_first_keeps_min_per_key(spark, rows):
    uniq = list({(k, v) for k, v in rows})
    df = spark.createDataFrame(uniq, "k long, v long")
    out = dedup_first(df, ["k"], ["v"]).collect()
    got = {r["k"]: r["v"] for r in out}
    expect = {}
    for k, v in uniq:
        expect[k] = min(v, expect.get(k, v))
    assert got == expect
    assert len(out) == len(expect)  # exactly one row per key


@given(
    offsets=st.lists(st.integers(min_value=0, max_value=7200), min_size=1, max_size=40)
)
@SET
def test_sessionize_matches_python_reference(spark, offsets):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, 1, t0 + dt.timedelta(seconds=s)) for i, s in enumerate(sorted(set(offsets)))
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    out = sessionize_batch(df, gap="30 minutes")
    got = {r["event_id"]: r["session_seq"] for r in out.collect()}

    seq, prev = 0, None
    expect = {}
    for i, (eid, _, ts) in enumerate(rows):
        if prev is None or (ts - prev) > dt.timedelta(minutes=30):
            seq += 1
        expect[eid] = seq
        prev = ts
    assert got == expect


@given(rows=st.lists(st.tuples(keys, cents), min_size=1, max_size=40))
@SET
def test_decimal_sum_is_exact(spark, rows):
    """The money_sum convention: decimal aggregation must equal exact
    Decimal arithmetic regardless of partitioning/order."""
    df = spark.createDataFrame(
        [(k, c / 100.0) for k, c in rows], "k long, v double"
    ).repartition(7)
    got = {
        r["k"]: r["s"]
        for r in df.groupBy("k")
        .agg(F.sum(F.col("v").cast("decimal(12,2)")).cast("double").alias("s"))
        .collect()
    }
    expect: dict[int, Decimal] = {}
    for k, c in rows:
        expect[k] = expect.get(k, Decimal(0)) + Decimal(c) / 100
    assert got == {k: float(v) for k, v in expect.items()}


_texts = st.lists(
    st.text(alphabet="ab C1 .-", min_size=0, max_size=40), min_size=1, max_size=12
)


@given(texts=_texts, n=st.integers(2, 4))
@SET
def test_exploded_ngrams_match_python_reference(spark, texts, n):
    """Codegen'd gram rows == first-principles Python n-grams on
    arbitrary text (mixed case, digits, punctuation, empty/short docs)."""
    import re

    from etl_demos_spark.operators.text import exploded_word_ngrams

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = sorted(
        (r["doc_id"], r["gram"])
        for r in exploded_word_ngrams(df, ("doc_id",), "text", n).collect()
    )
    expect = []
    for i, t in enumerate(texts):
        toks = re.findall("[a-z0-9]+", t.lower())
        expect += [(i, " ".join(toks[j : j + n])) for j in range(len(toks) - n + 1)]
    assert got == sorted(expect)


# ---------------------------------------------------------------------------
# BPE learning / encoding vs the pure-Python reference
# ---------------------------------------------------------------------------

_words = st.lists(
    st.text(alphabet="abcde ", min_size=1, max_size=12), min_size=1, max_size=8
)


@given(texts=_words, n_merges=st.integers(1, 8))
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_bpe_learn_matches_reference_on_arbitrary_corpora(spark, texts, n_merges):
    from etl_demos_spark.operators import bpe

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    assert bpe.learn_bpe_merges(df, n_merges=n_merges) == bpe.learn_bpe_reference(
        texts, n_merges=n_merges
    )


@given(texts=_words)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_bpe_encoders_agree_on_arbitrary_corpora(spark, texts):
    from etl_demos_spark.operators import bpe

    merges = bpe.learn_bpe_reference(texts, n_merges=6)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    udf = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe.apply_merges(df, merges, use_udf=True).collect()
    }
    expr = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe.apply_merges(df, merges, use_udf=False).collect()
    }
    assert udf == expr


# ---------------------------------------------------------------------------
# Fuzzy join vs a first-principles Jaccard
# ---------------------------------------------------------------------------


@given(
    lt=st.lists(st.text(alphabet="ab c", min_size=5, max_size=30), min_size=1, max_size=5),
    rt=st.lists(st.text(alphabet="ab c", min_size=5, max_size=30), min_size=1, max_size=5),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_fuzzy_join_matches_python_jaccard(spark, lt, rt):
    import re as _re

    from etl_demos_spark.operators import linkage

    def grams(t):
        toks = _re.findall("[a-z0-9]+", t.lower())
        return {" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)}

    l = spark.createDataFrame(list(enumerate(lt)), "doc_id long, text string")
    r = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(rt)], "doc_id long, text string"
    )
    got = {
        (x["id_a"], x["id_b"]): x["jaccard"]
        for x in linkage.fuzzy_join(l, r, "doc_id", threshold=0.2, n=2).collect()
    }
    want = {}
    for i, ta in enumerate(lt):
        for j, tb in enumerate(rt):
            ga, gb = grams(ta), grams(tb)
            if not ga or not gb:
                continue
            jac = len(ga & gb) / len(ga | gb)
            if jac >= 0.2 and len(ga & gb) > 0:
                want[(i, 100 + j)] = jac
    assert set(got) == set(want)
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-12


@given(
    a=st.lists(st.integers(min_value=0, max_value=300), max_size=60),
    b=st.lists(st.integers(min_value=0, max_value=300), max_size=60),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_kmv_sketch_merges_like_union(spark, a, b):
    """KMV mergeability: union two groups' sketches and re-take the k
    smallest ≡ sketching the concatenated input (set-min commutes with
    union) — the property that makes per-day partial sketches safe to
    roll up without re-reading raw data."""
    from pyspark.sql import Window as W

    from etl_demos_spark.operators.sketches import kmv_sketch

    k = 8
    da = spark.createDataFrame([("g", v) for v in a] or [("g", -1)], "g string, v long")
    db = spark.createDataFrame([("g", v) for v in b] or [("g", -1)], "g string, v long")
    ska = kmv_sketch(da, ("g",), "v", k=k).select("g", "h")
    skb = kmv_sketch(db, ("g",), "v", k=k).select("g", "h")
    wnd = W.partitionBy("g").orderBy("h")
    merged = (
        ska.unionByName(skb)
        .distinct()
        .withColumn("rn", F.row_number().over(wnd).cast("long"))
        .filter(F.col("rn") <= k)
    )
    whole = kmv_sketch(
        da.unionByName(db) if a or b else da, ("g",), "v", k=k
    )
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in whole.collect()
    }


def test_kmv_estimate_exact_below_k(spark):
    """Below k distinct values the estimator must return the EXACT
    distinct count (n_kept is the full distinct-hash set)."""
    from etl_demos_spark.operators.sketches import kmv_estimate, kmv_sketch

    rows = [("x", v % 10) for v in range(100)] + [("y", v % 3) for v in range(30)]
    df = spark.createDataFrame(rows, "g string, v long")
    sk = kmv_sketch(df, ("g",), "v", k=64)
    got = {r["g"]: (r["n_kept"], r["est_distinct"]) for r in
           kmv_estimate(sk, ("g",), k=64).collect()}
    assert got == {"x": (10, 10.0), "y": (3, 3.0)}


def test_kmv_estimate_tracks_true_cardinality(spark):
    """Above k the (k-1)/U_(k) estimator lands within the ~1/sqrt(k-2)
    error envelope of the true distinct count."""
    from etl_demos_spark.operators.sketches import kmv_estimate, kmv_sketch

    n_true = 5000
    df = spark.createDataFrame(
        [("g", v) for v in range(n_true)], "g string, v long"
    )
    sk = kmv_sketch(df, ("g",), "v", k=256)
    est = kmv_estimate(sk, ("g",), k=256).collect()[0]
    assert est["n_kept"] == 256
    assert abs(est["est_distinct"] - n_true) / n_true < 0.25


@given(
    a=st.lists(st.integers(min_value=0, max_value=500), max_size=60),
    b=st.lists(st.integers(min_value=0, max_value=500), max_size=60),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_hll_registers_merge_like_union(spark, a, b):
    """Portable-HLL mergeability: per-part register tables merged by
    MAX ≡ registers of the concatenated input (max commutes with
    union) — the property that makes per-day register partials safe to
    roll up without re-reading raw data."""
    from etl_demos_spark.operators.sketches import hll_registers

    da = spark.createDataFrame([("g", v) for v in a] or [("g", -1)], "g string, v long")
    db = spark.createDataFrame([("g", v) for v in b] or [("g", -1)], "g string, v long")
    ra = hll_registers(da, ("g",), "v")
    rb = hll_registers(db, ("g",), "v")
    merged = (
        ra.unionByName(rb)
        .groupBy("g", "bucket")
        .agg(F.max("r").alias("r"))
    )
    whole = hll_registers(
        da.unionByName(db) if a or b else da, ("g",), "v"
    )
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in whole.collect()
    }


def test_hll_registers_match_python_reference(spark):
    """Register values pinned to a first-principles Python md5
    reference (bucket = h % 256, rho = 1 + leading zeros of the
    remaining 52 bits), and the estimate lands within 3/sqrt(256)
    ≈ 19% of truth on a 5k-distinct input (well past linear counting)."""
    import hashlib

    from etl_demos_spark.operators.sketches import hll_estimate, hll_registers

    vals = list(range(5000))
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v long")
    regs = {
        (r["bucket"]): r["r"]
        for r in hll_registers(df, ("g",), "v").collect()
    }
    ref: dict[int, int] = {}
    for v in vals:
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
        bucket, rem = h % 256, h >> 8
        rho = 53 if rem == 0 else 53 - rem.bit_length()
        ref[bucket] = max(ref.get(bucket, 0), rho)
    assert regs == ref
    est = hll_estimate(hll_registers(df, ("g",), "v"), ("g",)).collect()[0]
    assert abs(est["est"] - 5000) / 5000 < 0.19
    assert est["zeros"] == 256 - len(ref)


def test_hll_estimate_linear_counting_small_range(spark):
    """Small cardinalities take the linear-counting branch and land
    within a few percent (m·ln(m/zeros) is near-exact when n << m)."""
    from etl_demos_spark.operators.sketches import hll_estimate, hll_registers

    df = spark.createDataFrame([("g", v % 40) for v in range(400)], "g string, v long")
    est = hll_estimate(hll_registers(df, ("g",), "v"), ("g",)).collect()[0]
    assert abs(est["est"] - 40) <= 4


def test_kmv_set_estimate_exact_below_k(spark):
    """Below k the combined hash set is complete, so Jaccard, union and
    intersection are all EXACT — checked against python set math."""
    from etl_demos_spark.operators.sketches import kmv_set_estimate, kmv_sketch

    A = set(range(0, 30))
    B = set(range(20, 45))
    da = spark.createDataFrame([("g", v) for v in A], "g string, v long")
    db = spark.createDataFrame([("g", v) for v in B], "g string, v long")
    k = 64
    out = kmv_set_estimate(
        kmv_sketch(da, ("g",), "v", k=k),
        kmv_sketch(db, ("g",), "v", k=k),
        ("g",), k=k,
    ).collect()[0]
    assert out["kept"] == len(A | B)
    assert out["k_inter"] == len(A & B)
    assert out["est_union"] == float(len(A | B))
    assert abs(out["est_inter"] - len(A & B)) < 1e-9
    assert abs(out["jacc"] - len(A & B) / len(A | B)) < 1e-4


def test_kmv_set_estimate_planted_overlap_accuracy(spark):
    """5k-element sets with 50% planted overlap: k=256 estimates land
    within ~3/sqrt(k) of truth for union, intersection, and Jaccard."""
    from etl_demos_spark.operators.sketches import kmv_set_estimate, kmv_sketch

    A = set(range(0, 5000))
    B = set(range(2500, 7500))
    da = spark.createDataFrame([("g", v) for v in A], "g string, v long")
    db = spark.createDataFrame([("g", v) for v in B], "g string, v long")
    k = 256
    out = kmv_set_estimate(
        kmv_sketch(da, ("g",), "v", k=k),
        kmv_sketch(db, ("g",), "v", k=k),
        ("g",), k=k,
    ).collect()[0]
    assert abs(out["est_union"] - 7500) / 7500 < 0.2
    assert abs(out["est_inter"] - 2500) / 2500 < 0.35
    assert abs(out["jacc"] - 2500 / 7500) < 0.12


@given(
    members=st.sets(st.integers(0, 10**6), min_size=1, max_size=40),
    probes=st.sets(st.integers(0, 10**6), min_size=1, max_size=40),
)
@SET
def test_bloom_has_no_false_negatives(spark, members, probes):
    """Every inserted key must probe hit=1 (the bloom guarantee that
    makes it a safe pre-filter: dropped rows are PROVABLY non-members).
    Probes outside the member set may hit (false positive) — allowed —
    but a miss must imply true non-membership."""
    from etl_demos_spark.operators.sketches import bloom_build, bloom_probe

    m = spark.createDataFrame([(k,) for k in members], "k long")
    p = spark.createDataFrame([(k,) for k in probes | members], "k long")
    bloom = bloom_build(m, "k", n_bits=256, n_hashes=3)
    got = {
        r["k"]: r["bloom_hit"]
        for r in bloom_probe(p, bloom, "k", n_bits=256, n_hashes=3).collect()
    }
    for k in members:
        assert got[k] == 1, f"false negative for inserted key {k}"
    for k, hit in got.items():
        if hit == 0:
            assert k not in members


@given(
    a=st.sets(st.integers(0, 10**6), min_size=1, max_size=30),
    b=st.sets(st.integers(0, 10**6), min_size=1, max_size=30),
)
@SET
def test_bloom_merge_equals_bloom_of_union(spark, a, b):
    """Word-wise OR of two blooms ≡ bloom of the union of the key sets
    (bit positions depend only on the key) — per-shard partials roll up
    without re-reading keys, the HLL/KMV mergeability discipline."""
    from etl_demos_spark.operators.sketches import bloom_build, bloom_merge

    da = spark.createDataFrame([(k,) for k in a], "k long")
    db = spark.createDataFrame([(k,) for k in b], "k long")
    merged = bloom_merge(
        bloom_build(da, "k", n_bits=256, n_hashes=3),
        bloom_build(db, "k", n_bits=256, n_hashes=3),
    )
    whole = bloom_build(da.unionByName(db), "k", n_bits=256, n_hashes=3)
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in whole.collect()
    }


@given(
    a=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000),
            st.integers(min_value=-50, max_value=50),
        ),
        max_size=80,
        unique_by=lambda t: t[0],
    ),
    b=st.lists(
        st.tuples(
            st.integers(min_value=10_001, max_value=20_000),
            st.integers(min_value=-50, max_value=50),
        ),
        max_size=80,
        unique_by=lambda t: t[0],
    ),
)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_bottomk_sample_merges_like_union(spark, a, b):
    """Bottom-k row sampling: folding per-shard samples through the
    REAL bottomk_merge (h, kk total order) ≡ bottom-k of the union
    (set-min commutes with union) — shard partials compose without
    re-reading rows, hash ties broken identically on both paths."""
    from etl_demos_spark.operators.sketches import bottomk_merge, bottomk_sample

    k = 8
    mk = lambda rows: spark.createDataFrame(
        [("g", i, v) for i, v in rows] or [("g", -1, 0)],
        "g string, id long, v long",
    )
    da, db = mk(a), mk(b)
    sa = bottomk_sample(da, ("g",), "v", "id", k=k)
    sb = bottomk_sample(db, ("g",), "v", "id", k=k)
    merged = bottomk_merge(sa, sb, ("g",), k=k).select("g", "kk", "h", "v")
    whole = bottomk_sample(
        da.unionByName(db) if a or b else da, ("g",), "v", "id", k=k
    ).select("g", "kk", "h", "v")
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in whole.collect()
    }


def test_sample_quantiles_exact_when_sample_is_population(spark):
    """With k ≥ |group| the bottom-k sample IS the population, so the
    type-1 sample quantile must equal the exact type-1 quantile."""
    from etl_demos_spark.operators.sketches import (
        bottomk_sample,
        sample_quantiles,
    )

    vals = [3.0, 1.0, 4.0, 1.5, 9.0, 2.6, 5.0, 3.5]  # 8 values
    df = spark.createDataFrame(
        [("g", i, v) for i, v in enumerate(vals)], "g string, id long, v double"
    )
    s = bottomk_sample(df, ("g",), "v", "id", k=100)
    got = {
        (r["p"]): r["est"]
        for r in sample_quantiles(s, ("g",), "v", probs=(0.25, 0.5, 1.0)).collect()
    }
    sv = sorted(vals)
    import math

    assert got == {
        0.25: sv[math.ceil(0.25 * 8) - 1],
        0.5: sv[math.ceil(0.5 * 8) - 1],
        1.0: sv[-1],
    }


# ---------------------------------------------------------------------------
# Rows-only determinism contract: the six queries without a DuckDB oracle
# are rows-only because SQL replay would diverge on FLOAT-FIXPOINT op
# ordering between engines — NOT because the Spark side is partition-
# sensitive. That claim becomes a tested invariant here: each query must
# return bit-identical rows when every partitioning knob the planner
# honors is changed (shuffle partitions 32 → 7, scan splits forced tiny).
# q_train_classifier additionally has a sequential-reference bit pin in
# tests/test_classifier.py; this covers the whole family uniformly.

import pytest as _pytest


def _stable_rows(df):
    def freeze(v):
        if isinstance(v, list):
            return tuple(freeze(x) for x in v)
        if isinstance(v, dict):
            return tuple(sorted((k, freeze(x)) for k, x in v.items()))
        return v

    return sorted((tuple(freeze(v) for v in row) for row in df.collect()),
                  key=repr)


@_pytest.mark.parametrize(
    "name",
    [
        "q_bpe_learn",
        "q_kmeans",
        "q_pq_search",
        "q_pca_project",
        "q_train_classifier",
        "q_approx_distinct",
    ],
)
def test_rows_only_queries_bit_stable_across_partitionings(spark, name):
    import etl_demos_spark.workload_ext  # noqa: F401
    from etl_demos_spark.workload import REGISTRY
    from tests.conftest import SF_DIR

    fn = REGISTRY[name].fn
    base = _stable_rows(fn(spark, SF_DIR))
    shuffle0 = spark.conf.get("spark.sql.shuffle.partitions")
    split0 = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(256 * 1024))
        alt = _stable_rows(fn(spark, SF_DIR))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", shuffle0)
        spark.conf.set("spark.sql.files.maxPartitionBytes", split0)
    assert len(base) == len(alt) and base == alt


def test_bottomk_merge_replayed_batch_is_idempotent(spark):
    """At-least-once foreachBatch re-delivers a micro-batch: folding the
    SAME batch twice must leave the store identical (kk is a unique row
    key — a duplicate must not burn two of the k slots)."""
    from etl_demos_spark.operators.sketches import bottomk_merge, bottomk_sample

    df = spark.createDataFrame(
        [(i % 2, i) for i in range(60)], "g long, v long"
    )
    store = bottomk_sample(df, ("g",), "v", "v", k=8)
    batch = bottomk_sample(
        spark.createDataFrame([(0, 1000 + i) for i in range(20)], "g long, v long"),
        ("g",), "v", "v", k=8,
    )
    once = bottomk_merge(store, batch, ("g",), k=8)
    twice = bottomk_merge(once, batch, ("g",), k=8)
    key = lambda r: (r["g"], r["kk"], r["rn"])
    assert sorted(map(key, once.collect())) == sorted(map(key, twice.collect()))


@given(
    batches=st.lists(
        st.lists(
            st.tuples(
                st.integers(0, 9),            # key (determines its partition)
                st.integers(0, 10**6),        # value
            ),
            min_size=1,
            max_size=8,
        ),
        min_size=1,
        max_size=4,
    )
)
@SET
@pytest.mark.slow
def test_merge_upsert_partitioned_equals_unpartitioned(spark, tmp_path_factory, batches):
    """The partition-scoped upsert must be row-for-row equivalent to the
    full-rewrite merge_upsert over ANY batch sequence (keys constrained
    to a fixed key→partition mapping, the primitive's contract)."""
    from etl_demos_spark.plans.incremental import merge_upsert, merge_upsert_partitioned

    base = tmp_path_factory.mktemp("mup")
    p_full = str(base / "full")
    p_part = str(base / "part")
    for batch in batches:
        # key determines partition (contract): day = key % 3
        rows = {}
        for k, v in batch:   # last write per key within a batch wins
            rows[k] = (k, f"d{k % 3}", v)
        df = spark.createDataFrame(
            list(rows.values()), "k long, day string, v long"
        )
        merge_upsert(spark, df, p_full, keys=["k"])
        merge_upsert_partitioned(spark, df, p_part, keys=["k"], partition_by=["day"])
    got_full = sorted(
        (r["k"], r["day"], r["v"]) for r in spark.read.parquet(p_full).collect()
    )
    got_part = sorted(
        (r["k"], r["day"], r["v"]) for r in spark.read.parquet(p_part).collect()
    )
    assert got_full == got_part


# ---------------------------------------------------------------------------
# Crash-injection over the staging-then-swap family (VERDICT r6 rec 6).
#
# The swap discipline (plans/incremental.swap_table + the per-partition
# variant) promises: a writer killed at ANY point leaves a state from
# which (a) recovery alone restores every partition to exactly-old or
# exactly-new content — never missing, never mixed — and (b) replaying
# the same batch converges to the no-crash result. Rounds 5/6 kept
# finding one-off gaps in hand-written crash tests; this mechanizes the
# search: shutil.move/rmtree are instrumented to raise after k mutations
# under the table root, and k sweeps EVERY step boundary until a run
# completes crash-free. Hypothesis varies the data; the boundary sweep
# is exhaustive per example. Covers all four callers: merge_upsert,
# merge_upsert_partitioned, compact, and the streaming near-dup store
# (streaming/dedup.near_dedup_batch_processor).
# ---------------------------------------------------------------------------

import shutil as _shutil_mod


class _InjectedCrash(RuntimeError):
    pass


class _crash_after:
    """Raise _InjectedCrash on the (n+1)-th shutil.move/rmtree whose
    target lives under ``root`` — i.e. kill the writer at step boundary
    n of the swap protocol. Unrelated shutil traffic is ignored.
    ``self.fired`` reports whether the run reached boundary n at all
    (False = the protocol has fewer than n+1 steps → sweep complete)."""

    def __init__(self, root: str, n: int):
        self.root, self.n, self.fired = str(root), n, False

    def _wrap(self, fn):
        def wrapped(path, *a, **kw):
            if str(path).startswith(self.root):
                if self.left <= 0:
                    self.fired = True
                    raise _InjectedCrash(f"boundary {self.n}: {fn.__name__}({path})")
                self.left -= 1
            return fn(path, *a, **kw)

        return wrapped

    def __enter__(self):
        self.left = self.n
        self._move, self._rmtree = _shutil_mod.move, _shutil_mod.rmtree
        _shutil_mod.move = self._wrap(self._move)
        _shutil_mod.rmtree = self._wrap(self._rmtree)
        return self

    def __exit__(self, *exc):
        _shutil_mod.move, _shutil_mod.rmtree = self._move, self._rmtree
        return False


def _rows_by_day(spark, path):
    out: dict = {}
    for r in spark.read.parquet(path).collect():
        out.setdefault(r["day"], set()).add((r["k"], r["day"], r["v"]))
    return out


def _no_siblings(path):
    import pathlib

    for suf in ("__staging", "__old", "__pstaging", "__pold"):
        assert not pathlib.Path(f"{path}{suf}").exists(), f"leftover {suf}"


def _sweep_crash_boundaries(spark, tmp_path, op, *, base_df, expected_of):
    """Shared harness: seed ``path`` with base_df via op (clean), compute
    the expected no-crash result on a pristine copy, then kill op at
    every shutil boundary on a restored copy, heal, assert old-or-new
    per partition, replay, assert convergence."""
    from etl_demos_spark.plans.incremental import (
        recover_interrupted_partition_swap,
        recover_interrupted_swap,
    )

    path = str(tmp_path / "t")
    snap = str(tmp_path / "snap")
    op(base_df, path)  # seed (clean)
    _shutil_mod.copytree(path, snap)
    base_parts = _rows_by_day(spark, path)

    # expected final state from a clean run on a pristine copy
    clean = str(tmp_path / "clean")
    _shutil_mod.copytree(snap, clean)
    expected_parts = expected_of(clean)

    k = 0
    while True:
        spark.catalog.clearCache()
        _shutil_mod.rmtree(path, ignore_errors=True)
        for suf in ("__staging", "__old", "__pstaging", "__pold"):
            _shutil_mod.rmtree(f"{path}{suf}", ignore_errors=True)
        _shutil_mod.copytree(snap, path)
        with _crash_after(path, k) as crash:
            try:
                expected_of(path)  # the op under test, crash-injected
            except _InjectedCrash:
                pass
        if not crash.fired:
            # boundary k was never reached: the clean run has < k+1
            # steps — every boundary has been swept
            assert _rows_by_day(spark, path) == expected_parts
            _no_siblings(path)
            break
        # (a) recovery alone: every partition exactly-old or exactly-new
        recover_interrupted_swap(path)
        recover_interrupted_partition_swap(path)
        healed = _rows_by_day(spark, path)
        for day in set(base_parts) | set(expected_parts) | set(healed):
            got = healed.get(day, set())
            old = base_parts.get(day, set())
            new = expected_parts.get(day, set())
            assert got in (old, new), (
                f"boundary {k}, partition {day}: healed state is neither "
                f"old nor new: {got} (old={old}, new={new})"
            )
        # (b) replay converges to the no-crash result
        assert expected_of(path) == expected_parts, f"replay after boundary {k}"
        _no_siblings(path)
        k += 1
    assert k > 0, "no crash boundary was ever exercised — harness broken"


_crash_rows = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 99)), min_size=1, max_size=8
)
_CRASH_SET = settings(
    max_examples=3,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _mk_day_df(spark, rows):
    uniq = {}
    for k, v in rows:  # key determines partition (the primitive's contract)
        uniq[k] = (k, f"d{k % 3}", v)
    return spark.createDataFrame(list(uniq.values()), "k long, day string, v long")


@given(base=_crash_rows, upd=_crash_rows)
@_CRASH_SET
@pytest.mark.slow
def test_crash_sweep_merge_upsert(spark, tmp_path_factory, base, upd):
    from etl_demos_spark.plans.incremental import merge_upsert

    tmp = tmp_path_factory.mktemp("crashmu")
    base_df = _mk_day_df(spark, base)
    upd_df = _mk_day_df(spark, upd)

    def expected_of(path):
        merge_upsert(spark, upd_df, path, keys=["k"])
        return _rows_by_day(spark, path)

    _sweep_crash_boundaries(
        spark, tmp,
        lambda df, p: merge_upsert(spark, df, p, keys=["k"]),
        base_df=base_df, expected_of=expected_of,
    )


@given(base=_crash_rows, upd=_crash_rows)
@_CRASH_SET
@pytest.mark.slow
def test_crash_sweep_merge_upsert_partitioned(spark, tmp_path_factory, base, upd):
    from etl_demos_spark.plans.incremental import merge_upsert_partitioned

    tmp = tmp_path_factory.mktemp("crashmup")
    base_df = _mk_day_df(spark, base)
    upd_df = _mk_day_df(spark, upd)

    def expected_of(path):
        merge_upsert_partitioned(
            spark, upd_df, path, keys=["k"], partition_by=["day"]
        )
        return _rows_by_day(spark, path)

    _sweep_crash_boundaries(
        spark, tmp,
        lambda df, p: merge_upsert_partitioned(
            spark, df, p, keys=["k"], partition_by=["day"]
        ),
        base_df=base_df, expected_of=expected_of,
    )


@given(base=_crash_rows)
@_CRASH_SET
@pytest.mark.slow
def test_crash_sweep_compact(spark, tmp_path_factory, base):
    """compact() must never lose rows at any crash boundary — its
    expected final content IS its input content."""
    from etl_demos_spark.plans.incremental import compact, merge_upsert

    tmp = tmp_path_factory.mktemp("crashcmp")
    base_df = _mk_day_df(spark, base)

    def expected_of(path):
        compact(spark, path, target_file_mb=128)
        return _rows_by_day(spark, path)

    _sweep_crash_boundaries(
        spark, tmp,
        lambda df, p: merge_upsert(spark, df, p, keys=["k"]),
        base_df=base_df, expected_of=expected_of,
    )


@pytest.mark.slow
def test_crash_sweep_near_dedup_store(spark, tmp_path):
    """The streaming near-dup signature store's staging-then-swap: kill
    batch 2 at every shutil boundary under the store/out roots, then
    replay batch 2 (foreachBatch is at-least-once — replay IS the
    recovery path) and assert the output partitions and the store's
    surviving ids converge to the no-crash run. Deterministic single
    example: the boundary sweep is exhaustive and the heavy minhash
    path makes hypothesis variation poor value here."""
    from etl_demos_spark.streaming.dedup import near_dedup_batch_processor

    def mk_batch(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    words = "alpha beta gamma delta epsilon zeta eta theta".split()
    b1 = mk_batch([(i, " ".join(words[i % 4 :] + words[: i % 4])) for i in range(4)])
    # batch 2: one near-dup of a stored doc, one fresh doc
    b2 = mk_batch([(10, " ".join(words)), (11, "totally fresh unseen content words")])

    def run_clean(root):
        out, store = f"{root}/out", f"{root}/store"
        proc = near_dedup_batch_processor(out, store, threshold=0.5)
        proc(b1, 1)
        return out, store, proc

    def state(out, store):
        outs = {(r["doc_id"], r["__batch_id"]) for r in spark.read.parquet(out).collect()}
        ids = {r["id"] for r in spark.read.parquet(store).collect()}
        return outs, ids

    # expected: clean two-batch run
    exp_root = str(tmp_path / "exp")
    out_e, store_e, proc_e = run_clean(exp_root)
    proc_e(b2, 2)
    expected = state(out_e, store_e)

    root = str(tmp_path / "live")
    out, store, proc = run_clean(root)
    snap = str(tmp_path / "snap")
    _shutil_mod.copytree(root, snap)

    k = 0
    while True:
        spark.catalog.clearCache()
        _shutil_mod.rmtree(root, ignore_errors=True)
        _shutil_mod.copytree(snap, root)
        with _crash_after(root, k) as crash:
            try:
                proc(b2, 2)
            except _InjectedCrash:
                pass
        if not crash.fired:
            assert state(out, store) == expected
            break
        proc(b2, 2)  # at-least-once replay of the same batch_id
        assert state(out, store) == expected, f"replay after boundary {k}"
        _no_siblings(store)
        k += 1
    assert k > 0


def test_crash_during_staging_write_discards_orphan(spark, tmp_path):
    """A writer killed DURING the staging write (before any swap move)
    leaves a partial __staging / __pstaging sibling next to an intact
    live table. Recovery must discard the orphan — promoting a partial
    staging dir would corrupt the table — and replay must converge.
    Complements the boundary sweep, which only kills at move/rmtree
    boundaries (the write itself is Spark-side)."""
    from etl_demos_spark.plans.incremental import (
        merge_upsert,
        merge_upsert_partitioned,
    )

    base = _mk_day_df(spark, [(0, 1), (1, 2), (4, 3)])
    upd = _mk_day_df(spark, [(1, 9), (5, 9)])

    # whole-table family
    p1 = str(tmp_path / "t1")
    merge_upsert(spark, base, p1, keys=["k"])
    expected = None

    def run_full(path):
        merge_upsert(spark, upd, path, keys=["k"])
        return _rows_by_day(spark, path)

    clean = str(tmp_path / "c1")
    _shutil_mod.copytree(p1, clean)
    expected = run_full(clean)
    # partial staging: only a fraction of the merged rows made it
    upd.limit(1).write.mode("overwrite").parquet(f"{p1}__staging")
    assert run_full(p1) == expected
    _no_siblings(p1)

    # per-partition family
    p2 = str(tmp_path / "t2")
    merge_upsert_partitioned(spark, base, p2, keys=["k"], partition_by=["day"])

    def run_part(path):
        merge_upsert_partitioned(spark, upd, path, keys=["k"], partition_by=["day"])
        return _rows_by_day(spark, path)

    clean2 = str(tmp_path / "c2")
    _shutil_mod.copytree(p2, clean2)
    expected2 = run_part(clean2)
    upd.limit(1).write.mode("overwrite").partitionBy("day").parquet(f"{p2}__pstaging")
    assert run_part(p2) == expected2
    _no_siblings(p2)


# ---------------------------------------------------------------------------
# CDC chunking vs the pure-Python reference
# ---------------------------------------------------------------------------


@given(texts=_texts, mask=st.sampled_from([4, 16]))
@SET
def test_cdc_chunks_match_python_reference(spark, texts, mask):
    """cdc_chunks == a first-principles Python implementation of the
    same boundary rule on arbitrary text: identical chunk texts in
    order, identical token accounting, and the reconstruction
    invariant (chunks re-join to the normalized token stream)."""
    import hashlib
    import re

    from etl_demos_spark.operators.dedup import MD5_HEX_CHARS, cdc_chunks

    w = 3
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {}
    for r in cdc_chunks(df, "doc_id", "text", w, mask).collect():
        got.setdefault(r["id"], []).append((r["chunk_idx"], r["chunk_text"]))
    for v in got.values():
        v.sort()

    def ref_chunks(t):
        toks = re.findall("[A-Za-z0-9]+", t.lower())
        if not toks:
            return []
        cuts = []
        for j in range(max(len(toks) - w + 1, 0)):
            g = " ".join(toks[j : j + w])
            h = int(
                hashlib.md5(g.encode()).hexdigest()[:MD5_HEX_CHARS], 16
            )
            if h % mask == 0:
                cuts.append(j)
        chunks, start, ci = [], 0, 0
        for j in cuts:
            chunks.append((ci, " ".join(toks[start : j + 1])))
            start, ci = j + 1, ci + 1
        if start < len(toks):
            chunks.append((ci, " ".join(toks[start:])))
        return chunks

    for i, t in enumerate(texts):
        expect = ref_chunks(t)
        assert got.get(i, []) == expect, (i, t, got.get(i), expect)
        # reconstruction: chunks re-join to the token stream
        toks = re.findall("[A-Za-z0-9]+", t.lower())
        assert " ".join(c for _, c in expect) == " ".join(toks)


# ---------------------------------------------------------------------------
# Multimodal codecs: build→decode round-trips on arbitrary parameters
# ---------------------------------------------------------------------------


@given(
    rate=st.sampled_from([8000, 16000, 22050, 44100]),
    ch=st.integers(1, 2),
    bits=st.sampled_from([8, 16]),
    payload=st.binary(min_size=0, max_size=200),
)
@settings(max_examples=30, deadline=None)
def test_wav_build_decode_roundtrip(rate, ch, bits, payload):
    """decode_wav recovers exactly the PCM frames any well-formed
    RIFF/WAVE container carries, for every (rate, channels, width)
    combination — trailing bytes that don't fill a frame are dropped,
    never misread."""
    import struct

    import numpy as np

    from etl_demos_spark.operators.multimodal import decode_wav

    block = ch * bits // 8
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * block, block, bits)
    buf = b"RIFF" + struct.pack(
        "<I", 4 + 8 + len(fmt) + 8 + len(payload)
    ) + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt + b"data" + struct.pack(
        "<I", len(payload)
    ) + payload
    r, c, b_, s = decode_wav(buf)
    assert (r, c, b_) == (rate, ch, bits)
    if bits == 8:
        want = np.frombuffer(payload, dtype=np.uint8).astype(np.int32) - 128
    else:
        n = len(payload) - len(payload) % 2
        want = np.frombuffer(payload[:n], dtype="<i2").astype(np.int32)
    frames = len(want) // ch
    assert s.shape == (frames, ch)
    assert (s.ravel() == want[: frames * ch]).all()


@given(
    frames=st.lists(st.binary(min_size=0, max_size=9), min_size=0, max_size=12),
    usec=st.integers(1, 100000),
    w=st.integers(1, 4096),
    h=st.integers(1, 4096),
)
@settings(max_examples=30, deadline=None)
def test_avi_build_decode_census(frames, usec, w, h):
    """decode_avi's movi census equals the built frame list for any
    frame-size mix (odd sizes exercise word-alignment padding)."""
    import struct

    from etl_demos_spark.operators.multimodal import decode_avi

    def chunk(cid, body):
        pad = b"\x00" if len(body) % 2 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    avih = struct.pack("<14I", usec, 0, 0, 0, len(frames), 0, 1, 0, w, h, 0, 0, 0, 0)
    body = (
        b"AVI "
        + chunk(b"LIST", b"hdrl" + chunk(b"avih", avih))
        + chunk(b"LIST", b"movi" + b"".join(chunk(b"00dc", f) for f in frames))
    )
    m = decode_avi(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert m["usec_per_frame"] == usec
    assert (m["width"], m["height"]) == (w, h)
    assert m["total_frames"] == len(frames)
    assert m["movi_frames"] == len(frames)
    assert m["movi_bytes"] == sum(len(f) for f in frames)


@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    seed=st.integers(0, 2**31 - 1),
    gray=st.booleans(),
)
@settings(max_examples=30, deadline=None)
def test_perceptual_hashes_in_range_for_any_dims(w, h, seed, gray):
    """dHash/pHash are total over arbitrary image dimensions (including
    degenerate 1xN / Nx1) and land in their declared bit ranges."""
    import numpy as np

    from etl_demos_spark.operators import image_dedup as idp
    from etl_demos_spark.operators.multimodal import decode_image

    rng = np.random.default_rng(seed)
    ch = 1 if gray else 3
    raster = rng.integers(0, 256, size=w * h * ch, dtype=np.uint8).tobytes()
    magic = b"P5" if gray else b"P6"
    buf = magic + b"\n%d %d\n255\n" % (w, h) + raster
    _, _, _, px = decode_image(buf)
    d = idp.dhash_int(px)
    p = idp.phash_int(px)
    assert -(1 << 63) <= d < (1 << 63)
    assert 0 <= p < (1 << 63)
    # determinism: same pixels, same hash
    assert d == idp.dhash_int(px) and p == idp.phash_int(px)


@given(
    frames=st.lists(st.binary(min_size=0, max_size=40), min_size=0, max_size=8),
    mix_ids=st.booleans(),
)
@settings(max_examples=40, deadline=None)
def test_avi_frame_payloads_roundtrip(frames, mix_ids):
    """avi_frame_payloads recovers exactly the built frame list — bytes
    and ORDER — for any frame-size mix (odd lengths exercise the RIFF
    word-alignment pad), with ##dc/##db chunk ids interchangeable and
    non-frame chunks skipped."""
    import struct

    from etl_demos_spark.operators.multimodal import avi_frame_payloads

    def chunk(cid, body):
        pad = b"\x00" if len(body) % 2 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    avih = struct.pack("<14I", 1, 0, 0, 0, len(frames), 0, 1, 0, 4, 4,
                       0, 0, 0, 0)
    movi = b"movi"
    for i, f in enumerate(frames):
        cid = b"00db" if (mix_ids and i % 2) else b"00dc"
        movi += chunk(cid, f)
        if i == 0:
            movi += chunk(b"ix00", b"idx")  # non-frame chunk: skipped
    body = (b"AVI " + chunk(b"LIST", b"hdrl" + chunk(b"avih", avih))
            + chunk(b"LIST", movi))
    got = avi_frame_payloads(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert got == frames
