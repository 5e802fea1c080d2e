"""Skew utilities, incremental merge, stateful streaming operator."""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F

from etl_demos_spark.data import load_events
from etl_demos_spark.operators.skew import salted_join_left, salted_sum
from etl_demos_spark.plans.incremental import append, merge_upsert, table_exists
from etl_demos_spark.streaming.stateful import user_running_counts

SF_DIR = "/root/testdata/sf0.001"


def test_salted_sum_matches_plain(spark):
    # heavily skewed: 90% of rows share one key
    rows = [(("hot" if i % 10 else f"k{i}"), float(i % 7)) for i in range(2000)]
    df = spark.createDataFrame(rows, "k string, v double")
    plain = {
        r["k"]: (r["n"], r["s"])
        for r in df.groupBy("k")
        .agg(F.count("*").alias("n"), F.sum(F.col("v").cast("decimal(12,2)")).alias("s"))
        .collect()
    }
    salted = {
        r["k"]: (r["n_rows"], r["sum_v"])
        for r in salted_sum(
            df, ["k"], {"sum_v": F.sum(F.col("v").cast("decimal(12,2)"))}, buckets=8
        ).collect()
    }
    assert plain == salted


def test_salted_join_matches_plain(spark):
    big = spark.createDataFrame(
        [(("hot" if i % 5 else f"k{i}"), i) for i in range(1000)], "k string, v long"
    )
    small = spark.createDataFrame(
        [("hot", "H"), ("k5", "A"), ("k10", "B")], "k string, tag string"
    )
    plain = sorted(
        (r["k"], r["v"], r["tag"]) for r in big.join(small, "k", "left").collect()
    )
    salted = sorted(
        (r["k"], r["v"], r["tag"]) for r in salted_join_left(big, small, "k", 4).collect()
    )
    assert plain == salted


def test_merge_upsert(spark, tmp_path):
    path = str(tmp_path / "tbl")
    base = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k long, v string")
    merge_upsert(spark, base, path, ["k"])
    assert table_exists(path)
    updates = spark.createDataFrame([(2, "B"), (4, "d")], "k long, v string")
    out = merge_upsert(spark, updates, path, ["k"])
    got = {r["k"]: r["v"] for r in out.collect()}
    assert got == {1: "a", 2: "B", 3: "c", 4: "d"}
    # append mode just adds rows
    append(spark.createDataFrame([(5, "e")], "k long, v string"), path)
    assert spark.read.parquet(path).count() == 5


@pytest.mark.slow
def test_stateful_user_counts_stream(spark, tmp_path):
    src = str(tmp_path / "src")
    ev = load_events(spark, SF_DIR).select("user_id", "ts", "event_type")
    ev.coalesce(1).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    out = user_running_counts(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("stateful_counts")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        r["user_id"]: r["n_events"]
        for r in spark.sql("select * from stateful_counts").collect()
    }
    expect = {
        r["user_id"]: r["n"]
        for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    q.stop()
    assert got == expect


def test_asof_join_semantics(spark):
    import datetime as dt

    from etl_demos_spark.operators.asof import asof_join_backward

    T0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    s = lambda sec: T0 + dt.timedelta(seconds=sec)
    left = spark.createDataFrame(
        [(1, 100, s(10)), (2, 100, s(20)), (3, 100, s(5)), (4, 200, s(10))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(901, 100, s(10)), (902, 100, s(15)), (903, 300, s(1))],
        "event_id long, user_id long, ts timestamp",
    )
    out = asof_join_backward(left, right, on=["user_id"], carry=["event_id"])
    got = {r["event_id"]: r["event_id_asof"] for r in out.collect()}
    assert got[1] == 901      # tie at equal ts matches (inclusive bound)
    assert got[2] == 902      # latest at-or-before
    assert got[3] is None     # no prior right row
    assert got[4] is None     # key with no right rows at all
    assert len(got) == 4      # left-join: all left rows kept


def test_backfill_partitions_touches_only_named_partitions(spark, tmp_path):
    from etl_demos_spark.plans.incremental import backfill_partitions

    path = str(tmp_path / "fact")
    base = spark.createDataFrame(
        [(1, "2024-01-01", 10.0), (2, "2024-01-02", 20.0), (3, "2024-01-03", 30.0)],
        "id long, day string, v double",
    )
    base.write.partitionBy("day").parquet(path)
    # backfill ONLY day 2 with corrected data
    fix = spark.createDataFrame([(9, "2024-01-02", 99.0)], "id long, day string, v double")
    backfill_partitions(spark, fix, path, ["day"])
    # partition-column values are type-inferred (string → date) on read
    got = {(r["id"], str(r["day"]), r["v"]) for r in spark.read.parquet(path).collect()}
    assert got == {(1, "2024-01-01", 10.0), (9, "2024-01-02", 99.0), (3, "2024-01-03", 30.0)}


def test_compact_small_files(spark, tmp_path):
    from etl_demos_spark.plans.incremental import compact

    path = str(tmp_path / "smallfiles")
    df = spark.range(10000).withColumn("v", F.col("id") * 2)
    df.repartition(64).write.parquet(path)  # 64 tiny files
    from pathlib import Path as P

    assert len(list(P(path).glob("*.parquet"))) == 64
    n = compact(spark, path, target_file_mb=128)
    assert n <= 2
    back = spark.read.parquet(path)
    assert back.count() == 10000
    assert back.agg(F.sum("v")).collect()[0][0] == 2 * sum(range(10000))


def test_split_by_hash_deterministic_and_stable(spark):
    from etl_demos_spark.operators.sampling import deterministic_sample, split_by_hash

    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["split"] for r in split_by_hash(df, "doc_id").collect()}
    b = {r["doc_id"]: r["split"] for r in split_by_hash(df, "doc_id").collect()}
    assert a == b  # run-to-run stable
    # assignment survives corpus growth: subset rows keep their split
    sub = df.filter(F.col("doc_id") < 500)
    c = {r["doc_id"]: r["split"] for r in split_by_hash(sub, "doc_id").collect()}
    assert all(a[k] == v for k, v in c.items())
    # fractions roughly honored
    from collections import Counter

    counts = Counter(a.values())
    assert 0.85 <= counts["train"] / 2000 <= 0.95
    assert counts["train"] + counts["val"] + counts["test"] == 2000
    # deterministic sample is a stable subset
    s1 = {r["doc_id"] for r in deterministic_sample(df, "doc_id", 0.25).collect()}
    s2 = {r["doc_id"] for r in deterministic_sample(df, "doc_id", 0.25).collect()}
    assert s1 == s2
    assert 0.2 <= len(s1) / 2000 <= 0.3


def test_hll_sketch_mergeability_exact(spark):
    """Union of per-day sketch partials must give the SAME estimate as a
    single whole-corpus sketch (HLL register updates are max-ops:
    order-independent, deterministic) — the property that makes stored
    partials re-aggregatable forever. Estimate must also be within 2% of
    exact at this cardinality."""
    import pyspark.sql.functions as F
    from etl_demos_spark.data import load_table
    from etl_demos_spark.operators import sketches

    ev = load_table(spark, SF_DIR, "events").withColumn("day", F.to_date("ts"))
    daily = sketches.distinct_sketches(ev, ("event_type", "day"), "user_id")
    via_union = {
        r["event_type"]: r["approx_distinct"]
        for r in sketches.merge_sketch_rollup(daily, ("event_type",)).collect()
    }
    direct = {
        r["event_type"]: r["approx_distinct"]
        for r in sketches.merge_sketch_rollup(
            sketches.distinct_sketches(ev, ("event_type",), "user_id"),
            ("event_type",),
        ).collect()
    }
    assert via_union == direct
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(
            F.count_distinct("user_id").alias("n")
        ).collect()
    }
    for k, est in via_union.items():
        assert abs(est - exact[k]) <= 0.02 * exact[k]


def test_cms_never_undercounts_and_merges(spark):
    from etl_demos_spark.operators import sketches as sk
    import pyspark.sql.functions as F

    rows = [(f"k{i % 7}",) for i in range(200)] + [("rare",)]
    df = spark.createDataFrame(rows, "k string")
    exact = {r["k"]: r["n"] for r in
             df.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()}

    cms = sk.cms_build(df, "k", depth=4, width=64)
    keys = df.select("k").distinct()
    est = {r["k"]: r["est"] for r in
           sk.cms_estimate(keys, cms, "k", depth=4, width=64).collect()}
    assert set(est) == set(exact)
    for k, n in exact.items():
        assert est[k] >= n, f"{k}: CMS undercounted {est[k]} < {n}"

    # mergeability: sketch(a ∪ b) == per-cell sum of sketch(a) + sketch(b)
    a, b = df.randomSplit([0.5, 0.5], seed=1)
    merged = (
        sk.cms_build(a, "k", depth=4, width=64)
        .unionByName(sk.cms_build(b, "k", depth=4, width=64))
        .groupBy("row", "col")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = {(r["row"], r["col"]): r["cnt"] for r in cms.collect()}
    got = {(r["row"], r["col"]): r["cnt"] for r in merged.collect()}
    assert got == whole


def test_weighted_sample_topk_proportional_and_deterministic(spark):
    """Efraimidis–Spirakis with hash uniforms: no replacement, exact
    reproducibility, and weight-proportionality across seeds (a 10×
    weight must win far more often than a 1× weight)."""
    import pyspark.sql.functions as F

    from etl_demos_spark.operators.sampling import weighted_sample_topk

    rows = [(i, 10.0 if i < 20 else 1.0) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, w double")

    a = [r["id"] for r in weighted_sample_topk(df, "w", 30, "id").collect()]
    b = [r["id"] for r in weighted_sample_topk(df, "w", 30, "id").collect()]
    assert a == b and len(a) == 30 and len(set(a)) == 30

    heavy_wins = 0
    for s in range(10):
        got = {
            r["id"]
            for r in weighted_sample_topk(df, "w", 30, "id", seed=f"s{s}").collect()
        }
        heavy_wins += len(got & set(range(20)))
    # 20 heavy rows carry 200/380 ≈ 53% of total weight; uniformly they
    # would win 10% of slots. Expect far above uniform, below saturation.
    assert 100 < heavy_wins < 200, heavy_wins

    # weight <= 0 never wins
    z = spark.createDataFrame([(1, 0.0), (2, -1.0), (3, 5.0)], "id long, w double")
    assert [r["id"] for r in weighted_sample_topk(z, "w", 3, "id").collect()] == [3]


def test_delete_keys_rewrites_only_affected_partitions(spark, tmp_path):
    """Targeted delete: untouched partitions keep their exact files;
    affected partitions lose only the doomed rows; fully-emptied
    partitions disappear."""
    import os

    from etl_demos_spark.plans.incremental import delete_keys

    path = str(tmp_path / "t")
    rows = [(i, i % 4, f"v{i}") for i in range(40)]
    df = spark.createDataFrame(rows, "id long, p int, payload string")
    df.write.partitionBy("p").parquet(path)

    def files_of(p):
        d = f"{path}/p={p}"
        return sorted(
            (f, os.path.getmtime(f"{d}/{f}"))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        ) if os.path.isdir(d) else None

    before_p3 = files_of(3)

    # delete two keys in partition 1, and ALL keys of partition 2
    doomed = [1, 5] + [i for i in range(40) if i % 4 == 2]
    keys = spark.createDataFrame([(k,) for k in doomed], "id long")
    n = delete_keys(spark, path, keys, "id", ("p",))
    assert n == len(doomed)

    got = spark.read.parquet(path)
    assert got.count() == 40 - len(doomed)
    assert got.filter("id = 1 or id = 5").count() == 0
    assert got.filter("p = 2").count() == 0
    assert files_of(2) in (None, [])      # emptied partition removed
    assert files_of(3) == before_p3       # untouched partition: same files


def test_split_by_hash_null_keys_get_a_split(spark):
    from etl_demos_spark.operators.sampling import split_by_hash

    df = spark.createDataFrame([(1,), (None,), (None,)], "doc_id long")
    out = split_by_hash(df, "doc_id").collect()
    splits = {r["doc_id"]: r["split"] for r in out}
    # NULL keys land deterministically in ONE named split, never None
    assert all(s in ("train", "val", "test") for s in splits.values())
    nulls = [r["split"] for r in out if r["doc_id"] is None]
    assert len(set(nulls)) == 1


def test_weighted_sample_topk_large_weights_stay_proportional(spark):
    """The log-domain race key keeps 1e-6 precision RELATIVE at every
    weight scale: with weights ~1e7, heavy rows must still dominate the
    sample (the old absolute rounding collapsed all keys and selection
    degenerated to lowest-id-first)."""
    from etl_demos_spark.operators.sampling import weighted_sample_topk

    rows = [(i, 1.0e7 if i % 10 == 0 else 1.0e5) for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, w double")
    picked = weighted_sample_topk(df, "w", 50, "id").collect()
    heavy = sum(1 for r in picked if r["id"] % 10 == 0)
    # heavy rows carry 100/(100+900·0.01)≈92% of total weight → expect
    # ~46 of 50; lowest-id-first degeneracy would give exactly 5
    assert heavy >= 35, heavy
    # NULL keys and non-positive weights never win
    df2 = spark.createDataFrame(
        [(None, 1.0e9), (1, 0.0), (2, 5.0), (3, 1.0)], "id long, w double"
    )
    got = [r["id"] for r in weighted_sample_topk(df2, "w", 2, "id").collect()]
    assert None not in got and 1 not in got and len(got) == 2


def test_hybrid_search_disjunctive_recall(spark):
    from etl_demos_spark.operators.search import hybrid_search

    docs = spark.createDataFrame(
        [(1, "neural network training"), (2, "spark cluster tuning"),
         (3, "neural spark bridge")],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.7, 0.7])],
        "vec_id long, embedding array<double>",
    )
    terms = ["neural", "network", "cluster"]
    # conjunctive: no doc has all three → empty
    assert hybrid_search(docs, emb, terms, [1.0, 0.0], k=3).count() == 0
    # disjunctive: partial matches reach the semantic rerank
    got = hybrid_search(
        docs, emb, terms, [1.0, 0.0], k=3, require_all=False
    ).collect()
    assert {r["doc_id"] for r in got} == {1, 2, 3}
    assert got[0]["doc_id"] == 1  # best cosine to [1,0] ranks first


def test_mixture_plan_surfaces_absent_weight_keys(spark):
    """A typo'd source name in the weights table must NOT silently
    redistribute its budget mass: it surfaces as a zero-count row whose
    weight stays in the renormalizing sum (ADVICE r9)."""
    from etl_demos_spark.operators.sampling import mixture_plan

    docs = spark.createDataFrame(
        [("a", "one two three"), ("a", "four five"), ("b", "six seven")],
        "source string, text string",
    )
    rows = {
        r["group"]: r
        for r in mixture_plan(
            docs,
            "source",
            {"a": 0.5, "b": 0.25, "c_typo": 0.25},
            budget_tokens=100,
        ).collect()
    }
    # the absent key is a visible dead row, not a silent drop
    assert set(rows) == {"a", "b", "c_typo"}
    ghost = rows["c_typo"]
    assert ghost["n_docs"] == 0 and ghost["total_tokens"] == 0
    assert ghost["weight"] == 0.25 and ghost["rate"] == 0.0
    assert ghost["planned_tokens"] == 0 and ghost["shortfall_tokens"] == 0
    # and its mass is NOT redistributed: a's rate uses the FULL weight
    # sum (0.5/1.0), not the present-only sum (0.5/0.75)
    a = rows["a"]
    assert abs(a["rate"] - 0.5 * 100 / a["total_tokens"]) < 1e-9
    # present groups unaffected otherwise
    assert rows["b"]["n_docs"] == 1


def test_mixture_plan_unweighted_group_is_visible_rate_zero(spark):
    from etl_demos_spark.operators.sampling import mixture_plan

    docs = spark.createDataFrame(
        [("a", "one two"), ("z", "three four")],
        "source string, text string",
    )
    rows = {
        r["group"]: r
        for r in mixture_plan(docs, "source", {"a": 1.0}, 10).collect()
    }
    assert rows["z"]["weight"] == 0.0 and rows["z"]["rate"] == 0.0
    assert rows["z"]["n_docs"] == 1
