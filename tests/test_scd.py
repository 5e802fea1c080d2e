"""SCD2 dimension construction, incremental apply, point-in-time lookup."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from etl_demos_spark.operators.scd import scd2_apply, scd2_build, scd2_lookup


def d(s: str) -> dt.date:
    return dt.date.fromisoformat(s)


def _changes(spark):
    return spark.createDataFrame(
        [
            (1, d("2024-01-01"), 1, "bronze"),
            (1, d("2024-02-01"), 2, "bronze"),   # no change -> merges
            (1, d("2024-03-01"), 3, "gold"),
            (2, d("2024-01-15"), 4, "silver"),
            (2, d("2024-01-15"), 5, None),        # same-day tie, seq breaks it
        ],
        "cust long, ts date, seq long, tier string",
    )


def test_scd2_build_collapses_and_dates_versions(spark):
    dim = scd2_build(_changes(spark), "cust", "ts", ["tier"], seq_col="seq").collect()
    by_key = {}
    for r in dim:
        by_key.setdefault(r["cust"], []).append(r)
    c1 = sorted(by_key[1], key=lambda r: r["valid_from"])
    assert [r["tier"] for r in c1] == ["bronze", "gold"]
    assert c1[0]["valid_from"] == d("2024-01-01")
    assert c1[0]["valid_to"] == d("2024-03-01") and not c1[0]["is_current"]
    assert c1[1]["valid_to"] is None and c1[1]["is_current"]
    # null-safe change detection: silver -> NULL is a new version
    assert len(by_key[2]) == 2
    cur2 = [r for r in by_key[2] if r["is_current"]]
    assert len(cur2) == 1 and cur2[0]["tier"] is None


def test_scd2_apply_closes_open_rows_and_keeps_history(spark):
    dim = scd2_build(_changes(spark), "cust", "ts", ["tier"], seq_col="seq")
    batch = spark.createDataFrame(
        [
            (1, d("2024-06-01"), 10, "platinum"),  # closes cust1's gold row
            (3, d("2024-06-02"), 11, "bronze"),    # brand-new entity
            (2, d("2024-07-01"), 12, None),        # same state as open row -> no-op
        ],
        "cust long, ts date, seq long, tier string",
    )
    out = scd2_apply(dim, batch, "cust", "ts", ["tier"], seq_col="seq")
    rows = out.collect()
    cur = {r["cust"]: r for r in rows if r["is_current"]}
    assert cur[1]["tier"] == "platinum" and cur[1]["valid_from"] == d("2024-06-01")
    assert cur[3]["tier"] == "bronze"
    # the previously-open gold row is now closed at the new version's start
    gold = [r for r in rows if r["cust"] == 1 and r["tier"] == "gold"][0]
    assert gold["valid_to"] == d("2024-06-01") and not gold["is_current"]
    # closed history untouched
    bronze = [r for r in rows if r["cust"] == 1 and r["tier"] == "bronze"][0]
    assert bronze["valid_from"] == d("2024-01-01") and bronze["valid_to"] == d("2024-03-01")
    # unchanged open state did not spawn a duplicate version
    assert len([r for r in rows if r["cust"] == 2 and r["tier"] is None]) == 1


def test_scd2_lookup_point_in_time(spark):
    dim = scd2_build(_changes(spark), "cust", "ts", ["tier"], seq_col="seq")
    facts = spark.createDataFrame(
        [(100, 1, d("2024-02-10")), (101, 1, d("2024-05-01")), (102, 9, d("2024-05-01"))],
        "fact_id long, cust long, ts date",
    )
    out = {r["fact_id"]: r for r in scd2_lookup(facts, dim, "cust", "ts").collect()}
    assert out[100]["tier"] == "bronze"   # mid-first-version
    assert out[101]["tier"] == "gold"     # open version
    assert out[102]["tier"] is None       # unknown key -> left join null


def test_snapshot_diff_null_safety(spark):
    """Null handling: null->value and value->null are updates; null->null
    is unchanged; pure inserts/deletes classified by key presence."""
    from etl_demos_spark.operators.scd import snapshot_diff

    old = spark.createDataFrame(
        [(1, None), (2, "b"), (3, None), (4, "d")], "k long, v string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, None), (3, None), (5, "e")], "k long, v string"
    )
    got = {r["k"]: r["change_type"] for r in snapshot_diff(old, new, ("k",)).collect()}
    assert got == {1: "update", 2: "update", 4: "delete", 5: "insert"}
    assert 3 not in got  # null == null, unchanged


def test_scd2_apply_late_batch_rewrites_closed_history(spark):
    """A batch event PREDATING the open row must split closed history,
    not overlap it: the rebuilt dimension must equal a full scd2_build
    over the complete change log (the correctness bar for incremental
    maintenance)."""
    from etl_demos_spark.operators.scd import scd2_apply, scd2_build, scd2_lookup

    log = spark.createDataFrame(
        [(1, "2024-01-01", "bronze"), (1, "2024-03-01", "gold")],
        "cust long, ts string, tier string",
    ).select("cust", F.col("ts").cast("date").alias("ts"), "tier")
    dim = scd2_build(log, "cust", "ts", ["tier"])
    late = spark.createDataFrame(
        [(1, "2024-02-01", "silver")], "cust long, ts string, tier string"
    ).select("cust", F.col("ts").cast("date").alias("ts"), "tier")

    applied = scd2_apply(dim, late, "cust", "ts", ["tier"])
    full = scd2_build(log.unionByName(late), "cust", "ts", ["tier"])
    key = lambda r: (r["cust"], str(r["valid_from"]), str(r["valid_to"]),
                     r["tier"], r["is_current"])
    assert sorted(map(key, applied.collect())) == sorted(map(key, full.collect()))

    # no overlapping validity: a February fact matches exactly ONE version
    facts = spark.createDataFrame([(1, "2024-02-15")], "cust long, fts string") \
        .select("cust", F.col("fts").cast("date").alias("fts"))
    hit = scd2_lookup(facts, applied, "cust", "fts").collect()
    assert len(hit) == 1 and hit[0]["tier"] == "silver"


def test_snapshot_diff_null_keys_do_not_churn(spark):
    from etl_demos_spark.operators.scd import snapshot_diff

    old = spark.createDataFrame([(None, "x"), (1, "a")], "k long, v string")
    new = spark.createDataFrame([(None, "x"), (1, "b")], "k long, v string")
    got = {(r["k"], r["change_type"]) for r in
           snapshot_diff(old, new, ("k",)).collect()}
    # the NULL-key row is unchanged → must NOT appear as delete+insert
    assert got == {(1, "update")}
    new2 = spark.createDataFrame([(None, "y"), (1, "a")], "k long, v string")
    got2 = {(r["k"], r["change_type"]) for r in
            snapshot_diff(old, new2, ("k",)).collect()}
    assert got2 == {(None, "update")}
