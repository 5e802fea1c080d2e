"""Numeric feature prep: z-score, winsorize, histograms (operators/features.py)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from etl_demos_spark.operators import features as feat


def _df(spark):
    rows = [(i, "a" if i % 2 == 0 else "b", float(v))
            for i, v in enumerate([1, 2, 3, 4, 5, 6, 7, 8, 100, -50])]
    return spark.createDataFrame(rows, "id long, grp string, x double")


def test_zscore_hand_computed(spark):
    df = _df(spark)
    out = {r["id"]: r["x_z"] for r in feat.zscore(df, ["x"], "grp").collect()}
    # group a: ids 0,2,4,6,8 → x = 1,3,5,7,100
    xs = [1.0, 3.0, 5.0, 7.0, 100.0]
    mean = sum(xs) / len(xs)
    std = math.sqrt(sum(v * v for v in xs) / len(xs) - mean * mean)
    assert abs(out[0] - round((1.0 - mean) / std, 6)) < 1e-9
    assert abs(out[8] - round((100.0 - mean) / std, 6)) < 1e-9


def test_zscore_zero_variance_is_null(spark):
    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "a", 5.0), (3, "b", 1.0), (4, "b", 2.0)],
        "id long, grp string, x double",
    )
    out = {r["id"]: r["x_z"] for r in feat.zscore(df, ["x"], "grp").collect()}
    assert out[1] is None and out[2] is None
    assert out[3] is not None


def test_winsorize_clips_to_group_percentiles(spark):
    df = _df(spark)
    out = feat.winsorize(df, ["x"], "grp", p_lo=0.25, p_hi=0.75)
    got = {r["id"]: r["x_w"] for r in out.collect()}
    # group a sorted: 1,3,5,7,100 → p25 = 3, p75 = 7 (interpolated on rank)
    assert got[0] == 3.0      # 1 clipped up
    assert got[8] == 7.0      # 100 clipped down
    assert got[4] == 5.0      # interior untouched


def test_equi_width_hist_buckets_and_ranges(spark):
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "id long, x double"
    )
    got = {r["bucket"]: r for r in feat.equi_width_hist(df, "x", bins=3).collect()}
    # lo=0, hi=9, w=3: buckets [0,3) [3,6) [6,9] → 3,3,4 rows
    assert got[0]["n"] == 3 and got[1]["n"] == 3 and got[2]["n"] == 4
    assert got[0]["bucket_lo"] == 0.0 and got[0]["bucket_hi"] == 3.0
    assert got[2]["bucket_hi"] == 9.0


def test_equi_width_hist_degenerate_single_value(spark):
    df = spark.createDataFrame([(1, 5.0), (2, 5.0)], "id long, x double")
    rows = feat.equi_width_hist(df, "x", bins=4).collect()
    assert len(rows) == 1 and rows[0]["bucket"] == 0 and rows[0]["n"] == 2


def test_equi_depth_scale_matches_ntile_form(spark):
    # ties included — the (value, id) total order must make buckets unique
    rows = [(i, float(v)) for i, v in enumerate([5, 1, 3, 3, 3, 9, 7, 1, 5, 2, 8, 4, 6])]
    df = spark.createDataFrame(rows, "id long, x double")
    for bins in (3, 4, 5, 13, 20):
        ref = {r["bucket"]: (r["n"], r["lo"], r["hi"])
               for r in feat.equi_depth_hist(df, "x", "id", bins=bins).collect()}
        got = {r["bucket"]: (r["n"], r["lo"], r["hi"])
               for r in feat.equi_depth_hist_scale(df, "x", "id", bins=bins).collect()}
        assert got == ref, f"bins={bins}: {got} != {ref}"


def test_equi_depth_scale_is_distributed(spark):
    """The scale form must not collapse to one partition for the rank."""
    plan = feat.equi_depth_hist_scale(
        _df(spark), "x", "id", bins=2
    )._jdf.queryExecution().executedPlan().toString()
    # dense_ids plans a range exchange, not a SinglePartition window sort
    assert "rangepartitioning" in plan.lower()


def test_psi_drift_identical_and_shifted(spark):
    import math

    from etl_demos_spark.operators.features import psi_drift

    same = spark.createDataFrame([(float(v % 100),) for v in range(500)], "value double")
    out = psi_drift(same, same, "value", lo=0.0, hi=100.0, n_bins=10).collect()[0]
    assert out["psi"] == 0.0 and out["n_ref"] == 500 and out["n_cur"] == 500

    lo_half = spark.createDataFrame([(float(v % 50),) for v in range(500)], "value double")
    hi_half = spark.createDataFrame([(float(50 + v % 50),) for v in range(500)], "value double")
    shifted = psi_drift(lo_half, hi_half, "value", lo=0.0, hi=100.0, n_bins=10).collect()[0]
    assert shifted["psi"] > 0.25  # industry "significant shift" threshold

    # python reference on a mixed case, including edge clamping
    ref_vals = [(-5.0,), (3.0,), (17.0,), (42.0,), (99.0,), (150.0,)]
    cur_vals = [(1.0,), (1.5,), (44.0,), (98.0,)]
    rdf = spark.createDataFrame(ref_vals, "value double")
    cdf = spark.createDataFrame(cur_vals, "value double")
    got = psi_drift(rdf, cdf, "value", lo=0.0, hi=100.0, n_bins=10).collect()[0]
    def bins(vals):
        c = [0] * 10
        for (v,) in vals:
            c[min(9, max(0, math.floor(v / 10.0)))] += 1
        return [x + 1 for x in c]
    sr, sc = bins(ref_vals), bins(cur_vals)
    tr, tc = sum(sr), sum(sc)
    psi = round(sum(
        round((a / tr - b / tc) * math.log((a / tr) / (b / tc)), 9)
        for a, b in zip(sr, sc)
    ), 9)
    assert got["psi"] == psi
    assert got["n_ref"] == len(ref_vals) and got["n_cur"] == len(cur_vals)


def test_poisson_bootstrap_ci_deterministic_and_sane(spark):
    import hashlib
    import math

    from etl_demos_spark.operators.features import (
        POISSON1_CDF,
        poisson_bootstrap_ci,
    )

    rows = [(i, float(round(10.0 + (i % 7) * 2.5, 2))) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, value double")
    out = poisson_bootstrap_ci(df, "value", "id", n_replicas=40).collect()[0]
    true_mean = sum(v for _, v in rows) / len(rows)
    assert out["n_rows"] == 300
    assert abs(out["mean"] - round(true_mean, 6)) < 1e-9
    assert out["ci_lo"] <= out["mean"] <= out["ci_hi"]
    # CI width ~ 2*1.96*sd/sqrt(n): sd≈5, n=300 → halfwidth ≈ 0.57
    assert 0.1 < out["ci_hi"] - out["ci_lo"] < 2.5

    # determinism across partitionings (weights are pure id/replica hashes)
    out2 = poisson_bootstrap_ci(
        df.repartition(13), "value", "id", n_replicas=40
    ).collect()[0]
    assert out == out2

    # weight ladder pinned to a python inverse-CDF reference
    def w_ref(i, b):
        h = int(hashlib.md5(f"{i}:{b}".encode()).hexdigest()[:15], 16)
        u = ((h % (1 << 52)) + 0.5) / float(1 << 52)
        for k, t in enumerate(POISSON1_CDF):
            if u < t:
                return k
        return 8
    # replica 0 mean recomputed from the reference weights
    s = n = 0
    for i, v in rows:
        w = w_ref(i, 0)
        s += w * round(v, 2)
        n += w
    # cross-check replica-0 aggregation in integer cents
    sc = sum(int(round(v * 100)) * w_ref(i, 0) for i, v in rows)
    assert n > 0 and abs(sc / 100.0 - s) < 1e-9


def test_poisson_bootstrap_xxhash_fast_path(spark):
    from etl_demos_spark.operators.features import poisson_bootstrap_ci

    rows = [(i, float(round(10.0 + (i % 7) * 2.5, 2))) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, value double")
    out = poisson_bootstrap_ci(
        df, "value", "id", n_replicas=40, base_hash="xxhash64"
    ).collect()[0]
    # same estimator, different replicate stream: point estimate exact,
    # CI brackets it with a sane width
    true_mean = sum(v for _, v in rows) / len(rows)
    assert abs(out["mean"] - round(true_mean, 6)) < 1e-9
    assert out["ci_lo"] <= out["mean"] <= out["ci_hi"]
    assert 0.1 < out["ci_hi"] - out["ci_lo"] < 2.5


def test_groupwise_ols_no_int64_overflow_on_large_values(spark):
    """Moment sums must accumulate in decimal, not wrapping int64: with
    values ~1e8 and scale=100 the quantized x·y products are ~1e20,
    past 2^63 — a post-sum cast would wrap silently (non-ANSI) and
    corrupt the slope. Exact closed form cross-checked in Python ints."""
    from etl_demos_spark.operators.features import groupwise_ols

    # y = 2x + 5e8 exactly, with x around 3e8 — slope must come out 2.0
    xs = [3.0e8 + 1000.0 * i for i in range(8)]
    rows = [("g", x, 2.0 * x + 5.0e8) for x in xs]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = groupwise_ols(df, "g", "x", "y", scale=100).collect()[0]
    assert out["n"] == 8
    # the moments are exact; the closed-form division in double space
    # loses ~5e-6 to cancellation (n·sxx vs sx² agree to 15 digits) —
    # an int64 wrap by contrast is off by ORDERS OF MAGNITUDE
    assert abs(out["slope"] - 2.0) < 1e-4
    assert abs(out["r2"] - 1.0) < 1e-4
    # intercept in ORIGINAL units (5e8); slope error × x̄ ≈ 1.5e3 slack
    assert abs(out["intercept"] - 5.0e8) < 1.0e4
