"""A/B: q_bootstrap_ci replica-sum shapes (VERDICT r7 rec 3).

A = current production shape (operators/features.py poisson_bootstrap_ci):
    explode 50 replica ids -> one md5 per (row, replica) -> ONE keyed
    combiner groupBy(b) (50 groups, partial agg map-side).
B = 50-buffer single-aggregate shape: NO explode — one pass over the
    fact table computing, per replica b, sum(w_b*v) and sum(w_b) as 100
    aggregate buffers in a single agg (each row evaluates 50 md5s + 50
    Poisson CASE ladders inline).

Same hash math, same weights, byte-identical results required. The
question is purely physical: 50x row materialization + tiny shuffle
(A) vs 100-wide aggregation buffers and no row fan-out (B).

Interleaved min-of-5 at $SPARK_GRAFT_SF_DIR (default sf0.1); outputs
asserted identical before timing counts.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window as W

from etl_demos_spark.data import load_table
from etl_demos_spark.operators.dedup import md5_long
from etl_demos_spark.operators.features import (
    poisson_bootstrap_ci,
    poisson_weight,
)
from etl_demos_spark.session import configure_runtime

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N, ALPHA, SCALE = 50, 0.05, 100


def shape_b(df: DataFrame, value_col: str, id_col: str) -> DataFrame:
    """50-buffer single-aggregate Poisson bootstrap (no explode)."""
    base = df.select(
        F.col(id_col).alias("__id"),
        F.round(F.col(value_col).cast("double") * SCALE, 0)
        .cast("long")
        .alias("__v"),
    )
    # one md5 uniform + weight per replica, all evaluated per input row
    aggs = []
    for b in range(N):
        key = F.concat(F.col("__id").cast("string"), F.lit(f":{b}"))
        h = md5_long(key)
        u = ((h % F.lit(1 << 52)).cast("double") + F.lit(0.5)) / F.lit(
            float(1 << 52)
        )
        w = poisson_weight(u)
        aggs.append(F.sum(w * F.col("__v")).cast("long").alias(f"s{b}"))
        aggs.append(F.sum(w).cast("long").alias(f"n{b}"))
    aggs.append(F.count(F.lit(1)).cast("long").alias("n_rows"))
    aggs.append(F.sum("__v").cast("long").alias("v_tot"))
    wide = base.agg(*aggs)
    # unpivot the 50 (s, n) pairs back to rows; stack is codegen'd
    stack_args = ", ".join(f"{b}L, s{b}, n{b}" for b in range(N))
    mean_b = (
        wide.selectExpr(
            "n_rows", "v_tot", f"stack({N}, {stack_args}) AS (b, s, n)"
        )
        .select(
            "n_rows",
            "v_tot",
            "b",
            F.when(
                F.col("n") > 0,
                F.round(
                    F.col("s").cast("double")
                    / F.col("n").cast("double")
                    / F.lit(float(SCALE)),
                    6,
                ),
            ).otherwise(F.lit(None).cast("double")).alias("m"),
        )
        .filter(F.col("m").isNotNull())
    )
    wnd = W.partitionBy().orderBy("m", "b")
    ranked = mean_b.select(
        "n_rows", "v_tot", "m",
        F.row_number().over(wnd).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy()).alias("nb"),
    )
    lo = F.ceil(F.lit(ALPHA / 2.0) * F.col("nb")).cast("int")
    hi = F.ceil(F.lit(1.0 - ALPHA / 2.0) * F.col("nb")).cast("int")
    return ranked.groupBy("n_rows", "v_tot").agg(
        F.max(F.when(F.col("rn") == lo, F.col("m"))).alias("ci_lo"),
        F.max(F.when(F.col("rn") == hi, F.col("m"))).alias("ci_hi"),
    ).select(
        "n_rows",
        F.round(
            F.col("v_tot").cast("double")
            / F.col("n_rows").cast("double")
            / F.lit(float(SCALE)),
            6,
        ).alias("mean"),
        "ci_lo",
        "ci_hi",
        F.lit(N).cast("long").alias("n_replicas"),
    )


def main() -> None:
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName("ab-bootstrap")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    configure_runtime(spark)
    ev = load_table(spark, SF_DIR, "events")

    def run_a():
        return poisson_bootstrap_ci(ev, "value", "event_id", n_replicas=N,
                                    alpha=ALPHA, scale=SCALE)

    def run_b():
        return shape_b(ev, "value", "event_id")

    ra = [tuple(r) for r in run_a().collect()]
    rb = [tuple(r) for r in run_b().collect()]
    assert ra == rb, f"A/B outputs differ:\nA={ra}\nB={rb}"
    print("outputs identical:", ra)

    times = {"A_explode_groupby": [], "B_50buffer_agg": []}
    for _ in range(5):
        for label, fn in (("A_explode_groupby", run_a),
                          ("B_50buffer_agg", run_b)):
            t0 = time.perf_counter()
            fn().collect()
            times[label].append(time.perf_counter() - t0)
    out = {k: {"min": min(v), "all": [round(x, 3) for x in v]}
           for k, v in times.items()}
    print(json.dumps({"sf_dir": SF_DIR, "identical": True, **out}))


if __name__ == "__main__":
    main()
