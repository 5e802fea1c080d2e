#!/usr/bin/env python
"""Interleaved A/B/C for resample_locf's obs materialization
(VERDICT r5 rec 4): q_gap_fill roughly doubled in r05 after obs gained
a persist(); the two-consumer reasoning is sound but the change was
never same-session A/B'd, and persist() additionally leaks a
CacheManager entry per call (ADVICE r5). Arms, one timed run each per
sweep, A-B-C-A-B-C so session drift lands evenly:

  none        — obs recomputed by both consumers (the r04 code)
  persist     — obs cached (the r05 code; leaky)
  checkpoint  — eager localCheckpoint (the r06 default)

Two sizes: the real sf0.1 events table, and a 10× synthetic (events
unioned 10 times under salted event_type values — more rows AND more
keys, so the two-consumer saving has something to save).

Usage: python tools/ab_gap_fill.py [sweeps=5]
Prints one JSON line with per-arm min/median per size, plus the
judge-requested context spot-checks (q_range_frame, q_dedup_embedding
— code unchanged since r04; timed here for the PERF.md record).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ARMS = ("none", "persist", "checkpoint")


def main() -> None:
    sweeps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from etl_demos_spark.data import load_table
    from etl_demos_spark.operators.asof import resample_locf
    from etl_demos_spark.session import get_spark
    import etl_demos_spark.workload_ext  # noqa: F401
    from etl_demos_spark.workload import REGISTRY, money, money_sum

    spark = get_spark("ab-gap-fill")
    spark.sparkContext.setLogLevel("ERROR")

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    ev = load_table(spark, sf_dir, "events")
    # 10× arm: same timestamps, salted key space (10 variants per type)
    big = ev.withColumn("__s", F.explode(F.sequence(F.lit(0), F.lit(9)))).withColumn(
        "event_type", F.concat_ws("_", "event_type", F.col("__s").cast("string"))
    ).drop("__s")
    # Materialize the 10× input once so arm timings measure the operator,
    # not the synthetic explode (parquet write = what a real caller reads).
    big_path = "/tmp/ab_gap_fill_big.parquet"
    big.write.mode("overwrite").parquet(big_path)
    big = spark.read.parquet(big_path)
    sizes = {"sf0.1": ev, "sf0.1x10keys": big}

    def run(df, mode):
        out = resample_locf(
            df,
            "ts",
            ("event_type",),
            (money_sum(money("value")).alias("hourly_value"),),
            step="1 hour",
            fill_cols=("hourly_value",),
            materialize=mode,
        )
        force(out)

    # warm-up: one pass per (size, arm)
    for df in sizes.values():
        for mode in ARMS:
            spark.catalog.clearCache()
            run(df, mode)

    runs: dict[str, dict[str, list[float]]] = {
        s: {a: [] for a in ARMS} for s in sizes
    }
    for _ in range(sweeps):
        for sname, df in sizes.items():
            for mode in ARMS:
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                run(df, mode)
                runs[sname][mode].append(time.perf_counter() - t0)

    # context spot-checks, same session, interleaved with nothing else
    spot = {}
    for name in ("q_range_frame", "q_dedup_embedding"):
        ts = []
        for _ in range(max(3, sweeps)):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            force(REGISTRY[name].fn(spark, sf_dir))
            ts.append(time.perf_counter() - t0)
        spot[name] = {"min": round(min(ts), 3), "median": round(sorted(ts)[len(ts) // 2], 3)}

    out = {
        "tool": "ab_gap_fill",
        "sweeps": sweeps,
        "arms": {
            s: {
                a: {
                    "min": round(min(rs), 3),
                    "median": round(sorted(rs)[len(rs) // 2], 3),
                }
                for a, rs in by_arm.items()
            }
            for s, by_arm in runs.items()
        },
        "spot_checks_sf0.1": spot,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
