#!/usr/bin/env python
"""Session-level interleaved A/B: spark.cleaner.periodicGC.interval
2min (the round-4 addition) vs 30min (effectively off for a bench-length
session), pattern A-B-A-B, same boot, same process.

Round-4's BENCH showed +13% on the 43 shared queries with NO code
change on most movers; the one session-wide change was periodic
System.gc() every 2 minutes — a full-GC pause lands inside whichever
query is running when the tick fires. Each arm here runs the mover set
for ~3 minutes (enough for the 2min tick to fire at least once), with
per-run wall-clock offsets recorded so GC-aligned spikes are visible.

Usage: python tools/ab_periodic_gc.py [sweeps=24]
Prints one JSON line: per-arm per-query medians + totals.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MOVERS = [
    "q_star_join",
    "q_group_agg",
    "q_text_search",
    "q_url_curation",
    "q_cohort_retention",
    "q_hybrid_search",
    "q_local_volume",
    "q_cust_distribution",
    "q_waiting_supplier",
    "q_hierarchy",
]


def run_arm(interval: str, sweeps: int, sf_dir: str):
    from etl_demos_spark.session import get_spark
    import etl_demos_spark.workload_ext  # noqa: F401
    from etl_demos_spark.workload import REGISTRY

    spark = get_spark(
        f"ab-gc-{interval}",
        extra_confs={"spark.cleaner.periodicGC.interval": interval},
    )
    spark.sparkContext.setLogLevel("ERROR")
    assert (
        spark.conf.get("spark.cleaner.periodicGC.interval") == interval
    ), "stale session reused — conf did not apply"

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    for name in MOVERS:  # warm-up sweep
        force(REGISTRY[name].fn(spark, sf_dir))
    t_arm0 = time.perf_counter()
    runs: dict[str, list[float]] = {n: [] for n in MOVERS}
    trace = []  # (offset_s, query, dur_s) — for spotting GC-aligned spikes
    for _ in range(sweeps):
        for name in MOVERS:
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            force(REGISTRY[name].fn(spark, sf_dir))
            dt = time.perf_counter() - t0
            runs[name].append(dt)
            trace.append((round(t0 - t_arm0, 1), name, round(dt, 3)))
    spark.stop()
    med = {n: round(sorted(v)[len(v) // 2], 3) for n, v in runs.items()}
    return {
        "interval": interval,
        "medians": med,
        "total_median": round(sum(med.values()), 3),
        "wall_s": round(time.perf_counter() - t_arm0, 1),
        "spikes": [t for t in trace if t[2] > 2.5 * med[t[1]]],
    }


def main() -> None:
    sweeps = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    arms = []
    for interval in ("2min", "30min", "2min", "30min"):
        arms.append(run_arm(interval, sweeps, sf_dir))
    agg = {}
    for iv in ("2min", "30min"):
        mine = [a for a in arms if a["interval"] == iv]
        agg[iv] = {
            "total_median_avg": round(
                sum(a["total_median"] for a in mine) / len(mine), 3
            ),
            "spike_count": sum(len(a["spikes"]) for a in mine),
        }
    print(json.dumps({"arms": arms, "summary": agg}))


if __name__ == "__main__":
    main()
