#!/usr/bin/env python
"""Run the join/agg headliners against the zipf-skewed 10x set
(VERDICT r7 rec 5) and record (a) wall time vs the uniform 10x set,
(b) plan evidence that the skew machinery engages.

Queries: q_star_join (lineitem->supplier->nation star, the flagship),
q_group_agg, q_join_agg. q_dedup_minhash is deliberately NOT run here:
documents.parquet is byte-identical between /tmp/sf1 and /tmp/sf1skew
(the skew remap targets join/agg foreign keys), so a skewed run would
re-measure the uniform number; content-skew for LSH means duplicate
text, whose cost is quadratic TRUE OUTPUT (every pair of an 18k-copy
cluster is a real duplicate pair), not shuffle imbalance — covered by
the dup-family output-growth analysis in perf/bench_sf1_r7.json.

Skew-join handling is AQE's job (spark.sql.adaptive.skewJoin, on in
session.RUNTIME_CONFS); this tool asserts the hot key actually skews
the shuffle by reading the final adaptive plan for each query and
recording whether `skew=true` appears (it only can on sort-merge
joins; broadcast joins are skew-immune by construction — a hot probe
key never shuffles, which is itself the skew answer and is recorded
as "broadcast" evidence).

Usage:
  python tools/make_sf1.py /tmp/sf1           # once
  python tools/make_sf1_skew.py /tmp/sf1skew  # once
  python tools/skew_stress.py                 # prints one JSON line
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = ("q_star_join", "q_group_agg", "q_join_agg")
RUNS = 3


def main() -> None:
    uni = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    skew = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1skew"

    from etl_demos_spark import workload, workload_ext  # noqa: F401
    from etl_demos_spark.session import get_spark

    spark = get_spark("skew-stress")
    spark.sparkContext.setLogLevel("ERROR")

    out = {"uniform_dir": uni, "skew_dir": skew, "queries": {}}
    for name in QUERIES:
        fn = workload.REGISTRY[name].fn
        rec = {}
        for label, d in (("uniform", uni), ("skew", skew)):
            times = []
            for _ in range(RUNS):
                t0 = time.perf_counter()
                fn(spark, d).collect()
                times.append(round(time.perf_counter() - t0, 3))
            df = fn(spark, d)
            df.collect()  # materialize so the ADAPTIVE plan is final
            plan = df._jdf.queryExecution().executedPlan().toString()
            rec[label] = {
                "min_s": min(times),
                "all_s": times,
                "skew_split": "skew=true" in plan,
                "broadcast_join": "BroadcastHashJoin" in plan,
                "sortmerge_join": "SortMergeJoin" in plan,
            }
        rec["skew_over_uniform"] = round(
            rec["skew"]["min_s"] / rec["uniform"]["min_s"], 2
        )
        out["queries"][name] = rec

    # Affirmative AQE-skew-split evidence: the production headliner
    # plans broadcast every dimension, so the hot key never reaches a
    # shuffle — skew-immune by construction, and skew_split can never
    # appear. Forcing the join to sort-merge (broadcast threshold off)
    # recreates the plan a 100 TB fact-fact join would get and shows
    # AQE splitting the hot partition at runtime on this real data.
    fn = workload.REGISTRY["q_star_join"].fn
    forced = {}
    # advisoryPartitionSizeInBytes must shrink with the thresholds: a
    # partition that passes the threshold/factor skew test still won't
    # split if it is smaller than the advisory target (the split spec
    # degenerates to one chunk and the skew flag is dropped) — at test
    # scale the ~10 MB hot partition sits under the 64 MB default; at
    # 100 TB hot partitions dwarf it and the defaults engage.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2MB"
    )
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2MB")
    try:
        for label, d in (("uniform", uni), ("skew", skew)):
            times = []
            for _ in range(RUNS):
                t0 = time.perf_counter()
                fn(spark, d).collect()
                times.append(round(time.perf_counter() - t0, 3))
            df = fn(spark, d)
            df.collect()
            plan = df._jdf.queryExecution().executedPlan().toString()
            forced[label] = {
                "min_s": min(times),
                "all_s": times,
                "skew_split": "skew=true" in plan,
                "sortmerge_join": "SortMergeJoin" in plan,
            }
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
        )
        spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
        spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    out["forced_smj_star_join"] = forced
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
