#!/usr/bin/env python
"""Full-registry timing sweep — the bench window's blind-spot detector.

bench.py times the 54 headliners; the registry holds ~178 queries.
Round 7 found five real plan problems (10.5 s q_null_safe_join, 10 s
q_bootstrap_ci, 4 s basket-pair family, …) hiding entirely outside the
bench window. This tool mechanizes that hunt for every future round:

  1. one cold pass over EVERY registered query (catches errors too);
  2. warm min-of-N re-measurement of the slowest ``top`` cold queries;
  3. a report flagging warm-slow queries that are NOT in the bench
     window (the blind spot), sorted by time.

A flagged query is not automatically wrong — iterative operators and
certification queries have honest multi-job floors (see
perf/tail_sweep_r7.json's triage) — but every flag must be explained
or fixed, not unmeasured.

Usage: python tools/tail_sweep.py [top] [sweeps]    # defaults 16, 3
Prints one JSON line; exits 0 always (reporting tool, not a gate).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import force  # noqa: E402


def main() -> None:
    top = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    sweeps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from etl_demos_spark.session import get_spark
    import etl_demos_spark.workload_ext  # noqa: F401
    from etl_demos_spark.workload import REGISTRY
    import bench

    benched_source = "bench.HEADLINE"
    benched = set(getattr(bench, "HEADLINE", []) or [])
    if not benched:
        # fall back to the committed detail artifact — resolved from
        # the repo root, not the cwd, and a failure is REPORTED: with
        # benched silently empty every headliner would be flagged as a
        # blind-spot finding (100% false positives)
        detail = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "perf",
            "bench_detail_latest.json",
        )
        try:
            benched = set(json.load(open(detail))["queries_min"])
            benched_source = detail
        except Exception as e:
            benched_source = f"UNAVAILABLE ({type(e).__name__}) — benched-flags unreliable"

    spark = get_spark("tail-sweep")
    spark.sparkContext.setLogLevel("ERROR")

    cold: dict[str, float | str] = {}
    for name, w in REGISTRY.items():
        spark.catalog.clearCache()
        try:
            t0 = time.perf_counter()
            force(w.fn(spark, sf_dir))
            cold[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # errors are findings, not crashes
            cold[name] = f"ERR {type(e).__name__}"

    suspects = [
        k
        for k, v in sorted(
            ((k, v) for k, v in cold.items() if isinstance(v, float)),
            key=lambda kv: -kv[1],
        )
    ][:top]

    warm: dict[str, float] = {}
    warm_errors: dict[str, str] = {}
    for _ in range(sweeps):
        for name in suspects:
            spark.catalog.clearCache()
            try:
                t0 = time.perf_counter()
                force(REGISTRY[name].fn(spark, sf_dir))
                dt = time.perf_counter() - t0
            except Exception as e:
                # a warm-only failure (memory pressure, flake) is a
                # finding — it must not discard the whole sweep
                warm_errors[name] = f"ERR {type(e).__name__}"
                continue
            warm[name] = min(warm.get(name, dt), dt)

    flags = [
        {"query": n, "warm_min_sec": round(warm[n], 3), "benched": n in benched}
        for n in sorted(warm, key=lambda n: -warm[n])
    ]
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "n_queries": len(cold),
                "benched_source": benched_source,
                "errors": {k: v for k, v in cold.items() if isinstance(v, str)},
                "warm_errors": warm_errors,
                "blind_spot": [f for f in flags if not f["benched"]],
                "flags": flags,
                "cold": cold,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
