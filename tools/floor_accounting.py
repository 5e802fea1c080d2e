#!/usr/bin/env python
"""Per-query scheduling-floor accounting (VERDICT r5 rec 6).

The h2h tail — queries ≥20× DuckDB at sf0.1 — is dominated by Spark's
fixed per-query cost (job scheduling, stage setup, codegen cache hits,
Python-runner spin-up for Arrow UDF plans), which is invariant in data
size and amortizes away at the 100 TB design point. This tool SEPARATES
that fixed floor from data-proportional work instead of asserting it:

  floor      = wall time of the SAME query over the same-schema tables
               with ZERO rows (limit(0) snapshot of sf0.001) — everything
               that remains when there is no data;
  data part  = sf0.1 time − floor.

A query whose sf0.1 time is NOT mostly floor has a real plan problem and
gets fixed, not explained. Queries that semantically require non-empty
inputs (collected centroids/query vectors) fall back to sf0.001 as the
floor proxy (annotated — it is an upper bound on the true floor).

Methodology: one untimed warm-up sweep, then 3 timed interleaved sweeps
per size, min-of-n reported (the floor is a fixed cost — min is the
right estimator; medians also recorded).

Usage: python tools/floor_accounting.py q_a q_b ...     # explicit list
       python tools/floor_accounting.py --from-h2h perf/h2h_sf0.1_r6.json [min_ratio]
Prints one JSON line.

--sf1 DIR (VERDICT r6 rec 4) adds a 10x-data sweep: the floor model
predicts sf1 ≈ floor + 10 x data_sec (fixed cost unchanged, data part
linear in rows); the output gains per-row `sf1_sec`, `sf1_pred_sec`,
and `sf1_delta` (measured − predicted, negative = faster than the
linear model, i.e. sublinear data cost). Generate DIR first with
tools/make_sf1.py. A floor-dominated query should barely move; a query
whose sf1 time blows past its prediction has a hidden superlinear term
and gets a plan fix, not an amortization story.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import force  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

SWEEPS = 3
EMPTY_DIR = "/tmp/sf_empty"


def build_empty_dir(spark, src="/root/testdata/sf0.001") -> None:
    from etl_demos_spark.data import load_table

    # always rebuilt (cheap: ten zero-row files) — a cached snapshot
    # would go stale if a table's schema changes between rounds and the
    # floor would silently be measured against the wrong schema
    for t in TABLES:
        load_table(spark, src, t).limit(0).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{EMPTY_DIR}/{t}.parquet")


def main() -> None:
    args = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    sf1_dir = None
    if "--sf1" in args:
        i = args.index("--sf1")
        if i + 1 >= len(args):
            print(json.dumps({"error": "--sf1 requires a directory operand"}))
            sys.exit(2)
        sf1_dir = args[i + 1]
        args = args[:i] + args[i + 2 :]

    from etl_demos_spark.session import get_spark
    import etl_demos_spark.workload_ext  # noqa: F401
    from etl_demos_spark.workload import REGISTRY

    if args and args[0] == "--from-h2h":
        min_ratio = float(args[2]) if len(args) > 2 else 20.0
        h2h = json.load(open(args[1]))
        names = [
            r["query"]
            for r in h2h["rows"]
            if r.get("spark_over_duck") and r["spark_over_duck"] >= min_ratio
        ]
    else:
        names = args
    names = [n for n in names if n in REGISTRY]
    if not names:
        print(json.dumps({"error": "no queries selected"}))
        return

    spark = get_spark("floor-accounting")
    spark.sparkContext.setLogLevel("ERROR")
    build_empty_dir(spark)

    sizes = {"empty": EMPTY_DIR, "sf0.001": "/root/testdata/sf0.001", "sf0.1": sf_dir}
    if sf1_dir:
        sizes["sf1"] = sf1_dir
    ok_empty: dict[str, bool] = {}
    # warm-up sweep + empty-viability probe
    for name in names:
        for sname, d in sizes.items():
            spark.catalog.clearCache()
            try:
                force(REGISTRY[name].fn(spark, d))
                if sname == "empty":
                    ok_empty[name] = True
            except Exception:
                if sname == "empty":
                    ok_empty[name] = False
                else:
                    raise

    runs: dict[tuple[str, str], list[float]] = {}
    for _ in range(SWEEPS):
        for name in names:
            for sname, d in sizes.items():
                if sname == "empty" and not ok_empty[name]:
                    continue
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                force(REGISTRY[name].fn(spark, d))
                runs.setdefault((name, sname), []).append(
                    time.perf_counter() - t0
                )

    rows = []
    for name in names:
        get = lambda s: runs.get((name, s))  # noqa: E731
        mins = {
            s: round(min(rs), 3) for s in sizes if (rs := get(s)) is not None
        }
        meds = {
            s: round(statistics.median(rs), 3)
            for s in sizes
            if (rs := get(s)) is not None
        }
        floor_src = "empty" if ok_empty[name] else "sf0.001"
        floor = mins[floor_src]
        total = mins["sf0.1"]
        data_sec = round(max(0.0, total - floor), 3)
        row = {
            "query": name,
            "floor_sec": floor,
            "floor_source": floor_src,
            "sf001_sec": mins["sf0.001"],
            "sf01_sec": total,
            "data_sec": data_sec,
            "floor_share": round(floor / total, 3) if total else None,
            "medians": meds,
        }
        if "sf1" in mins:
            pred = round(floor + 10.0 * data_sec, 3)
            row["sf1_sec"] = mins["sf1"]
            row["sf1_pred_sec"] = pred
            row["sf1_delta"] = round(mins["sf1"] - pred, 3)
        rows.append(row)
        print(f"# {name}: floor={floor}s ({floor_src}) sf0.1={total}s"
              + (f" sf1={mins['sf1']}s pred={row['sf1_pred_sec']}s" if "sf1" in mins else ""),
              file=sys.stderr)

    print(json.dumps({"sweeps": SWEEPS, "rows": rows}))
    spark.stop()


if __name__ == "__main__":
    main()
