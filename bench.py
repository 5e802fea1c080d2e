#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced with the noop sink (full execution, no driver
collect) after a warm-up pass of the session.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


# Module-level so the DuckDB head-to-head harness (tools/head2head.py)
# times exactly the set the driver benches — no drift between the two.
HEADLINE = [
    # relational core (scales with sf)
    "q_star_join",
    "q_group_agg",
    "q_join_agg",
    "q_window_dedup",
    "q_project_cast",
    "q_date_join",
    # training-data extensions
    "q_dedup_exact",
    "q_dedup_minhash",
    "q_ann_cosine",
    "q_text_quality",
    "q_event_sessions",
    "q_event_sliding",
    "q_asof_join",
    "q_top_unshipped",
    "q_hash_split",
    "q_dedup_embedding",
    "q_ann_lsh",
    "q_decontaminate",
    "q_pack_sequences",
    "q_corpus_shuffle",
    "q_range_join",
    "q_rollup_cascade",
    "q_chunk_docs",
    "q_lm_quality",
    "q_snapshot_diff",
    "q_sketch_rollup",
    "q_text_search",
    "q_url_curation",
    "q_waiting_supplier",
    "q_cust_distribution",
    "q_fuzzy_join",
    "q_semantic_dedup",
    "q_market_share",
    "q_interval_merge",
    "q_gap_fill",
    "q_cohort_retention",
    "q_hierarchy",
    "q_hybrid_search",
    "q_local_volume",
    "q_product_profit",
    "q_disjunctive_rev",
    "q_supplier_cnt",
    "q_range_frame",
    "q_dup_spans",
    "q_kmv_distinct",
    "q_embed_covariance",
    "q_hll_distinct",
    "q_kmv_overlap",
    "q_dsir_select",
    "q_ppmi",
    "q_linear_score",
    "q_psi_drift",
    "q_trend_ols",
    "q_quantile_sketch",
    # r11 (VERDICT r10 rec 8): the 5 slowest former blind-spot entries
    # from the r10 tail sweep, folded in so the per-round bench covers
    # them (q_dedup_incremental/q_bfs_dist after their rec-3
    # fixture/operator split — perf/ab_tailflags_r11.json)
    "q_dedup_incremental",
    "q_bfs_dist",
    "q_lsh_recall",
    "q_bootstrap_ci",
    "q_dedup_text_e2e",
    # r11 tail-sweep's two new top flags (the e2e CC certification
    # queries registered r10/r11) — benched so the iterative floor is
    # tracked per round instead of living in the blind spot
    "q_dedup_image_e2e",
    "q_dedup_video_e2e",
    # r12 (VERDICT r11 rec 5): the ~4-5 s incremental image replay was
    # the last unbenched heavy query — folded in after its checkpoint
    # cadence A/B (perf/ab_imgincr_cadence_r12.json)
    "q_dedup_image_incremental",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from etl_demos_spark.session import get_spark
    import etl_demos_spark.workload_ext  # noqa: F401  (populates REGISTRY)
    from etl_demos_spark.workload import REGISTRY

    spark = get_spark("etl-demos-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    headline = [q for q in HEADLINE if q in REGISTRY]

    # Warm the JVM + parquet footers with one cheap pass.
    force(REGISTRY["q_group_agg"].fn(spark, sf_dir).limit(1))

    # Steady-state, drift-resistant methodology (PERF.md session-5
    # lesson: only interleaved same-session measurements are
    # load-bearing — cold-session drift is ±30%, bigger than most real
    # effects):
    #   sweep 0 (untimed): every query once — pays one-time codegen /
    #     classload / footer reads.
    #   sweeps 1..3 (timed): every query once PER SWEEP, A-B-C-A-B-C —
    #     slow session drift (JVM heap shape, GC cadence) lands evenly
    #     on all queries instead of on whichever ran last.
    # Per query we report the MEDIAN of the three interleaved timings
    # (the round-over-round headline, backward-comparable) and the MIN
    # (the stabler cross-boot estimator: the least-interfered run).
    # Cleared cache per timed run: several operators persist() reusable
    # intermediates (minhash/simhash signatures, LSH buckets); without
    # the clear, timed runs hit the previous run's cache until eviction.
    # Each timed run does the query's full work from the parquet scan.
    n_sweeps = 3
    runs: dict[str, list[float]] = {name: [] for name in headline}
    for name in headline:
        # clearCache inside the warm-up sweep too: without it every
        # persisting operator's intermediates accumulate simultaneously
        # before the first timed clear — eviction thrash at larger SFs
        spark.catalog.clearCache()
        force(REGISTRY[name].fn(spark, sf_dir))
    for _ in range(n_sweeps):
        for name in headline:
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            force(REGISTRY[name].fn(spark, sf_dir))
            runs[name].append(time.perf_counter() - t0)

    timings = {n: round(sorted(rs)[len(rs) // 2], 3) for n, rs in runs.items()}
    mins = {n: round(min(rs), 3) for n, rs in runs.items()}
    # dispersion: per-query relative spread (max−min)/median across the
    # interleaved sweeps, summarized by its median over queries — the
    # self-reported noise floor a round-over-round comparison must beat
    spreads = [
        (max(rs) - min(rs)) / sorted(rs)[len(rs) // 2]
        for rs in runs.values()
        if sorted(rs)[len(rs) // 2] > 0
    ]
    dispersion = round(sorted(spreads)[len(spreads) // 2], 4) if spreads else 0.0
    try:
        with open("/proc/sys/kernel/random/boot_id") as fh:
            boot_id = fh.read().strip()
    except OSError:
        boot_id = "unknown"
    # cpus from the ACTUAL SparkContext master (not the env var), so the
    # scaling contract is falsifiable: a reader can check the bench ran
    # at the core count it claims (VERDICT r11 rec 2).
    m = re.fullmatch(r"local\[(\d+)\]", spark.sparkContext.master or "")
    cpus = int(m.group(1)) if m else spark.sparkContext.defaultParallelism

    # The driver captures only the TAIL of stdout and json-parses the
    # last line — BENCH_r05 was lost ("parsed": null) because the line
    # carried TWO 54-query maps and outran the capture window. The
    # stdout line therefore keeps exactly the r01–r04 shape (one median
    # per-query map + scalars, ~1.5 KB, known to parse) and everything
    # bulkier — the min-of-n map and the raw per-sweep timings — goes
    # to perf/bench_detail_latest.json.
    out = {
        "metric": "headline query wall time (noop sink, interleaved sweeps)",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "value_min": round(sum(mins.values()), 3),
        "sweeps": n_sweeps,
        "dispersion_median_rel_spread": dispersion,
        "boot_id": boot_id,
        "cpus": cpus,
    }
    detail = dict(out, queries_min=mins, runs={n: [round(t, 4) for t in rs] for n, rs in runs.items()})
    perf_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "perf")
    try:
        os.makedirs(perf_dir, exist_ok=True)
        with open(os.path.join(perf_dir, "bench_detail_latest.json"), "w") as fh:
            json.dump(detail, fh, indent=1, sort_keys=True)
    except OSError as e:  # read-only checkout must not kill the bench line
        print(f"bench: could not write perf detail: {e}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
