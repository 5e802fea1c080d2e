#!/usr/bin/env python
"""10x scale receipt for the blocked-k-NN bitext miner (VERDICT r9 rec 1).

Runs q_bitext_mine at sf0.1 (2k vectors) and at the tools/make_sf1.py
10x replication (/tmp/sf1, 20k vectors with per-replica jitter), warm
min-of-3 to a noop sink on local[32]. The mine is exact two-sided k-NN,
so flops are quadratic in corpus size by construction — the receipt's
point is (a) the wall ratio is explained by flops, not a driver-side
bottleneck (nothing collects: the blocked path replaced
brute_force_topk's query-side collect this round), and (b) absolute
wall at 10x stays sane because the GEMM tiles parallelize.

Also cross-checks the mined-pair sets at sf0.1 between the blocked path
and the previous collect-based path (brute_force_topk) — the rework
must be output-identical, not just green at the certified SFs.

Usage: python tools/scale_bitext.py   # writes perf/scale_bitext_r10.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import SparkSession

    import etl_demos_spark.workload  # noqa: F401
    import etl_demos_spark.workload_ext as ext
    from etl_demos_spark.session import configure_runtime

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("scale-bitext")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "32g")
        .getOrCreate()
    )
    configure_runtime(spark)

    q = ext.q_bitext_mine
    out: dict = {
        "round": 10,
        "what": (
            "10x scale receipt for q_bitext_mine on the blocked two-sided "
            "k-NN (warm min-of-3, noop sink, local[32]; /tmp/sf1 = "
            "tools/make_sf1.py replication, embeddings 2k -> 20k). Exact "
            "mine: flops are quadratic by construction; the receipt pins "
            "that wall tracks flops with no driver-side collect anywhere."
        ),
        "results": {},
    }

    # output-identity gate: blocked vs the old collect-based k-NN at sf0.1
    from etl_demos_spark.operators import bitext, similarity

    def mine_with(topk_fn, sf_dir):
        orig = bitext.blocked_topk
        bitext.blocked_topk = topk_fn
        try:
            return {
                (r["src_id"], r["tgt_id"], r["cos_sim"], r["margin"])
                for r in q(spark, sf_dir).collect()
            }
        finally:
            bitext.blocked_topk = orig

    def collect_based(corpus, queries, k=10, **kw):
        return similarity.brute_force_topk(corpus, queries, k=k, **kw)

    sf01 = "/root/testdata/sf0.1"
    blocked_pairs = mine_with(similarity.blocked_topk, sf01)
    legacy_pairs = mine_with(collect_based, sf01)
    assert blocked_pairs == legacy_pairs, (
        len(blocked_pairs - legacy_pairs),
        len(legacy_pairs - blocked_pairs),
    )
    out["identical_to_collect_based_sf0.1"] = True
    out["pairs_sf0.1"] = len(blocked_pairs)

    for name, sf_dir in (("sf0.1", sf01), ("sf1", "/tmp/sf1")):
        df = q(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # warm
        times = []
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            q(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
        out["results"][name] = {
            "wall_min3": round(min(times), 3),
            "rows": q(spark, sf_dir).count(),
        }

    r = out["results"]
    out["time_ratio_10x"] = round(
        r["sf1"]["wall_min3"] / r["sf0.1"]["wall_min3"], 2
    )
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "perf",
        "scale_bitext_r10.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
