#!/usr/bin/env python
"""A/B: fused bidirectional blocked k-NN vs two independent passes in
mine_bitext (r10).

The fused form (similarity.blocked_topk_bidirectional) builds the tile
grid once and reads S = src·tgtᵀ along both axes; the two-pass form
replicates/shuffles both corpora twice and multiplies twice. Identical
output is gated first (mined pairs pair-for-pair at both SFs), then
interleaved warm min-of-3 walls at sf0.1 (2k vectors) and /tmp/sf1
(20k — flop-bound, where the 2x GEMM saving should show).

Usage: python tools/ab_bitext_fused.py  # → perf/ab_bitext_fused_r10.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import SparkSession

    import etl_demos_spark.workload_ext as ext
    from etl_demos_spark.operators import bitext, similarity
    from etl_demos_spark.session import configure_runtime

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("ab-bitext-fused")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "32g")
        .getOrCreate()
    )
    configure_runtime(spark)

    q = ext.q_bitext_mine

    def two_pass_bidirectional(a, b, k=10, **kw):
        # the pre-fusion form: two independent blocked passes
        import pyspark.sql.functions as F

        fwd = similarity.blocked_topk(
            b,
            a.select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("query_vec"),
            ),
            k=k,
        )
        bwd = similarity.blocked_topk(
            a,
            b.select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("query_vec"),
            ),
            k=k,
        )
        return fwd, bwd

    def mine_with(impl, sf_dir):
        orig = bitext.blocked_topk_bidirectional
        bitext.blocked_topk_bidirectional = impl
        try:
            return q(spark, sf_dir)
        finally:
            bitext.blocked_topk_bidirectional = orig

    out: dict = {
        "round": 10,
        "what": (
            "mine_bitext fused bidirectional tile pass vs two independent "
            "blocked passes: identical-output gate, then interleaved warm "
            "min-of-3 walls (noop sink, local[32])."
        ),
        "results": {},
    }

    # identical-output gate at both SFs
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        fused = {tuple(r) for r in mine_with(
            similarity.blocked_topk_bidirectional, sf).collect()}
        two = {tuple(r) for r in mine_with(two_pass_bidirectional, sf).collect()}
        assert fused == two, (sf, len(fused - two), len(two - fused))
    out["identical_output"] = True

    impls = {
        "fused": similarity.blocked_topk_bidirectional,
        "two_pass": two_pass_bidirectional,
    }
    for sf_name, sf_dir in (("sf0.1", "/root/testdata/sf0.1"), ("sf1", "/tmp/sf1")):
        walls = {name: [] for name in impls}
        for name, impl in impls.items():  # warm-up
            mine_with(impl, sf_dir).write.format("noop").mode("overwrite").save()
        for _ in range(3):
            for name, impl in impls.items():
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                mine_with(impl, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                walls[name].append(time.perf_counter() - t0)
        out["results"][sf_name] = {
            name: round(min(ts), 3) for name, ts in walls.items()
        }
        out["results"][sf_name]["speedup"] = round(
            min(walls["two_pass"]) / min(walls["fused"]), 2
        )

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "perf",
        "ab_bitext_fused_r10.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
