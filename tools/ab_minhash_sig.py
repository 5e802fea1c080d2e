#!/usr/bin/env python
"""A/B the MinHash signature stage (VERDICT r6 rec 5).

q_dedup_minhash is the standing slowest headliner (3.37 s min at r6);
its cost center is the signature stage: one exploded (id, gram) pass
feeding 128 codegen'd min() aggregates over affine transforms of a
base hash. Round 3 rejected an Arrow variant, but that predates
matutil and the codegen fix — this re-adjudicates both engine
implementations (operators/dedup.SIG_IMPL):

  codegen: JVM — 128 min-agg buffers, map-side partial aggregation,
     one shuffle of (id, 128 longs) partials.
  arrow:   single-pass mapInPandas — numpy computes the full
     (batch x 128) affine matrix per Arrow batch and reduces it to
     per-id partial minima vectorized, then a final groupBy(id) with
     the same 128 mins over ~n_partitions x n_ids partial rows.

Both produce IDENTICAL signatures (asserted before timing); timings
cover the signature stage alone AND the full q_dedup_minhash pipeline
(minhash_lsh_pairs). Interleaved sweeps, min-of-n + medians, one JSON
line. Round-7 outcome: arrow won both (sig stage 1.74 vs 2.17 min;
full query 2.41 vs 2.93) and is now the default.

Usage: python tools/ab_minhash_sig.py [sweeps]       # default 5
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_demos_spark.operators import dedup  # noqa: E402
from etl_demos_spark.operators.dedup import (  # noqa: E402
    exploded_shingles,
    minhash_lsh_pairs,
    minhash_signatures_from_grams,
)


def main() -> None:
    sweeps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from etl_demos_spark.data import load_table
    from etl_demos_spark.session import get_spark

    spark = get_spark("ab-minhash-sig")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    grams = exploded_shingles(docs, "doc_id", "text", 3, short_docs="whole")

    def sig_stage():
        return minhash_signatures_from_grams(grams, "id", "g", 128, "md5")

    def full_query():
        return minhash_lsh_pairs(docs, "doc_id", "text", n=3, threshold=0.4)

    # identical-output gate before any timing (both stages)
    outs = {}
    for impl in ("codegen", "arrow"):
        dedup.SIG_IMPL = impl
        outs[impl] = (
            {r["id"]: tuple(r["sig"]) for r in sig_stage().collect()},
            {
                (r["id_a"], r["id_b"]): round(r["est_jaccard"], 9)
                for r in full_query().collect()
            },
        )
    assert outs["codegen"] == outs["arrow"], "variants disagree — A/B void"

    runs: dict[str, list[float]] = {}
    stages = {"sig": sig_stage, "full": full_query}
    for impl in ("codegen", "arrow"):  # warm-up
        dedup.SIG_IMPL = impl
        for fn in stages.values():
            fn().write.format("noop").mode("overwrite").save()
    for _ in range(sweeps):
        for impl in ("codegen", "arrow"):
            dedup.SIG_IMPL = impl
            for sname, fn in stages.items():
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                fn().write.format("noop").mode("overwrite").save()
                runs.setdefault(f"{sname}:{impl}", []).append(
                    time.perf_counter() - t0
                )
    dedup.SIG_IMPL = "arrow"  # restore the default

    out = {
        "sweeps": sweeps,
        "sf_dir": sf_dir,
        "n_docs": docs.count(),
        "identical_output": True,
        "min": {k: round(min(v), 3) for k, v in runs.items()},
        "median": {k: round(statistics.median(v), 3) for k, v in runs.items()},
        "all": {k: [round(x, 3) for x in v] for k, v in runs.items()},
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
