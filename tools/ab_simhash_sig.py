#!/usr/bin/env python
"""A/B the SimHash vote stage — companion to tools/ab_minhash_sig.py.

Same adjudication as the MinHash one (VERDICT r6 rec 5 extended to the
sibling operator): the codegen path feeds 60 vote-sum aggregates over
every exploded (id, gram) row; the arrow path (dedup.SIG_IMPL="arrow")
unpacks the (batch x 60) ±1 vote matrix per Arrow batch in numpy and
ships per-id partial sums to the final combine. Identical signatures
AND identical q_dedup_simhash pairs asserted before timing; interleaved
sweeps, min-of-n + medians, one JSON line.

Usage: python tools/ab_simhash_sig.py [sweeps]       # default 5
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
    shingled_docs,
    simhash_pairs,
    simhash_signatures,
)


def main() -> None:
    sweeps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from etl_demos_spark.data import load_table
    from etl_demos_spark.session import get_spark

    spark = get_spark("ab-simhash-sig")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    sh = shingled_docs(docs, "doc_id", "text", 3)

    def sig_stage():
        return simhash_signatures(sh, "id", "sh", "md5")

    def full_query():
        return simhash_pairs(docs, "doc_id", "text", n=3, max_hamming=8)

    outs = {}
    for impl in ("codegen", "arrow"):
        dedup.SIG_IMPL = impl
        outs[impl] = (
            {r["id"]: r["sig"] for r in sig_stage().collect()},
            {
                (r["id_a"], r["id_b"]): r["hamming"]
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
