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
line (harness shared with ab_simhash_sig.py via ab_common.run_sig_ab).
Round-7 outcome: arrow won both (sig stage 1.74 vs 2.17 min; full
query 2.47 vs 2.84) and is now the default.

Usage: python tools/ab_minhash_sig.py [sweeps]       # default 5
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.ab_common import run_sig_ab  # noqa: E402

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

    print(
        run_sig_ab(
            spark,
            stages={
                "sig": lambda: minhash_signatures_from_grams(
                    grams, "id", "g", 128, "md5"
                ),
                "full": lambda: minhash_lsh_pairs(
                    docs, "doc_id", "text", n=3, threshold=0.4
                ),
            },
            collect_keys={
                "sig": lambda r: (r["id"], tuple(r["sig"])),
                "full": lambda r: (
                    r["id_a"], r["id_b"], round(r["est_jaccard"], 9)
                ),
            },
            sweeps=sweeps,
            extra={"sf_dir": sf_dir, "n_docs": docs.count()},
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
