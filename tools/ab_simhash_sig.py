#!/usr/bin/env python
"""A/B the SimHash vote stage — companion to tools/ab_minhash_sig.py.

Same adjudication as the MinHash one (VERDICT r6 rec 5 extended to the
sibling operator): the codegen path feeds 60 vote-sum aggregates over
every exploded (id, gram) row; the arrow path (dedup.SIG_IMPL="arrow")
unpacks the (batch x 60) ±1 vote matrix per Arrow batch in numpy and
ships per-id partial sums to the final combine. Identical signatures
AND identical q_dedup_simhash pairs asserted before timing; interleaved
sweeps, min-of-n + medians, one JSON line (harness shared via
ab_common.run_sig_ab). Round-7 outcome: arrow won (vote stage 2.11 →
1.77 s min; full pairs 4.53 → 4.21) and is the default.

Usage: python tools/ab_simhash_sig.py [sweeps]       # default 5
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.ab_common import run_sig_ab  # noqa: E402

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

    print(
        run_sig_ab(
            spark,
            stages={
                "sig": lambda: simhash_signatures(sh, "id", "sh", "md5"),
                "full": lambda: simhash_pairs(
                    docs, "doc_id", "text", n=3, max_hamming=8
                ),
            },
            collect_keys={
                "sig": lambda r: (r["id"], r["sig"]),
                "full": lambda r: (r["id_a"], r["id_b"], r["hamming"]),
            },
            sweeps=sweeps,
            extra={"sf_dir": sf_dir, "n_docs": docs.count()},
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
