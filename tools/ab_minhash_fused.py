#!/usr/bin/env python
"""A/B the round-8 FUSED MinHash signature path against the r7-adopted
two-stage Arrow path.

  arrow: JVM gram pipeline (tokenize → shingle → explode → md5 per
     gram) feeding the Arrow partial-min stage — every gram row
     crosses the Arrow boundary (~50x the document count).
  fused: ONE mapInPandas over raw (id, text) rows — tokenize/shingle/
     hashlib-md5/affine reduceat all in the Python worker; Arrow ships
     one row per DOCUMENT and the partials go through the same shared
     JVM combine (operators/dedup.minhash_signatures_from_docs).

Signatures and full-pipeline pairs are asserted identical before any
timing counts (bit-identity is also pinned by
tests/test_dedup.py::test_fused_signatures_bit_identical_to_codegen).
Interleaved sweeps via the shared harness; one JSON line.

Usage: python tools/ab_minhash_fused.py [sweeps]     # default 5
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.ab_common import run_sig_ab  # noqa: E402

from etl_demos_spark.operators.dedup import (  # noqa: E402
    minhash_lsh_pairs,
    minhash_signatures_from_docs,
)


def main() -> None:
    sweeps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from etl_demos_spark.data import load_table
    from etl_demos_spark.session import get_spark

    spark = get_spark("ab-minhash-fused")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")

    print(
        run_sig_ab(
            spark,
            stages={
                "sig": lambda: minhash_signatures_from_docs(
                    docs, "doc_id", "text", 3, 128, "md5"
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
            impls=("arrow", "fused"),
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
