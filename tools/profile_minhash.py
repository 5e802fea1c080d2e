"""Stage profile of q_dedup_minhash's post-signature cost (VERDICT r7
rec 6): with the signature stage Arrow-optimal, where does the
remaining time go — banded candidate generation, the candidate dedup
shuffle, or the 1 KB-signature verify fetch?

Times CUMULATIVE prefixes of the pipeline (each as its own action on
the same localCheckpointed signature base, warm, min-of-3):

  sigs      = shingle + minhash signatures (materialized)
  cands     = banding + bucket self-join + pair dedup      (count)
  pairs     = + verify fetch (2 sig joins) + est filter    (count)

Differences isolate each stage. Also prints the executed plan's join
strategies for the verify fetch so the AQE broadcast question is
answered by evidence, not assumption.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from etl_demos_spark.data import load_table  # noqa: E402
from etl_demos_spark.operators import dedup as dd  # noqa: E402
from etl_demos_spark.operators.matutil import materialize_reused  # noqa: E402
from etl_demos_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N, K, BANDS, THRESH = 3, 128, 32, 0.5


def main() -> None:
    spark = get_spark("profile-minhash")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF_DIR, "documents")
    rows = K // BANDS

    def build_sigs():
        grams = dd.exploded_shingles(docs, "doc_id", "text", N,
                                     short_docs="whole")
        return dd.minhash_signatures_from_grams(grams, "id", "g", K, "md5")

    def cands_of(sigs):
        banded = dd.banded_buckets(sigs, BANDS, rows)
        right = banded.select(F.col("id").alias("id2"), "band", "bucket")
        return (
            banded.join(right, ["band", "bucket"])
            .filter(F.col("id") < F.col("id2"))
            .select("id", "id2")
            .dropDuplicates(["id", "id2"])
        )

    def pairs_of(sigs, cands):
        verified = cands.join(sigs, "id").join(
            sigs.select(F.col("id").alias("id2"), F.col("sig").alias("sig2")),
            "id2",
        )
        est = F.size(
            F.filter(F.zip_with("sig", "sig2", lambda a, b: a == b),
                     lambda x: x)
        ) / F.lit(float(K))
        return verified.select("id", "id2", est.alias("est")).filter(
            F.col("est") >= THRESH
        )

    # warm-up: full pipeline once (codegen/classload)
    sigs_w = materialize_reused(build_sigs())
    pairs_of(sigs_w, cands_of(sigs_w)).count()

    t_sig, t_cand, t_pair = [], [], []
    counts = {}
    for _ in range(3):
        t0 = time.perf_counter()
        sigs = materialize_reused(build_sigs())  # action inside
        t1 = time.perf_counter()
        cands = cands_of(sigs)
        counts["cands"] = cands.count()
        t2 = time.perf_counter()
        counts["pairs"] = pairs_of(sigs, cands).count()
        t3 = time.perf_counter()
        t_sig.append(t1 - t0)
        t_cand.append(t2 - t1)
        t_pair.append(t3 - t2)

    sigs = materialize_reused(build_sigs())
    counts["sigs"] = sigs.count()
    p = pairs_of(sigs, cands_of(sigs))
    p.count()
    plan = p._jdf.queryExecution().executedPlan().toString()
    joins = {
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "sortmerge_joins": plan.count("SortMergeJoin"),
        "shuffledhash_joins": plan.count("ShuffledHashJoin"),
    }
    print(json.dumps({
        "sf_dir": SF_DIR,
        "counts": counts,
        "sig_stage_min_s": round(min(t_sig), 3),
        "cand_stage_min_s": round(min(t_cand), 3),
        "verify_stage_min_s": round(min(t_pair), 3),
        "verify_plan_joins": joins,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
