#!/usr/bin/env python
"""Runnable example: model-in-the-loop training-data SELECTION.

    python examples/data_selection.py [sf_dir]

The round-4 operator families composed the way a data-curation team
would: train a quality classifier on the corpus itself, pick the
documents that look like the target domain with DSIR importance
resampling, then QUANTIFY what was selected — sketch-estimated overlap
with the target population, a PSI drift check between the selection and
the full corpus, and a bootstrap confidence interval on the headline
statistic. Everything is deterministic (md5-derived randomness), so a
re-run reproduces the same selection bit-for-bit.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F

from etl_demos_spark.operators import classifier as clf
from etl_demos_spark.operators import dsir, sketches
from etl_demos_spark.operators.features import poisson_bootstrap_ci, psi_drift
from etl_demos_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("data-selection")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()

    # 1. train a quality classifier on the corpus — the label is a
    #    lexical gate (does the doc mention the topic term?), the
    #    stand-in for "docs an annotator marked good"; batch-GD
    #    logistic regression with exact integer state,
    #    bit-deterministic on any partitioning
    feats = clf.hashed_features(docs, "text", "doc_id", 512)
    labels = docs.select(
        "doc_id",
        F.array_contains(F.split(F.lower("text"), r"\s+"), "spark")
        .cast("long")
        .alias("y"),
    )
    weights = clf.train_logreg(feats, labels, n_buckets=512, lr=1.0, iters=5)
    scored = clf.predict(feats, weights, "doc_id")
    acc = (
        scored.join(labels, "doc_id")
        .select((F.col("pred").cast("long") == F.col("y")).cast("long").alias("hit"))
        .agg(F.avg("hit").alias("a")).collect()[0]["a"]
    )

    # 2. DSIR importance resampling toward the target domain: keep the
    #    quarter of the corpus that looks most target-like, by Gumbel
    #    top-k over exact integer importance scores
    k = max(10, n0 // 4)
    target_ids = docs.filter(F.col("lang") == "en").select("doc_id")
    # persisted: drives the overlap sketch, PSI, bootstrap and two
    # counts below — without it the full feature/score/top-k pipeline
    # re-executes per consumer
    selected = dsir.dsir_select(docs, target_ids, k=k, n_buckets=2048).persist()
    n_selected = selected.count()
    sel_ids = selected.select("doc_id")

    # 3. how target-like IS the selection? KMV sketch overlap between
    #    the selected ids and the target population — two 256-row
    #    sketches, no distinct-join
    sk_sel = sketches.kmv_sketch(
        sel_ids.withColumn("g", F.lit("x")), ("g",), "doc_id", k=256
    )
    sk_tgt = sketches.kmv_sketch(
        target_ids.withColumn("g", F.lit("x")), ("g",), "doc_id", k=256
    )
    overlap = sketches.kmv_set_estimate(sk_sel, sk_tgt, ("g",), k=256).collect()[0]

    # 4. did the selection shift the length distribution? PSI between
    #    corpus and selection on n_chars
    sel_docs = docs.join(sel_ids, "doc_id", "left_semi")
    drift = psi_drift(docs, sel_docs, "n_chars", lo=0.0, hi=2000.0).collect()[0]

    # 5. headline stat with uncertainty: mean selected doc length ± CI
    ci = poisson_bootstrap_ci(sel_docs, "n_chars", "doc_id", n_replicas=50)
    ci_row = ci.collect()[0]

    print(f"corpus docs            : {n0}")
    print(f"classifier train acc   : {acc:.3f}")
    print(f"DSIR selected          : {n_selected} (k={k})")
    print(
        "selection∩target (KMV) : "
        f"jacc={overlap['jacc']} est_inter={overlap['est_inter']}"
    )
    print(f"length drift (PSI)     : {drift['psi']}")
    print(
        "mean length (bootstrap): "
        f"{ci_row['mean']} [{ci_row['ci_lo']}, {ci_row['ci_hi']}]"
    )

    ok = (
        acc >= 0.6
        and n_selected == k
        and overlap["jacc"] > 0
        and ci_row["ci_lo"] <= ci_row["mean"] <= ci_row["ci_hi"]
    )
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
