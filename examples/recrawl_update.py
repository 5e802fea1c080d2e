#!/usr/bin/env python
"""Runnable example: incremental recrawl processing end to end.

    python examples/recrawl_update.py [sf_dir]

Two crawl snapshots of the same corpus → CDC chunk diff (what actually
changed, token-weighted) → ONLY modified/added pages re-enter
processing (unchanged pages skip the pipeline — the versioning win) →
incremental chunk-store dedup strips every chunk the corpus has
already seen (boilerplate, syndicated spans, unchanged halves of
edited pages) → per-host churn + curation report. Exercises the r09
domain/versioning family the way a weekly recrawl job would.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F

from etl_demos_spark.operators import dedup
from etl_demos_spark.operators.domains import host_dedup_rollup
from etl_demos_spark.operators.versioning import churn_rollup, snapshot_chunk_diff
from etl_demos_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("recrawl-update")
    spark.sparkContext.setLogLevel("ERROR")

    old = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # The second snapshot is synthesized (testdata has one crawl):
    # %11 pages vanished, %7 got a tail edit, %5 a head edit, %13
    # spawned a brand-new page — the same deterministic churn model
    # the certified q_doc_versions query uses.
    did = F.col("doc_id")
    new = (
        old.filter(did % 11 != 0)
        .withColumn(
            "text",
            F.when(did % 7 == 0, F.concat("text", F.lit(" errata appended after review")))
            .when(did % 5 == 0, F.concat(F.lit("update notice posted today "), F.col("text")))
            .otherwise(F.col("text")),
        )
        .unionByName(
            old.filter(did % 13 == 0).select(
                (-did - 1).alias("doc_id"),
                F.concat(F.lit("fresh page covering "), F.col("text")).alias("text"),
                *[c for c in old.columns if c not in ("doc_id", "text")],
            )
        )
    )

    # 1. what changed? CDC chunk diff — resync means an edit only
    #    disturbs the chunks containing it, so change_ratio is a real
    #    content-reuse measure, not changed-or-not.
    diff = snapshot_chunk_diff(old, new, "doc_id", "text").localCheckpoint()
    by_status = {r["status"]: r["n"] for r in diff.groupBy("status").agg(F.count("*").alias("n")).collect()}
    print(f"diff: {by_status}")

    # 2. per-host churn accounting (added + retained == new tokens)
    dims = (
        old.select("doc_id", "source")
        .unionByName(new.select("doc_id", "source"))
        .groupBy("doc_id")
        .agg(F.first("source").alias("source"))
    )
    churn_rollup(diff, dims, "source").orderBy("source", "status").show(8)

    # 3. only changed content re-enters processing; unchanged pages
    #    (the majority of any real recrawl) skip the pipeline entirely
    todo_ids = diff.filter(F.col("status").isin("modified", "added")).select(
        F.col("id").alias("doc_id")
    )
    todo = new.join(todo_ids, "doc_id", "left_semi")

    # 4. the old snapshot's chunk store already holds every fingerprint
    #    the corpus has seen — the increment is chunked once and probed
    #    against fingerprints only (never old text). Cuts the unchanged
    #    halves of edited pages and recycled boilerplate in new ones.
    old_store = dedup.cdc_chunks(old, "doc_id", "text").select("chunk_fp").distinct()
    clean, store = dedup.incremental_cdc_dedup(todo, old_store, "doc_id", "text")
    stats = clean.agg(
        F.count("*").alias("docs"),
        F.sum("kept_tokens").alias("novel"),
        F.sum("removed_tokens").alias("already_seen"),
    ).collect()[0]
    print(
        f"reprocessed {stats['docs']} changed/new docs: "
        f"{stats['novel']} novel tokens kept, "
        f"{stats['already_seen']} already-seen tokens cut "
        f"(store now {store.count()} fingerprints)"
    )

    # 5. curation verdicts on the updated corpus
    host_dedup_rollup(new, "source", "doc_id", "text").groupBy("verdict").agg(
        F.count("*").alias("hosts"), F.sum("n_docs").alias("docs")
    ).orderBy("verdict").show()
    return 0


if __name__ == "__main__":
    sys.exit(main())
