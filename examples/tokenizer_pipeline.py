#!/usr/bin/env python
"""Runnable example: tokenizer induction → token-budget accounting →
sequence packing → deterministic shard export, end to end.

    python examples/tokenizer_pipeline.py [sf_dir]

The "last mile" of a training-data pipeline: after cleaning and dedup,
documents become packed token sequences. This wires the operators the
way a pretraining data job would:

1. incremental dedup of the batch against a signature store
   (dedup.incremental_minhash_dedup),
2. BPE merge learning over the surviving corpus (bpe.learn_bpe_merges
   — work bounded by vocabulary, not corpus),
3. encoding + exact token accounting (bpe.apply_merges),
4. packing into fixed token budgets (trainprep.pack_sequences),
5. deterministic shard export (trainprep.write_training_shards).
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F

from etl_demos_spark.operators import bpe, dedup, trainprep
from etl_demos_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("tokenizer-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # 1. dedup the "new batch" (all docs, empty store → first increment)
    kept_ids, store = dedup.incremental_minhash_dedup(
        docs, None, threshold=0.5
    )
    corpus = docs.join(kept_ids, "doc_id")
    n_in, n_kept = docs.count(), corpus.count()
    print(f"dedup: {n_in} docs in, {n_kept} kept "
          f"({n_in - n_kept} near-dups dropped); store rows={store.count()}")

    # 2. learn a merge table from the deduped corpus
    merges = bpe.learn_bpe_merges(corpus, n_merges=32)
    print(f"bpe: learned {len(merges)} merges; first 5: {merges[:5]}")

    # 3. encode + token accounting
    enc = bpe.apply_merges(corpus, merges).withColumn(
        "n_tokens", F.size("bpe_tokens").cast("long")
    )
    stats = enc.agg(
        F.sum("n_tokens").alias("total_tokens"),
        F.avg("n_tokens").alias("avg_tokens"),
    ).collect()[0]
    print(f"encode: total_tokens={stats['total_tokens']} "
          f"avg/doc={stats['avg_tokens']:.1f}")

    # 4. pack into 2048-token training rows
    packed = trainprep.pack_sequences(
        enc.select("doc_id", "n_tokens"), target=2048
    )
    n_packs = packed.select("bucket", "seq_id").distinct().count()
    print(f"pack: {n_packs} sequences at target 2048")

    # 5. deterministic shard export
    with tempfile.TemporaryDirectory() as td:
        out = f"{td}/shards"
        trainprep.write_training_shards(
            corpus.select("doc_id", "text"), out, n_shards=4
        )
        n_files = len(list(Path(out).glob("part-*.parquet")))
        total = spark.read.parquet(out).count()
        print(f"export: {n_files} shard files, {total} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
