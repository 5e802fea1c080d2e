"""Winnowing fingerprint properties."""

from __future__ import annotations

import pyspark.sql.functions as F

from etl_demos_spark.operators.text import char_ngram_hashes, winnow_fingerprints


def _fps(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    toked = df.select("doc_id", char_ngram_hashes("text", 7).alias("h"))
    out = toked.select("doc_id", winnow_fingerprints(F.col("h"), 8).alias("fp"))
    return {r["doc_id"]: set(r["fp"]) for r in out.collect()}


def test_identical_docs_share_all_fingerprints(spark):
    t = "the quick brown fox jumps over the lazy dog again and again today"
    fps = _fps(spark, [(1, t), (2, t.upper()), (3, "completely different content here ok")])
    assert fps[1] == fps[2]  # case-normalized
    assert fps[1] != fps[3]


def test_shared_passage_shares_fingerprints(spark):
    passage = "a long shared passage that should definitely produce common fingerprints"
    fps = _fps(
        spark,
        [
            (1, f"intro words first. {passage} and then one ending"),
            (2, f"other beginning text! {passage} with another tail"),
            (3, "nothing in common with those two documents at all whatsoever"),
        ],
    )
    assert fps[1] & fps[2], "overlapping passage must share fingerprints"
    assert not (fps[1] & fps[3] & fps[2])
