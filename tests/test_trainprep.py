"""Training-data prep: decontamination, packing, deterministic shuffle,
PII redaction, end-to-end minhash dedup."""

from __future__ import annotations

import pyspark.sql.functions as F

from etl_demos_spark.operators import trainprep
from etl_demos_spark.operators.dedup import dedup_by_minhash
from etl_demos_spark.operators.text import redact_pii


def test_decontaminate_drops_overlapping_docs(spark):
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated sentence about spark engines"),
            (3, "another clean document with no leaked content at all"),
        ],
        "doc_id long, text string",
    )
    test = spark.createDataFrame(
        [(100, "benchmark asks about the quick brown fox story")],
        "doc_id long, text string",
    )
    report = {r["train_id"]: r["n_shared_grams"] for r in
              trainprep.contamination_report(train, test, n=3).collect()}
    # "the quick brown" and "quick brown fox" overlap; doc 2/3 are clean
    assert set(report) == {1} and report[1] == 2
    kept = trainprep.decontaminate(train, test, n=3)
    assert {r["doc_id"] for r in kept.collect()} == {2, 3}


def test_pack_sequences_budget_and_determinism(spark):
    docs = spark.createDataFrame(
        [(i, 60 + (i % 5) * 10) for i in range(200)], "doc_id long, n_tokens long"
    )
    packed = trainprep.pack_sequences(docs, "doc_id", "n_tokens", target=256, n_buckets=4)
    rows = packed.collect()
    assert len(rows) == 200  # every doc assigned exactly once
    by_seq: dict[tuple, list] = {}
    for r in rows:
        by_seq.setdefault((r["bucket"], r["seq_id"]), []).append(r)
    for (bucket, seq), members in by_seq.items():
        total = sum(m["n_tokens"] for m in members)
        largest = max(m["n_tokens"] for m in members)
        # streaming-packing bound: budget may overrun by < the last doc
        assert total < 256 + largest
        # seq_pos is a contiguous 0-based order within the sequence
        assert sorted(m["seq_pos"] for m in members) == list(range(len(members)))
    # sequences are filled: every non-final sequence in a bucket reaches
    # the budget (exclusive-prefix rule ⇒ next seq starts past target)
    per_bucket_last = {b: max(s for (bb, s) in by_seq if bb == b) for (b, _s) in by_seq}
    for (bucket, seq), members in by_seq.items():
        if seq < per_bucket_last[bucket]:
            assert sum(m["n_tokens"] for m in members) >= 256 - max(
                m["n_tokens"] for m in members
            )
    # deterministic: re-running yields the identical assignment
    again = trainprep.pack_sequences(docs, "doc_id", "n_tokens", target=256, n_buckets=4)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again.collect()))


def test_deterministic_shuffle_is_stable_permutation(spark):
    docs = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    out = {r["doc_id"]: r["shuffle_rank"] for r in
           trainprep.deterministic_shuffle(docs, "doc_id", seed="s0").collect()}
    assert sorted(out.values()) == list(range(1, 501))  # dense 1-based permutation
    again = {r["doc_id"]: r["shuffle_rank"] for r in
             trainprep.deterministic_shuffle(docs, "doc_id", seed="s0").collect()}
    assert out == again  # stable across runs
    other = {r["doc_id"]: r["shuffle_rank"] for r in
             trainprep.deterministic_shuffle(docs, "doc_id", seed="s1").collect()}
    assert out != other  # seed actually changes the order
    # not the identity/sorted order (it IS a shuffle)
    assert [out[i] for i in range(500)] != list(range(1, 501))


def test_redact_pii(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.org now"),
            (2, "see https://ex.io/a?b=c#d for details"),
            (3, "call 555-123-4567 or 555.123.4567"),
            (4, "ssn 123-45-6789 but not 1234-56-7890"),
            (5, "plain text stays untouched"),
        ],
        "id long, t string",
    )
    got = {r["id"]: r["red"] for r in df.select("id", redact_pii("t").alias("red")).collect()}
    assert got[1] == "mail [EMAIL] now"
    assert got[2] == "see [URL] for details"
    assert got[3] == "call [PHONE] or [PHONE]"
    # 1234-56-7890 has a 4-digit run before the boundary → not an SSN shape
    assert got[4] == "ssn [SSN] but not 1234-56-7890"
    assert got[5] == "plain text stays untouched"


def test_dedup_by_minhash_collapses_transitive_cluster(spark):
    base = (
        "spark engines shuffle data between stages using hash partitioning "
        "and sort based exchanges while catalyst optimizes logical plans "
        "into physical operators with whole stage code generation enabled"
    )
    docs = [(1, base), (2, base + " extra tail token"), (3, "x " + base)]
    # unrelated docs
    docs += [
        (10, "completely different content about cooking pasta with garlic and olive oil in rome"),
        (11, "yet another unrelated document describing mountain hiking trails in the alps region"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    kept = dedup_by_minhash(df, "doc_id", "text", n=3, threshold=0.4)
    ids = {r["doc_id"] for r in kept.collect()}
    # 1~2 and 1~3 are near-dups (2~3 may or may not pair directly —
    # connected components collapses the chain either way)
    assert ids == {1, 10, 11}


def test_mixture_sample_integer_rates_replicate_exactly(spark):
    docs = spark.createDataFrame(
        [(i, "a" if i < 10 else "b") for i in range(20)],
        "doc_id long, source string",
    )
    mixed = trainprep.mixture_sample(docs, "source", "doc_id", {"a": 3.0, "b": 0.0})
    rows = mixed.groupBy("source").count().collect()
    assert {r["source"]: r["count"] for r in rows} == {"a": 30}
    # replicas carry distinct copy ids
    copies = mixed.filter(F.col("doc_id") == 0).select("copy_id").collect()
    assert sorted(r["copy_id"] for r in copies) == [1, 2, 3]


def test_mixture_sample_fractional_rate_is_deterministic_subset(spark):
    docs = spark.createDataFrame(
        [(i, "a") for i in range(1000)], "doc_id long, source string"
    )
    m1 = trainprep.mixture_sample(docs, "source", "doc_id", {"a": 0.25})
    m2 = trainprep.mixture_sample(docs, "source", "doc_id", {"a": 0.25})
    ids1 = sorted(r["doc_id"] for r in m1.collect())
    assert ids1 == sorted(r["doc_id"] for r in m2.collect())  # no RNG
    assert 150 <= len(ids1) <= 350  # ~25% of 1000, hash-uniform
    # rate 1.25: every row once, the SAME deterministic quarter again
    m3 = trainprep.mixture_sample(docs, "source", "doc_id", {"a": 1.25})
    extra = sorted(
        r["doc_id"] for r in m3.filter(F.col("copy_id") == 2).collect()
    )
    assert extra == ids1


def test_temperature_rates_flatten_toward_uniform(spark):
    docs = spark.createDataFrame(
        [(i, "big" if i < 900 else "small") for i in range(1000)],
        "doc_id long, source string",
    )
    rates = {
        r["source"]: r["rate"]
        for r in trainprep.temperature_rates(docs, "source", alpha=0.5).collect()
    }
    # alpha<1 upweights the small source relative to its natural share
    assert rates["small"] > 1.0 > rates["big"]
    # budget is conserved: sum(rate * n) == corpus size
    total = 900 * rates["big"] + 100 * rates["small"]
    assert abs(total - 1000) < 1e-6
    # alpha=1 is a no-op (natural proportions)
    nat = {
        r["source"]: r["rate"]
        for r in trainprep.temperature_rates(docs, "source", alpha=1.0).collect()
    }
    assert abs(nat["big"] - 1.0) < 1e-9 and abs(nat["small"] - 1.0) < 1e-9


def test_repetition_stats_flags_boilerplate(spark):
    from etl_demos_spark.operators.text import repetition_stats

    docs = spark.createDataFrame(
        [
            (1, "buy now " * 50),                     # one bigram dominates
            (2, "the quick brown fox jumps over a lazy dog near town"),
        ],
        "doc_id long, text string",
    )
    stats = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert stats[1]["top_gram_frac"] > 0.4
    assert stats[1]["dup_gram_frac"] > 0.9
    assert stats[2]["dup_gram_frac"] == 0.0
    assert stats[2]["n_grams"] == 10  # 11 tokens -> 10 bigrams


def test_chunk_documents_shapes_and_overlap(spark):
    docs = spark.createDataFrame(
        [
            (1, "a" * 250),   # 3 chunks at size=128/stride=96
            (2, "b" * 96),    # exactly one stride -> 1 chunk
            (3, ""),          # empty doc -> one empty chunk
            (4, None),        # null text ≡ empty doc
        ],
        "doc_id long, text string",
    )
    out = trainprep.chunk_documents(docs, size=128, stride=96)
    rows = {(r["doc_id"], r["chunk_idx"]): r for r in out.collect()}
    assert sorted(rows) == [(1, 0), (1, 1), (1, 2), (2, 0), (3, 0), (4, 0)]
    assert rows[(1, 0)]["chunk_chars"] == 128
    assert rows[(1, 1)]["chunk_chars"] == 128   # 96..224 of 250
    assert rows[(1, 2)]["chunk_chars"] == 250 - 192
    # overlap: chunk i starts at i*stride, so last 32 chars of chunk 0
    # are the first 32 of chunk 1 (all 'a' here; verify via lengths)
    assert rows[(2, 0)]["chunk_chars"] == 96
    assert rows[(3, 0)]["chunk"] == "" and rows[(3, 0)]["chunk_chars"] == 0
    assert rows[(4, 0)]["chunk"] == "" and rows[(4, 0)]["chunk_chars"] == 0


def test_chunk_udtf_matches_builtin(spark):
    docs = spark.createDataFrame(
        [(i, ("xyz%d " % i) * (10 * i)) for i in range(1, 30)] + [(0, None)],
        "doc_id long, text string",
    )
    a = trainprep.chunk_documents(docs, size=64, stride=48)
    b = trainprep.chunk_documents_udtf(spark, docs, size=64, stride=48)
    ka = sorted(map(tuple, a.collect()))
    kb = sorted(map(tuple, b.collect()))
    assert ka == kb and len(ka) > 30


def test_write_training_shards_replays_global_order(spark, tmp_path):
    """Reading shard files in filename order, rows in file order, must
    replay the deterministic_shuffle global order exactly; shards are
    contiguous non-overlapping rank slices of roughly equal size."""
    import glob
    import pandas as pd
    from etl_demos_spark.operators.trainprep import (
        deterministic_shuffle,
        write_training_shards,
    )

    df = spark.range(500).select(F.col("id").alias("doc_id"))
    path = str(tmp_path / "shards")
    write_training_shards(df, path, 4, "doc_id", seed="e1")
    files = sorted(glob.glob(f"{path}/part-*.parquet"))
    assert len(files) == 4
    replay = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    expect = (
        deterministic_shuffle(df, "doc_id", "e1")
        .orderBy("shuffle_rank")
        .toPandas()
    )
    assert list(replay["doc_id"]) == list(expect["doc_id"])
    sizes = [len(pd.read_parquet(f)) for f in files]
    assert min(sizes) > 0 and max(sizes) - min(sizes) < 500 * 0.5


def test_negative_sampler_matches_python_reference(spark):
    """Full-pipeline pin vs a first-principles single-node reference:
    integer CDF by item order, u = md5('s:anchor:slot') 60-bit mod W,
    searchsorted inversion, positive exclusion. Proves the bucketized
    equi-join inversion is exactly CDF inversion (each draw resolves to
    the unique containing interval) and survives repartitioning."""
    import hashlib

    import numpy as np

    from etl_demos_spark.operators import negsample as ns

    counts = [(10 * i + 3, (i % 7) + 1) for i in range(40)]
    anchors = list(range(6))
    positives = [(a, 10 * ((a * 3) % 40) + 3) for a in anchors]
    k, seed = 4, "t1"

    cdf_rows = sorted(counts)
    ws = [int(round((c ** 0.75) * 1000)) for _, c in cdf_rows]
    cum = np.cumsum(ws)
    W = int(cum[-1])
    expect = set()
    pos_set = set(positives)
    for a in anchors:
        for j in range(1, k + 1):
            h = int(hashlib.md5(f"{seed}:{a}:{j}".encode()).hexdigest()[:15], 16)
            u = h % W
            idx = int(np.searchsorted(cum, u, side="right"))
            item = cdf_rows[idx][0]
            if (a, item) not in pos_set:
                expect.add((a, j, item, u))

    cdx = ns.popularity_cdf(
        spark.createDataFrame(counts, "item long, cnt long").repartition(5),
        "item", "cnt",
    )
    got = ns.sample_negatives(
        spark.createDataFrame([(a,) for a in anchors], "anchor long").repartition(3),
        cdx, k=k, seed=seed, n_buckets=16,
        positives=spark.createDataFrame(positives, "anchor long, item long"),
    ).collect()
    assert {(r["anchor"], r["slot"], r["item"], r["u"]) for r in got} == expect
    # exactly one item per draw: no duplicate (anchor, slot)
    assert len(got) == len({(r["anchor"], r["slot"]) for r in got})


def test_chunk_udtf_preserves_string_id_type(spark):
    docs = spark.createDataFrame(
        [("d-1", "abcdefghij" * 30), ("d-2", "xyz")], "doc_id string, text string"
    )
    got = trainprep.chunk_documents_udtf(
        spark, docs, size=128, stride=96
    ).collect()
    assert {r["doc_id"] for r in got} == {"d-1", "d-2"}
    builtin = trainprep.chunk_documents(docs, size=128, stride=96).collect()
    assert sorted((r["doc_id"], r["chunk_idx"], r["chunk"]) for r in got) == \
        sorted((r["doc_id"], r["chunk_idx"], r["chunk"]) for r in builtin)


def test_contamination_split_null_flag_lands_on_train_side(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta", "train"),
            (2, "alpha beta gamma delta", "test"),
            (3, "alpha beta gamma delta", None),  # NULL split
        ],
        "doc_id long, text string, split string",
    )
    rep = trainprep.contamination_report_split(
        df, F.col("split") == "test", n=3
    ).collect()
    # doc 3 must be checked as TRAIN (flagged contaminated vs doc 2),
    # not vanish from both sides
    assert {r["train_id"] for r in rep} == {1, 3}
