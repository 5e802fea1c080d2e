"""Winnowing fingerprint properties."""

from __future__ import annotations

import pyspark.sql.functions as F

from etl_demos_spark.operators.text import char_ngram_hashes, winnow_fingerprints


def _fps(spark, rows):
    from etl_demos_spark.operators.text import normalize_text

    df = spark.createDataFrame(rows, "doc_id long, text string")
    # project the normalization ONCE (the char_ngram_hashes contract)
    normed = df.select("doc_id", normalize_text("text").alias("__t"))
    toked = normed.select(
        "doc_id", char_ngram_hashes(F.col("__t"), 7).alias("h")
    )
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


def test_bigram_lm_hand_computed(spark):
    """'a b a b' + 'a c': c2(a b)=2, c2(b a)=1, c2(a c)=1 -> c1(a)=3,
    c1(b)=1. logp(a b)=ln(2/3), logp(b a)=ln(1/1)=0, logp(a c)=ln(1/3)."""
    import math
    from etl_demos_spark.operators.text import bigram_lm_model, lm_score_documents

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a c")], "doc_id long, text string"
    )
    model = {r["gram"]: r for r in bigram_lm_model(df, "text").collect()}
    assert model["a b"]["c2"] == 2 and model["a b"]["c1"] == 3
    assert model["b a"]["c2"] == 1 and model["b a"]["c1"] == 1
    assert model["a c"]["c2"] == 1 and model["a c"]["c1"] == 3
    assert abs(model["a b"]["logp"] - round(math.log(2 / 3), 9)) < 1e-12
    scored = {
        r["doc_id"]: r
        for r in lm_score_documents(
            df, bigram_lm_model(df, "text"), "doc_id", "text"
        ).collect()
    }
    # doc 1: grams [a b, b a, a b] -> n=3, sum_freq=2+1+2=5
    assert scored[1]["n_bigrams"] == 3 and scored[1]["sum_freq"] == 5
    expect = (round(math.log(2 / 3), 9) * 2 + 0.0) / 3
    assert abs(scored[1]["avg_logp"] - round(expect, 6)) < 1e-9
    # doc 2: one rare gram (c2=1 <= 2) -> rare_frac 1.0
    assert scored[2]["rare_frac"] == 1.0


def test_lm_buckets_exact_vs_approx(spark):
    """Approx-percentile bucketing (the no-global-sort scale path) must
    agree with exact ntile away from the cut boundaries."""
    from etl_demos_spark.operators.text import lm_quality_buckets

    rows = [(i, float(i)) for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id long, avg_logp double")
    exact = {
        r["doc_id"]: r["lm_bucket"]
        for r in lm_quality_buckets(df, exact=True).collect()
    }
    approx = {
        r["doc_id"]: r["lm_bucket"]
        for r in lm_quality_buckets(df, exact=False).collect()
    }
    agree = sum(exact[i] == approx[i] for i in exact)
    assert agree >= 85, f"approx buckets diverge too much: {agree}/90"
    assert set(approx.values()) == {1, 2, 3}


def test_exploded_word_ngrams_matches_hof_form(spark):
    """The codegen'd zip/slice/explode gram path must be row-identical to
    explode(word_ngrams(...)) — including short docs (no grams) and n=3."""
    from etl_demos_spark.operators.text import exploded_word_ngrams, word_ngrams

    df = spark.createDataFrame(
        [(1, "The quick brown-fox jumps"), (2, "one"), (3, ""), (4, "a b")],
        "doc_id long, text string",
    )
    for n in (2, 3):
        hof = df.select("doc_id", F.explode(word_ngrams("text", n)).alias("gram"))
        fast = exploded_word_ngrams(df, ("doc_id",), "text", n)
        assert sorted(map(tuple, hof.collect())) == sorted(map(tuple, fast.collect()))


def test_bm25_search_semantics(spark):
    """Conjunctive filter drops partial matches; among full matches a doc
    with higher tf and shorter length outranks a longer one."""
    from etl_demos_spark.operators.search import (
        bm25_search,
        build_term_index,
        doc_lengths,
    )

    rows = [
        (1, "spark join fast join"),                 # tf(join)=2, short
        (2, "spark join is quite fast " + "x " * 40),  # long doc, tf=1 each
        (3, "spark only here"),                      # partial match
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    idx, lens = build_term_index(df), doc_lengths(df)
    got = bm25_search(idx, lens, ["spark", "join"], k=5).collect()
    ids = [r["doc_id"] for r in sorted(got, key=lambda r: r["rank"])]
    assert ids == [1, 2]
    assert all(r["n_terms_matched"] == 2 for r in got)


def test_bpe_pretokenize_known_pieces(spark):
    from etl_demos_spark.operators.text import bpe_token_count, pretokenize

    cases = [
        ("I'll don't see 123abc  hi! there",
         ["I", "'ll", " don", "'t", " see", " 123", "abc", "  ", "hi", "!",
          " there"]),
        ("hello world", ["hello", " world"]),
        ("a1b2", ["a", "1", "b", "2"]),
        ("...!?", ["...!?"]),
        ("", []),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(cases)], "i long, text string"
    )
    got = {
        r["i"]: (list(r["p"]), r["n"])
        for r in df.select(
            "i", pretokenize("text").alias("p"), bpe_token_count("text").alias("n")
        ).collect()
    }
    for i, (text, want) in enumerate(cases):
        pieces, n = got[i]
        assert pieces == want, f"{text!r}: {pieces} != {want}"
        assert n == len(want)
        # pieces are a partition of the input: concatenation restores it
        assert "".join(pieces) == text


def test_redact_pii_url_stops_at_any_java_whitespace(spark):
    """The URL class is explicit (not \\s) so Java and RE2 agree on
    \\x0B; the redaction must terminate the URL at every whitespace kind
    Java's \\s covers, leaving trailing text intact."""
    from etl_demos_spark.operators.text import redact_pii

    rows = [(i, f"see https://ex.io/a{sep}tail") for i, sep in
            enumerate([" ", "\t", "\n", "\x0b", "\f", "\r"])]
    df = spark.createDataFrame(rows, "i long, text string")
    out = {r["i"]: r["red"] for r in
           df.select("i", redact_pii("text").alias("red")).collect()}
    for i, sep in enumerate([" ", "\t", "\n", "\x0b", "\f", "\r"]):
        assert out[i] == f"see [URL]{sep}tail", (i, repr(out[i]))
