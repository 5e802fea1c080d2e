"""BPE merge learning + encoding: distributed form pinned to the
pure-Python reference algorithm; UDF and expression encoders pinned to
each other; lossless coverage property."""

from __future__ import annotations


from etl_demos_spark.operators import bpe

CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "widest widest widest",
    "the lowest newest widest low",
    "unrelated words appear here too",
]


def _docs(spark, texts=CORPUS):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_learn_matches_python_reference(spark):
    got = bpe.learn_bpe_merges(_docs(spark), n_merges=12)
    want = bpe.learn_bpe_reference(CORPUS, n_merges=12)
    assert got == want
    assert len(got) >= 8  # corpus is repetitive enough to sustain merges


def test_learn_tiebreak_deterministic(spark):
    # every pair occurs exactly twice → ranking is purely the tie-break
    texts = ["ab ab", "cd cd"]
    got = bpe.learn_bpe_merges(_docs(spark, texts), n_merges=4)
    assert got == bpe.learn_bpe_reference(texts, n_merges=4)
    assert got[0] == ("a", "b")  # lexicographically first among count-2 pairs


def test_encoders_pinned_identical(spark):
    df = _docs(spark)
    merges = bpe.learn_bpe_reference(CORPUS, n_merges=10)
    udf = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe.apply_merges(df, merges, use_udf=True).collect()
    }
    expr = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe.apply_merges(df, merges, use_udf=False).collect()
    }
    assert udf == expr
    # merged symbols actually appear (not a no-op encoding)
    assert any(len(t) > 1 for toks in udf.values() for t in toks)


def test_encoding_is_lossless_cover(spark):
    df = _docs(spark)
    merges = bpe.learn_bpe_reference(CORPUS, n_merges=10)
    out = bpe.apply_merges(df, merges, use_udf=True).collect()
    pat = bpe._pretoken_pattern()
    for r in out:
        assert "".join(r["bpe_tokens"]) == "".join(pat.findall(CORPUS[r["doc_id"]]))


def test_empty_and_missing_text(spark):
    df = spark.createDataFrame(
        [(0, ""), (1, None), (2, "ab ab")], "doc_id long, text string"
    )
    merges = [("a", "b")]
    for use_udf in (True, False):
        got = {
            r["doc_id"]: r["bpe_tokens"]
            for r in bpe.apply_merges(df, merges, use_udf=use_udf).collect()
        }
        assert got[0] == [] and got[1] == []
        assert got[2] == ["ab", " ", "ab"] or got[2] == ["ab", " ab"]


def test_bpe_merges_survive_replacement_metacharacters(spark):
    """'$' and '\\' are metacharacters in regexp_replace's REPLACEMENT
    string: an unescaped '$$' merge throws INVALID_REGEXP_REPLACE and a
    backslash pair silently collapses — both must round-trip."""
    from etl_demos_spark.operators.bpe import (
        apply_merges,
        learn_bpe_merges,
        learn_bpe_reference,
    )

    texts = ["$$ $$ $$ \\\\ \\\\ \\\\ ok ok"] * 3
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    merges = learn_bpe_merges(df, n_merges=4)
    assert merges == learn_bpe_reference(texts, n_merges=4)
    # both metacharacters must actually appear in learned merges
    assert ("$", "$") in merges
    assert any("\\" in a or "\\" in b for a, b in merges)
    # the expression path must encode them and agree with the UDF path
    expr = apply_merges(df, merges, use_udf=False).collect()
    udf = apply_merges(df, merges, use_udf=True).collect()
    by_id = lambda rows: {r["doc_id"]: list(r["bpe_tokens"]) for r in rows}
    assert by_id(expr) == by_id(udf)
    toks = by_id(expr)[0]
    assert any("$$" in t for t in toks) and any("\\\\" in t for t in toks)


def test_apply_merges_expression_path_null_columns(spark):
    from etl_demos_spark.operators.bpe import apply_merges

    df = spark.createDataFrame(
        [(None, "hello hello"), (1, "hello world")], "doc_id long, text string"
    )
    got = {r["doc_id"]: list(r["bpe_tokens"])
           for r in apply_merges(df, [("h", "e")], use_udf=False).collect()}
    # the NULL-id row must keep its tokens, not coalesce to []
    assert got[None] and got[None][0].startswith("he")
    assert got[1]
