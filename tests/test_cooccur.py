"""Co-occurrence analytics: reference pins for pairs, PPMI, triangles."""

from __future__ import annotations

import math
from collections import Counter

from etl_demos_spark.operators import cooccur


def test_basket_pairs_counts_and_guards(spark):
    rows = [
        (1, "a"), (1, "b"), (1, "c"), (1, "a"),   # dup item counts once
        (2, "a"), (2, "b"),
        (3, "b"), (3, "c"),
        (4, "a"), (4, "b"),
    ]
    df = spark.createDataFrame(rows, "basket long, item string")
    got = {
        (r["item_a"], r["item_b"]): r["support"]
        for r in cooccur.basket_pairs(df, "basket", "item").collect()
    }
    assert got == {("a", "b"): 3, ("a", "c"): 1, ("b", "c"): 2}
    # max_basket guard drops the big basket entirely
    big = rows + [(9, f"x{i}") for i in range(5)]
    dfb = spark.createDataFrame(big, "basket long, item string")
    got2 = {
        (r["item_a"], r["item_b"]): r["support"]
        for r in cooccur.basket_pairs(dfb, "basket", "item", max_basket=4).collect()
    }
    assert got2 == got
    got3 = {
        (r["item_a"], r["item_b"]): r["support"]
        for r in cooccur.basket_pairs(df, "basket", "item", min_support=2).collect()
    }
    assert got3 == {("a", "b"): 3, ("b", "c"): 2}


def _pair_ref(docs, window):
    c = Counter()
    for _, text in docs:
        toks = [t for t in text.lower().split() if t]
        for i, w in enumerate(toks):
            for d in range(1, window + 1):
                if i + d < len(toks):
                    a, b = sorted((w, toks[i + d]))
                    c[(a, b)] += 1
    return dict(c)


_DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick red fox runs over the quick dog"),
    (2, "a lazy dog sleeps under the brown tree"),
]


def test_token_pair_counts_match_python_reference(spark):
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    for w in (1, 2, 3):
        got = {
            (r["w1"], r["w2"]): r["c_pair"]
            for r in cooccur.token_pair_counts(df, "text", "doc_id", w).collect()
        }
        assert got == _pair_ref(_DOCS, w), w


def test_ppmi_matches_python_reference(spark):
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    pairs = cooccur.token_pair_counts(df, "text", "doc_id", 2)
    got = {
        (r["w1"], r["w2"]): (r["c_pair"], r["ppmi"])
        for r in cooccur.ppmi_scores(pairs, min_pair=2).collect()
    }
    ref_pairs = {k: v for k, v in _pair_ref(_DOCS, 2).items() if v >= 2}
    marg = Counter()
    for (a, b), c in ref_pairs.items():
        marg[a] += c
        marg[b] += c
    n = sum(ref_pairs.values())
    for (a, b), c in ref_pairs.items():
        pmi = math.log(c * n / (marg[a] * marg[b]))
        want = round(max(pmi, 0.0), 6)
        assert got[(a, b)][0] == c
        assert abs(got[(a, b)][1] - want) < 1e-9, (a, b)
    assert set(got) == set(ref_pairs)


def test_triangle_count_known_graphs(spark):
    # K4 has 4 triangles; adding a pendant edge changes nothing
    k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")]
    df = spark.createDataFrame(
        [(a, b) for a, b in k4] + [("d", "e")],
        "item_a string, item_b string",
    )
    assert cooccur.triangle_count(df).collect()[0]["n_triangles"] == 4
    # triangle-free bipartite-ish graph
    df2 = spark.createDataFrame(
        [("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")],
        "item_a string, item_b string",
    )
    assert cooccur.triangle_count(df2).collect()[0]["n_triangles"] == 0
    # un-canonicalized + duplicated input is normalized internally
    df3 = spark.createDataFrame(
        [("b", "a"), ("a", "b"), ("c", "a"), ("b", "c")],
        "item_a string, item_b string",
    )
    assert cooccur.triangle_count(df3).collect()[0]["n_triangles"] == 1


def test_item_cosine_matches_python_reference(spark):
    import math

    pairs = [("a", "b", 6), ("a", "c", 2), ("b", "c", 4)]
    df = spark.createDataFrame(pairs, "item_a string, item_b string, support long")
    got = {
        (r["item_a"], r["item_b"]): (r["support"], r["cosine"])
        for r in cooccur.item_cosine_from_pairs(df).collect()
    }
    deg = {"a": 8, "b": 10, "c": 6}
    for a, b, s in pairs:
        want = round(s / math.sqrt(deg[a] * deg[b]), 6)
        assert got[(a, b)] == (s, want)


def test_transition_counts_deterministic_and_exact(spark):
    rows = [
        # user 1: v -> c -> p ; user 2: v -> v -> c ; ties broken by id
        (1, 10, 1, "v"), (1, 20, 2, "c"), (1, 30, 3, "p"),
        (2, 10, 4, "v"), (2, 10, 5, "v"), (2, 40, 6, "c"),
    ]
    df = spark.createDataFrame(rows, "u long, ts long, eid long, et string")
    got = {
        (r["cur"], r["nxt"]): (r["c_trans"], r["p_trans"])
        for r in cooccur.transition_counts(df, "u", ("ts", "eid"), "et").collect()
    }
    assert got == {
        ("v", "c"): (2, 0.666667),
        ("v", "v"): (1, 0.333333),
        ("c", "p"): (1, 1.0),
    }


def test_token_pair_counts_rejects_nonpositive_window(spark):
    import pytest

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="window"):
        cooccur.token_pair_counts(df, window=0)
    with pytest.raises(ValueError, match="window"):
        cooccur.token_pair_counts(df, window=-2)


def test_dropped_baskets_audits_the_size_guard(spark):
    rows = [("b1", f"i{k}") for k in range(5)] + [("b2", "x"), ("b2", "y")] \
        + [("b3", f"j{k}") for k in range(4)]
    df = spark.createDataFrame(rows, "basket string, item string")
    audit = cooccur.dropped_baskets(df, "basket", "item", max_basket=3).collect()[0]
    assert audit["n_dropped_baskets"] == 2       # b1 (5) and b3 (4)
    assert audit["n_dropped_items"] == 9
    # pairs over the same cap exclude exactly those baskets
    pairs = cooccur.basket_pairs(df, "basket", "item", max_basket=3).collect()
    assert {(r["item_a"], r["item_b"]) for r in pairs} == {("x", "y")}
    # nothing dropped → zero row, not an empty frame
    none = cooccur.dropped_baskets(df, "basket", "item", max_basket=10).collect()[0]
    assert none["n_dropped_baskets"] == 0 and none["n_dropped_items"] == 0


def test_basket_pairs_null_baskets_and_null_items(spark):
    """Review r7: (a) NULL baskets produce NO pairs (the pre-rewrite
    join form never matched them) and never form a merged pseudo-
    basket; (b) a NULL item still occupies one slot in the max_basket
    size the cap — and dropped_baskets, the audit twin — is defined
    over, even though it can never appear in a pair."""
    from etl_demos_spark.operators.cooccur import basket_pairs, dropped_baskets

    df = spark.createDataFrame(
        [
            (None, "a"), (None, "b"), (None, "c"),   # null basket: no pairs
            (1, "a"), (1, "b"), (1, None),           # size 3 incl. null item
            (2, "x"), (2, "y"),                      # normal pair
        ],
        "basket long, item string",
    )
    got = {
        (r["item_a"], r["item_b"], r["support"])
        for r in basket_pairs(df, "basket", "item", max_basket=None).collect()
    }
    assert got == {("a", "b", 1), ("x", "y", 1)}

    # cap at 2: basket 1 counts as size 3 (null item included) -> drop,
    # matching dropped_baskets' accounting; basket 2 stays
    capped = {
        (r["item_a"], r["item_b"])
        for r in basket_pairs(df, "basket", "item", max_basket=2).collect()
    }
    assert capped == {("x", "y")}
    dropped = dropped_baskets(df, "basket", "item", max_basket=2).collect()[0]
    assert dropped["n_dropped_baskets"] >= 1
