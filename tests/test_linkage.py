"""Record linkage (fuzzy join): exact semantics, blocking exactness,
blocking columns."""

from __future__ import annotations

from etl_demos_spark.operators import linkage

LEFT = [
    (0, "the quick brown fox jumps over the lazy dog", "en"),
    (2, "pack my box with five dozen liquor jugs", "en"),
    (4, "completely unrelated text about spark plans", "en"),
    (6, "der schnelle braune fuchs springt", "de"),
]
RIGHT = [
    (1, "the quick brown fox jumps over the lazy cat", "en"),   # near-dup of 0
    (3, "pack my box with five dozen liquor jugs today", "en"),  # near-dup of 2
    (5, "totally different words entirely here now ok", "en"),
    (7, "the quick brown fox jumps over the lazy dog", "de"),    # lang differs from 0
]


def _two(spark):
    l = spark.createDataFrame(LEFT, "doc_id long, text string, lang string")
    r = spark.createDataFrame(RIGHT, "doc_id long, text string, lang string")
    return l, r


def _py_jaccard(a: str, b: str, n=3) -> float:
    import re

    def grams(t):
        toks = re.findall("[a-z0-9]+", t.lower())
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    ga, gb = grams(a), grams(b)
    return len(ga & gb) / len(ga | gb) if ga | gb else 0.0


def test_fuzzy_join_matches_python_reference(spark):
    l, r = _two(spark)
    got = {
        (x["id_a"], x["id_b"]): x["jaccard"]
        for x in linkage.fuzzy_join(l, r, "doc_id", threshold=0.3).collect()
    }
    want = {}
    for la, ta, _ in LEFT:
        for rb, tb, _ in RIGHT:
            j = _py_jaccard(ta, tb)
            if j >= 0.3:
                want[(la, rb)] = j
    assert set(got) == set(want)
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-12
    assert (0, 1) in got and (2, 3) in got


def test_blocking_cols_gate_matches(spark):
    l, r = _two(spark)
    got = {
        (x["id_a"], x["id_b"])
        for x in linkage.fuzzy_join(
            l, r, "doc_id", threshold=0.3, block_cols=("lang",)
        ).collect()
    }
    # (0, 7) texts are identical but langs differ → must be gated out
    assert (0, 7) not in got
    assert (0, 1) in got and (2, 3) in got


def test_max_df_blocking_keeps_scores_exact(spark):
    l, r = _two(spark)
    exact = {
        (x["id_a"], x["id_b"]): x["jaccard"]
        for x in linkage.fuzzy_join(l, r, "doc_id", threshold=0.3).collect()
    }
    blocked = {
        (x["id_a"], x["id_b"]): x["jaccard"]
        for x in linkage.fuzzy_join(
            l, r, "doc_id", threshold=0.3, max_df=3
        ).collect()
    }
    # every surviving pair carries the EXACT score (blocking only
    # restricts candidates, never deflates the ratio)
    for k, v in blocked.items():
        assert abs(exact[k] - v) < 1e-12
    assert set(blocked) <= set(exact)
    assert (0, 1) in blocked  # near-dups share rare grams → survive
