"""DSIR importance resampling: reference pins + selection-bias property."""

from __future__ import annotations

import hashlib
import math
from decimal import ROUND_HALF_UP, Decimal

import pyspark.sql.functions as F

from etl_demos_spark.operators import dsir


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _grams(text: str) -> list[str]:
    toks = [t for t in text.lower().split() if t]
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _feats_ref(docs, nb):
    out: dict[tuple[int, int], int] = {}
    for i, text in docs:
        for g in _grams(text):
            b = _md5_long(g) % nb
            out[(i, b)] = out.get((i, b), 0) + 1
    return out


def _round0(x: float) -> int:
    return int(Decimal(repr(x)).quantize(Decimal(1), rounding=ROUND_HALF_UP))


def _ratios_ref(feats, target_ids, nb):
    ct: dict[int, int] = {}
    cr: dict[int, int] = {}
    for (i, b), c in feats.items():
        cr[b] = cr.get(b, 0) + c
        if i in target_ids:
            ct[b] = ct.get(b, 0) + c
    tott, totr = sum(ct.values()), sum(cr.values())
    out = {}
    for b in cr:
        lam = (
            math.log(ct.get(b, 0) + 1)
            - math.log(tott + nb)
            - math.log(cr[b] + 1)
            + math.log(totr + nb)
        )
        out[b] = _round0(lam * 1e6)
    return out


_DOCS = [
    (0, "spark shuffle join agg window column"),
    (1, "spark join shuffle partition broadcast agg"),
    (2, "cat dog bird fish mouse horse"),
    (3, "dog cat horse bird fish snake"),
    (4, "spark window agg shuffle broadcast partition"),
    (5, "fish mouse snake dog bird cat"),
    (6, "join agg spark column window partition"),
    (7, "horse snake mouse cat dog fish"),
]
_TARGET = {0, 1}  # "spark-like" docs are the target domain


def test_ngram_features_match_python_reference(spark):
    nb = 512
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    got = {
        (r["doc_id"], r["bucket"]): r["cnt"]
        for r in dsir.hashed_ngram_features(df, "text", "doc_id", nb).collect()
    }
    assert got == _feats_ref(_DOCS, nb)


def test_log_ratios_match_python_reference(spark):
    nb = 512
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    tgt = spark.createDataFrame([(i,) for i in _TARGET], "doc_id long")
    feats = dsir.hashed_ngram_features(df, "text", "doc_id", nb)
    got = {
        r["bucket"]: r["lr_unats"]
        for r in dsir.dsir_log_ratios(feats, tgt, "doc_id", nb).collect()
    }
    assert got == _ratios_ref(_feats_ref(_DOCS, nb), _TARGET, nb)


def test_scores_exact_and_target_like_docs_win(spark):
    nb = 512
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    tgt = spark.createDataFrame([(i,) for i in _TARGET], "doc_id long")
    feats = dsir.hashed_ngram_features(df, "text", "doc_id", nb)
    ratios = dsir.dsir_log_ratios(feats, tgt, "doc_id", nb)
    got = {
        r["doc_id"]: r["score_unats"]
        for r in dsir.dsir_scores(feats, ratios, "doc_id").collect()
    }
    fref = _feats_ref(_DOCS, nb)
    rref = _ratios_ref(fref, _TARGET, nb)
    for i, _ in _DOCS:
        s = sum(c * rref[b] for (d, b), c in fref.items() if d == i)
        assert got[i] == s
    # every spark-domain doc must outscore every animal-domain doc
    spark_docs = {0, 1, 4, 6}
    assert min(got[i] for i in spark_docs) > max(
        got[i] for i in set(got) - spark_docs
    )


def test_dsir_select_prefers_target_domain(spark):
    # 200 docs, 30 target-like; selection of 30 should be dominated by
    # target-like docs despite Gumbel noise
    docs, target = [], []
    for i in range(200):
        if i % 7 == 0:
            docs.append((i, "spark shuffle join agg window broadcast"))
        else:
            docs.append((i, f"cat dog bird fish mouse w{i % 13}"))
    for i in range(0, 200, 7):
        if i % 14 == 0:
            target.append((i,))  # half the spark-like docs define target
    df = spark.createDataFrame(docs, "doc_id long, text string")
    tgt = spark.createDataFrame(target, "doc_id long")
    sel = dsir.dsir_select(df, tgt, k=30, n_buckets=1024)
    rows = sel.collect()
    assert len(rows) == 30
    assert {r["rn"] for r in rows} == set(range(1, 31))
    picked = {r["doc_id"] for r in rows}
    sparkish = {i for i in range(200) if i % 7 == 0}
    assert len(picked & sparkish) >= 25
