"""Hashed-feature linear classifier: reference pins + learnability.

The training loop's determinism rests on the integer discipline
(int64 nano-weights, residuals quantized before aggregation), so the
whole T-iteration run is replicable by a sequential Python reference —
that replica IS the correctness oracle for the non-SQL-expressible
training query (q_train_classifier, rows-only).
"""

from __future__ import annotations

import hashlib
import math
from decimal import ROUND_HALF_UP, Decimal

import pyspark.sql.functions as F

from etl_demos_spark.operators import classifier as clf


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _feats_ref(docs: list[tuple[int, str]], n_buckets: int):
    out: dict[tuple[int, int], int] = {}
    for i, text in docs:
        for tok in text.lower().split():
            if tok:
                b = _md5_long(tok) % n_buckets
                out[(i, b)] = out.get((i, b), 0) + 1
    return out


def _spark_round0(x: float) -> int:
    # Spark round(double, 0): BigDecimal.valueOf(d).setScale(0, HALF_UP)
    return int(Decimal(repr(x)).quantize(Decimal(1), rounding=ROUND_HALF_UP))


def _train_ref(feats, labels, n_buckets, lr, iters):
    n = len(labels)
    feats = dict(feats)
    for i in labels:  # bias: virtual bucket -1, count 1 per labeled doc
        feats[(i, -1)] = 1
    w: dict[int, int] = {}
    for _ in range(iters):
        margins: dict[int, int] = {i: 0 for i in labels}
        for (i, b), cnt in feats.items():
            margins[i] = margins.get(i, 0) + cnt * w.get(b, 0)
        r_int = {}
        for i, y in labels.items():
            p = 1.0 / (1.0 + math.exp(-(margins.get(i, 0) / 1.0e9)))
            r_int[i] = _spark_round0((p - y) * 1.0e9)
        grad: dict[int, int] = {}
        for (i, b), cnt in feats.items():
            grad[b] = grad.get(b, 0) + cnt * r_int[i]
        for b, g_int in grad.items():
            cur = w.get(b, 0) / 1.0e9
            upd = cur - lr * ((g_int / 1.0e9) / n)
            w[b] = int(round(upd * 1.0e9))
    return w


_DOCS = [
    (0, "great solid excellent reliable fast"),
    (1, "great good excellent shiny robust"),
    (2, "excellent reliable delightful good fast"),
    (3, "broken terrible slow awful flaky"),
    (4, "awful broken flaky terrible sad"),
    (5, "terrible slow broken awful noisy"),
    (6, "good fast delightful robust shiny"),
    (7, "flaky sad noisy slow broken"),
]
_LABELS = {0: 1, 1: 1, 2: 1, 3: 0, 4: 0, 5: 0, 6: 1, 7: 0}


def test_hashed_features_match_python_reference(spark):
    nb = 256
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    got = {
        (r["doc_id"], r["bucket"]): r["cnt"]
        for r in clf.hashed_features(df, "text", "doc_id", nb).collect()
    }
    assert got == _feats_ref(_DOCS, nb)


def test_train_logreg_bit_identical_to_sequential_reference(spark):
    nb, lr, iters = 256, 0.8, 3
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    lab = spark.createDataFrame(
        list(_LABELS.items()), "doc_id long, y long"
    )
    feats = clf.hashed_features(df, "text", "doc_id", nb)
    # repartition shuffles row placement: determinism must survive it
    w = {
        r["bucket"]: r["w_int"]
        for r in clf.train_logreg(
            feats.repartition(7), lab, n_buckets=nb, lr=lr, iters=iters
        ).collect()
    }
    ref = _train_ref(_feats_ref(_DOCS, nb), _LABELS, nb, lr, iters)
    ref = {b: v for b, v in ref.items() if v != 0 or b in w}
    assert w == ref


def test_train_logreg_learns_separable_labels(spark):
    # 120 docs, clean lexical separation: positive vocab vs negative
    pos = ["great", "excellent", "reliable", "fast", "good"]
    neg = ["broken", "terrible", "awful", "flaky", "slow"]
    docs, labels = [], []
    for i in range(120):
        vocab = pos if i % 2 == 0 else neg
        toks = [vocab[(i + j) % 5] for j in range(6)]
        docs.append((i, " ".join(toks)))
        labels.append((i, 1 if i % 2 == 0 else 0))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    lab = spark.createDataFrame(labels, "doc_id long, y long")
    feats = clf.hashed_features(df, "text", "doc_id", 512)
    w = clf.train_logreg(feats, lab, n_buckets=512, lr=1.0, iters=5)
    pred = clf.predict(feats, w, "doc_id")
    truth = dict(labels)
    rows = pred.collect()
    acc = sum(
        1 for r in rows if int(r["pred"]) == truth[r["doc_id"]]
    ) / len(rows)
    assert acc >= 0.95
    # probabilities must be meaningfully separated, not threshold noise
    pos_p = [r["prob"] for r in rows if truth[r["doc_id"]] == 1]
    neg_p = [r["prob"] for r in rows if truth[r["doc_id"]] == 0]
    assert min(pos_p) > max(neg_p)


def test_linear_score_milli_matches_python_reference(spark):
    nb = 256
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    feats = clf.hashed_features(df, "text", "doc_id", nb)
    wdf = spark.range(nb).select(
        F.col("id").alias("bucket"),
        clf.seeded_milli_weights(F.col("id")).alias("w_int"),
    )
    got = {
        r["doc_id"]: (r["score_milli"], r["prob"])
        for r in clf.linear_score_milli(feats, wdf, "doc_id").collect()
    }
    wref = {b: (_md5_long(str(b)) % 2001) - 1000 for b in range(nb)}
    fref = _feats_ref(_DOCS, nb)
    for i, _ in _DOCS:
        s = sum(cnt * wref[b] for (d, b), cnt in fref.items() if d == i)
        p = 1.0 / (1.0 + math.exp(-s / 1000.0))
        assert got[i][0] == s
        assert abs(got[i][1] - p) < 5e-5


def test_predict_with_ids_scores_featureless_docs_at_bias(spark):
    """predict(ids=...) makes the augmentation contract total: a doc
    whose text produced zero feature rows (empty/whitespace) must still
    appear, scoring exactly sigmoid(bias) — matching training, which
    gives every labeled doc an intercept row."""
    import math

    docs = [(0, "good fast"), (1, "bad slow"), (2, "   "), (3, "")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    feats = clf.hashed_features(df, "text", "doc_id", 64)
    # hand-built weights: bias bucket −1 carries 0.25 in nano units
    w = spark.createDataFrame(
        [(-1, int(0.25 * 1e9)), (0, int(1e9))], "bucket long, w_int long"
    )
    # without ids: featureless docs silently absent
    bare = clf.predict(feats, w, "doc_id").collect()
    assert {r["doc_id"] for r in bare} == {0, 1}
    # with ids: every doc appears; empty ones at sigmoid(bias)
    full = {r["doc_id"]: r["prob"]
            for r in clf.predict(feats, w, "doc_id", ids=df).collect()}
    assert set(full) == {0, 1, 2, 3}
    expect = round(1.0 / (1.0 + math.exp(-0.25)), 6)
    assert full[2] == expect and full[3] == expect


def test_calibration_report_exact(spark):
    """calibration_report vs hand arithmetic: 6 docs, 2 bins, known
    probs/labels; ECE must equal the exact integer-numerator formula."""
    import pyspark.sql.functions as F

    from etl_demos_spark.operators.classifier import calibration_report

    rows = [
        (1, 0.10, 0), (2, 0.15, 0), (3, 0.12, 1),   # bin 1 (with bins=10)
        (4, 0.90, 1), (5, 0.95, 1), (6, 0.92, 0),   # bin 9
    ]
    df = spark.createDataFrame(rows, "doc_id long, prob double, y long")
    out = {r["bin"]: r for r in calibration_report(df, "y", "prob", bins=10).collect()}
    assert set(out) == {1, 9}
    b1, b9 = out[1], out[9]
    assert (b1["n"], b1["n_pos"]) == (3, 1) and (b9["n"], b9["n_pos"]) == (3, 2)
    assert b1["avg_conf"] == round((1000 + 1500 + 1200) / 3 / 10000, 6)
    assert b9["frac_pos"] == round(2 / 3, 6)
    # exact integer ECE: |3700-10000*1| + |27700-10000*2| over 10^4*6
    ece = (abs(3700 - 10000) + abs(27700 - 20000)) / (10000 * 6)
    assert b1["ece"] == b9["ece"] == round(ece, 6)
    # per-bin gap identity
    assert b1["abs_gap"] == round(abs(3700 - 10000) / 3 / 10000, 6)
