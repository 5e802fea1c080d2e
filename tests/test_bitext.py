"""mine_bitext vs a sequential numpy reference of the same
margin-mining algorithm (Artetxe-Schwenk ratio margin, intersection
strategy) — exact agreement expected because everything after cosine
quantization is integer arithmetic. Oracle parity at sf0.001/sf0.01
runs separately via test_oracle_parity."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from etl_demos_spark.operators.bitext import mine_bitext

K = 3
THRESH = 1.0
Q = 1_000_000


def _ref_mine(S: np.ndarray, T: np.ndarray, k: int, thresh: float):
    def norm(M):
        n = np.linalg.norm(M, axis=1)
        n[n == 0] = 1.0
        return M / n[:, None]

    C = norm(S) @ norm(T).T  # (ns, nt) cosines
    CQ = np.round(C * Q).astype(np.int64)

    def topk_idx(row_scores, k):
        # cos desc, partner id asc — lexsort’s last key dominates
        order = np.lexsort((np.arange(len(row_scores)), -row_scores))
        return order[: min(k, len(row_scores))]

    fwd = {i: topk_idx(C[i], k) for i in range(C.shape[0])}
    bwd = {j: topk_idx(C[:, j], k) for j in range(C.shape[1])}
    fsum = {i: (CQ[i, fwd[i]].sum(), len(fwd[i])) for i in fwd}
    bsum = {j: (CQ[bwd[j], j].sum(), len(bwd[j])) for j in bwd}
    cands = {(i, int(j)) for i in fwd for j in fwd[i]} | {
        (int(i), j) for j in bwd for i in bwd[j]
    }
    margins = {}
    for i, j in cands:
        fs, fn = fsum[i]
        bs, bn = bsum[j]
        denom = (fs / fn + bs / bn) / 2.0
        margins[(i, j)] = float(CQ[i, j]) / denom if denom != 0.0 else 0.0
    best_s = {}
    best_t = {}
    for (i, j), m in margins.items():
        ks = (-m, j)
        if i not in best_s or ks < best_s[i][0]:
            best_s[i] = (ks, j)
        kt = (-m, i)
        if j not in best_t or kt < best_t[j][0]:
            best_t[j] = (kt, i)
    out = {}
    for (i, j), m in margins.items():
        if best_s[i][1] == j and best_t[j][1] == i and m >= thresh:
            out[(i, j)] = (round(CQ[i, j] / Q, 6), round(m, 6))
    return out


def test_mine_bitext_matches_numpy_reference(spark):
    rng = np.random.default_rng(7)
    S = rng.normal(size=(30, 16)).astype(np.float32)
    # half the targets are noisy copies of sources (true pairs), half
    # are unrelated; plus one deliberate hub vector near the mean
    T = np.vstack(
        [
            S[:12] + rng.normal(scale=0.05, size=(12, 16)).astype(np.float32),
            rng.normal(size=(12, 16)).astype(np.float32),
            S.mean(axis=0, keepdims=True).astype(np.float32),
        ]
    ).astype(np.float32)
    src = spark.createDataFrame(
        [(i, S[i].tolist()) for i in range(len(S))],
        "vec_id long, embedding array<float>",
    )
    tgt = spark.createDataFrame(
        [(j, T[j].tolist()) for j in range(len(T))],
        "vec_id long, embedding array<float>",
    )
    got = {
        (r["src_id"], r["tgt_id"]): (r["cos_sim"], r["margin"])
        for r in mine_bitext(src, tgt, k=K, threshold=THRESH).collect()
    }
    want = _ref_mine(S.astype(np.float64), T.astype(np.float64), K, THRESH)
    assert got == want
    # the mine recovered true pairs: most of the 12 planted copies
    planted = sum(1 for (i, j) in got if i == j and j < 12)
    assert planted >= 8, (planted, sorted(got))
    # mutual-best means each side appears at most once
    srcs = [i for i, _ in got]
    tgts = [j for _, j in got]
    assert len(srcs) == len(set(srcs)) and len(tgts) == len(set(tgts))


def test_mine_bitext_lsh_route_recovers_planted_pairs(spark):
    """knn='lsh' runs the identical margin arithmetic over bucketed
    candidates: deterministic given the planes, no broadcast of either
    corpus-sized side, and with a reasonable signature it still
    recovers most planted translation pairs."""
    rng = np.random.default_rng(11)
    S = rng.normal(size=(24, 16)).astype(np.float32)
    T = np.vstack(
        [
            S[:12] + rng.normal(scale=0.05, size=(12, 16)).astype(np.float32),
            rng.normal(size=(12, 16)).astype(np.float32),
        ]
    ).astype(np.float32)
    src = spark.createDataFrame(
        [(i, S[i].tolist()) for i in range(len(S))],
        "vec_id long, embedding array<float>",
    )
    tgt = spark.createDataFrame(
        [(j, T[j].tolist()) for j in range(len(T))],
        "vec_id long, embedding array<float>",
    )
    planes = np.random.default_rng(0).normal(size=(8, 16)).tolist()
    got = {
        (r["src_id"], r["tgt_id"])
        for r in mine_bitext(
            src, tgt, k=K, threshold=THRESH, knn="lsh", planes=planes
        ).collect()
    }
    again = {
        (r["src_id"], r["tgt_id"])
        for r in mine_bitext(
            src, tgt, k=K, threshold=THRESH, knn="lsh", planes=planes
        ).collect()
    }
    assert got == again  # deterministic given planes
    planted = sum(1 for (i, j) in got if i == j and j < 12)
    assert planted >= 7, (planted, sorted(got))


def test_mine_bitext_lsh_requires_planes(spark):
    import pytest

    df = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="requires planes"):
        mine_bitext(df, df, knn="lsh").collect()
    with pytest.raises(ValueError, match="unknown knn route"):
        mine_bitext(df, df, knn="ivf").collect()
