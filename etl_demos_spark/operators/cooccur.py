"""Co-occurrence analytics: basket pairs, PPMI, triangle counting.

Three related shapes a large-scale data platform needs:

- **Basket co-occurrence** (market-basket / co-purchase): which items
  appear together, with support counts — the input to recommenders and
  association rules.
- **Windowed token co-occurrence + PMI** (Church & Hanks 1990; the
  word2vec/GloVe PPMI prep): token pairs within a ±w window over each
  document, scored by pointwise mutual information against unigram
  margins — the classic distributional-embedding matrix, built with
  exact integer counts.
- **Triangle counting** on the co-occurrence graph (the standard
  clustering-coefficient / community-density primitive).

Scale shapes:

- Basket pairs: ONE basket-keyed self-join — pair rows ∝ Σ b_i² over
  baskets, bounded by ``max_basket`` (oversized baskets are dropped —
  the standard market-basket guard against quadratic blowup on
  pathological sessions). The drop itself is silent; audit it with
  ``dropped_baskets`` below when the pipeline needs the number.
  Combiner-friendly (pair-keyed) count agg.
- Token pairs: positions explode once, a bounded offset join (≤ w
  offsets per token) replaces the quadratic within-window self-join.
- Triangles: two hash joins over the (a < b)-canonicalized edge list —
  the join-based algorithm; support thresholds prune edges first, so
  join input ∝ surviving edges. Per-join shuffles are key-partitioned;
  no vertex ever needs its full neighborhood in memory.

Everything is exact integer counts plus one final rounded ln for PMI —
the repo's oracle discipline; all three registered queries carry full
DuckDB hash oracles.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from etl_demos_spark.operators.matutil import materialize_reused


def _two_role_margins(
    p: DataFrame, col_a: str, col_b: str, val_col: str, key: str, out: str
) -> DataFrame:
    """Σ ``val_col`` per entity appearing in EITHER role of a pair
    table — one explode pass instead of a self-union (which would
    evaluate ``p`` twice). Shared by ppmi_scores and
    item_cosine_from_pairs; the same explode-two-structs shape as
    graph._undirected."""
    return (
        p.select(
            F.explode(
                F.array(
                    F.struct(F.col(col_a).alias("k"), F.col(val_col).alias("v")),
                    F.struct(F.col(col_b).alias("k"), F.col(val_col).alias("v")),
                )
            ).alias("_m")
        )
        .groupBy(F.col("_m.k").alias(key))
        .agg(F.sum("_m.v").cast("long").alias(out))
    )


def basket_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    max_basket: int | None = 64,
    min_support: int = 1,
) -> DataFrame:
    """Co-occurrence pairs (a < b canonical order) with support counts.
    Distinct items per basket first (multiplicity inside one basket
    counts once — the association-rule convention), baskets larger
    than ``max_basket`` dropped to bound the quadratic pair fan-out.

    Returns (item_a, item_b, support).

    Shape (reworked r7 after profiling): ONE collect_set aggregation
    per basket (dedups items and yields the size in the same pass),
    then codegen'd pair generation — posexplode of the sorted item
    array followed by an explode of the strictly-later slice, so every
    unordered pair appears exactly once with a < b for free — then the
    support aggregation. Two shuffles and zero joins, vs the previous
    distinct + size-filter join + basket self-join + agg (4-5
    shuffles, measured 3.2 s of q_item_sim's 3.9 at sf0.1). The
    collect_set buffer is bounded by the LARGEST TRUE basket (the cap
    filters after collection); for corpora with unbounded basket skew,
    pre-filter oversized baskets upstream (dropped_baskets reports
    them) before calling."""
    # NULL baskets produce no pairs (the pre-r7 join form never matched
    # them) — and without this filter every NULL-basket row corpus-wide
    # would collapse into ONE collect_set group, an unbounded buffer
    # and fabricated cross-row pairs (r7 review catch)
    baskets = (
        df.filter(F.col(basket_col).isNotNull())
        .groupBy(F.col(basket_col).alias("__basket"))
        .agg(
            F.sort_array(F.collect_set(F.col(item_col))).alias("__its"),
            # collect_set drops NULL items, but a NULL item still
            # occupied one distinct slot in the basket-size count the
            # cap (and dropped_baskets, the audit twin) is defined over
            F.max(F.col(item_col).isNull()).alias("__has_null_item"),
        )
        .drop("__basket")
    )
    if max_basket is not None:
        baskets = baskets.filter(
            F.size("__its") + F.col("__has_null_item").cast("int")
            <= max_basket
        )
    first = baskets.select(
        F.posexplode("__its").alias("__i", "item_a"), "__its"
    )
    pairs = (
        first.select(
            "item_a",
            F.explode(
                F.slice(
                    "__its", F.col("__i") + 2, F.greatest(F.size("__its") - F.col("__i") - 1, F.lit(0))
                )
            ).alias("item_b"),
        )
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
    )
    if min_support > 1:
        pairs = pairs.filter(F.col("support") >= min_support)
    return pairs


def dropped_baskets(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    max_basket: int = 64,
) -> DataFrame:
    """Audit twin of ``basket_pairs``'s size guard: one row
    (n_dropped_baskets, n_dropped_items) counting the baskets the
    max_basket cap excludes — the no-silent-caps discipline. Run it
    alongside basket_pairs when the pipeline must KNOW what the
    quadratic guard cost, instead of trusting that pathological
    sessions are rare."""
    sizes = (
        df.select(
            F.col(basket_col).alias("__basket"),
            F.col(item_col).alias("__item"),
        )
        .distinct()
        .groupBy("__basket")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > max_basket)
    )
    return sizes.agg(
        F.count(F.lit(1)).cast("long").alias("n_dropped_baskets"),
        F.coalesce(F.sum("__n"), F.lit(0)).cast("long").alias("n_dropped_items"),
    )


def token_pair_counts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 2,
) -> DataFrame:
    """Unordered token co-occurrence counts within a ±``window`` token
    offset, canonicalized (w1 ≤ w2 lexicographically). Positions
    explode once; pairs come from ``window`` bounded offset joins
    folded into one join on (doc, pos + d) — pair rows ∝ tokens ×
    window, never tokens². Counts are exact integers.

    Tokens are lowercased whitespace splits — deliberately the same
    contract as dsir.hashed_ngram_features (and its oracle), NOT the
    WORD_RE tokenizer dedup/trainprep use: distributional stats keep
    punctuation-attached forms distinct. Join PPMI output against other
    token tables only after normalizing to one contract.

    Returns (w1, w2, c_pair)."""
    if window < 1:
        # F.sequence(1, 0) silently DESCENDS ([1, 0]) — a zero/negative
        # window would emit self-pairs instead of nothing
        raise ValueError(f"window must be >= 1 (got {window})")
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
    )
    pos = df.select(
        F.col(id_col).alias("__doc"), F.posexplode(toks).alias("p", "w")
    )
    offsets = F.explode(
        F.sequence(F.lit(1), F.lit(window))
    ).alias("d")
    left = pos.select("__doc", "p", "w", offsets).select(
        "__doc", (F.col("p") + F.col("d")).alias("p2"), F.col("w").alias("wl")
    )
    right = pos.select(
        "__doc", F.col("p").alias("p2"), F.col("w").alias("wr")
    )
    return (
        left.join(right, ["__doc", "p2"])
        .select(
            F.least("wl", "wr").alias("w1"),
            F.greatest("wl", "wr").alias("w2"),
        )
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("c_pair"))
    )


def ppmi_scores(
    pair_counts: DataFrame,
    min_pair: int = 2,
) -> DataFrame:
    """Positive PMI over canonicalized pair counts: margins c(w) =
    Σ pairs touching w (re-aggregated from the pair table — nothing
    re-reads text), N = Σ c_pair, pmi = ln(c_pair·N / (c(w1)·c(w2))),
    clamped at 0 and rounded to 6 (the oracle rounding discipline; all
    inputs to the single ln are exact integers). Low-count pairs are
    pruned BEFORE margins are computed, so both engines see the same
    matrix.

    Returns (w1, w2, c_pair, ppmi)."""
    # the (usually multi-shuffle) pair plan feeds margins, the total,
    # AND the final join — materialize once instead of leaning on
    # exchange reuse to dedup three evaluations (r7 audit: q_item_sim
    # and q_triangles showed the reuse does NOT reliably fire across
    # differing downstream projections)
    p = materialize_reused(pair_counts.filter(F.col("c_pair") >= min_pair))
    marg = _two_role_margins(p, "w1", "w2", "c_pair", "w", "c_w")
    tot = p.select(F.sum("c_pair").cast("long").alias("n_tot"))
    j = (
        p.join(marg.select(F.col("w").alias("w1"), F.col("c_w").alias("c1")), "w1")
        .join(marg.select(F.col("w").alias("w2"), F.col("c_w").alias("c2")), "w2")
        .crossJoin(F.broadcast(tot))
    )
    # cast the OPERANDS, not the product: long·long wraps past 2^63
    # (c_pair·N exceeds it long before a 100 TB corpus does) — double
    # products are exact to 2^53 per factor and degrade gracefully
    # instead of going negative into the ln. Oracle SQL mirrors the
    # same expression tree (IEEE op order is part of the contract).
    pmi = F.log(
        (F.col("c_pair").cast("double") * F.col("n_tot").cast("double"))
        / (F.col("c1").cast("double") * F.col("c2").cast("double"))
    )
    return j.select(
        "w1",
        "w2",
        "c_pair",
        F.round(F.greatest(pmi, F.lit(0.0)), 6).alias("ppmi"),
    )


def triangle_count(edges: DataFrame) -> DataFrame:
    """Global triangle count over an undirected edge list. Input edges
    are canonicalized (a < b) and deduplicated here, so callers can
    pass raw pair tables. The join-based algorithm: wedges a<b<c from
    e(a,b) ⋈ e(b,c), closed by e(a,c) — each triangle counted exactly
    once thanks to the total order. Two hash joins, both key-
    partitioned; prune edges (by support) before calling to bound the
    wedge fan-out.

    Returns a 1-row (n_triangles) DataFrame."""
    # e feeds all three join roles (ab, bc, ac) — materialize the
    # canonicalized edge list once instead of re-running the upstream
    # pair plan + distinct three times
    e = materialize_reused(
        edges.select(
            F.least("item_a", "item_b").alias("a"),
            F.greatest("item_a", "item_b").alias("b"),
        )
        .filter(F.col("a") < F.col("b"))
        .distinct()
    )
    ab = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    bc = e.select(F.col("a").alias("y"), F.col("b").alias("z"))
    ac = e.select(F.col("a").alias("x"), F.col("b").alias("z"))
    wedges = ab.join(bc, "y")
    closed = wedges.join(ac, ["x", "z"])
    return closed.select(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )


def item_cosine_from_pairs(
    pairs: DataFrame,
    min_support: int = 1,
) -> DataFrame:
    """Item-item cosine similarity on implicit feedback, straight from
    the co-occurrence pair table: sim(a,b) = support(a,b) /
    √(deg(a)·deg(b)) where deg(x) = Σ support over pairs touching x —
    margins re-aggregate from the (tiny relative to raw) pair table,
    the PPMI discipline. One sqrt per surviving pair over exact
    integers, rounded 6 → oracle-pairable. The classic
    item-based-recommender scoring (Sarwar et al. 2001) without ever
    materializing user×item vectors.

    Returns (item_a, item_b, support, cosine)."""
    # same discipline as ppmi_scores: the pair plan (often a basket
    # collect_set + agg) feeds degrees AND the final join — one
    # materialization instead of three evaluations
    p = materialize_reused(pairs.filter(F.col("support") >= min_support))
    m = _two_role_margins(p, "item_a", "item_b", "support", "item", "deg")
    j = (
        p.join(m.select(F.col("item").alias("item_a"),
                        F.col("deg").alias("deg_a")), "item_a")
        .join(m.select(F.col("item").alias("item_b"),
                       F.col("deg").alias("deg_b")), "item_b")
    )
    return j.select(
        "item_a",
        "item_b",
        "support",
        F.round(
            F.col("support").cast("double")
            / F.sqrt(
                F.col("deg_a").cast("double") * F.col("deg_b").cast("double")
            ),
            6,
        ).alias("cosine"),
    )


def transition_counts(
    df: DataFrame,
    seq_col: str,
    order_cols: tuple[str, ...],
    state_col: str,
) -> DataFrame:
    """First-order Markov transition counts + conditional probabilities
    over per-key ordered event sequences: one window lag per key (the
    order is made total by ``order_cols`` — pass a tie-breaker id so
    results are deterministic), exact pair counts, P(next|cur) =
    c(cur,next)/c(cur·) as one rounded division. The sequence-model /
    next-event-prediction prep shape; scales as one key-partitioned
    window plus a combiner-friendly pair agg.

    Returns (cur, nxt, c_trans, p_trans)."""
    from pyspark.sql import Window as W

    wnd = W.partitionBy(seq_col).orderBy(*order_cols)
    lagged = df.select(
        F.col(state_col).alias("cur"),
        F.lead(state_col).over(wnd).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    c = lagged.groupBy("cur", "nxt").agg(
        F.count(F.lit(1)).cast("long").alias("c_trans")
    )
    tot = c.groupBy("cur").agg(F.sum("c_trans").cast("long").alias("c_cur"))
    return c.join(tot, "cur").select(
        "cur",
        "nxt",
        "c_trans",
        F.round(
            F.col("c_trans").cast("double") / F.col("c_cur").cast("double"), 6
        ).alias("p_trans"),
    )
