"""Full-text search over the document corpus: inverted term index +
BM25-ranked conjunctive search.

Scale shape: the index build is one tokenize pass + one (term, doc)
hash aggregation — combiner-friendly, shuffle ∝ token count. At 100 TB
the index is *written* partitioned/bucketed by term so a query's term
lookups are partition-pruned point reads (same layout story as
operators/layout.py); corpus-level statistics (N, avg doc length) are a
one-row aggregate broadcast into the scoring plan. A search touches
only the postings of its query terms — work ∝ Σ df(term), never corpus
size.

Determinism: BM25 per-term scores are rounded to 9 decimals and summed
as DECIMAL(24,9) (shuffle-order-independent), then surfaced as a
rounded double — the same convention as the bigram-LM scorer, which is
what lets q_text_search hash-match its DuckDB oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from etl_demos_spark.operators.text import WORD_RE


def build_term_index(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(term, doc_id, tf) postings from one tokenize pass (lowercased
    word tokens, the corpus-wide convention). Write this partitioned by
    a term hash bucket for point-lookup search at scale."""
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_RE), F.lit(0))
        ).alias("term"),
    )
    return toks.groupBy("term", id_col).agg(F.count(F.lit(1)).alias("tf"))


def doc_lengths(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, dl): token count per document."""
    return df.select(
        F.col(id_col),
        F.size(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_RE), F.lit(0))
        ).cast("long").alias("dl"),
    )


def bm25_search(
    index: DataFrame,
    lengths: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    require_all: bool = True,
) -> DataFrame:
    """Top-k documents for a bag of query terms under BM25 (Lucene-style
    non-negative idf: ln(1 + (N - df + 0.5)/(df + 0.5))).

    Plan: postings filtered to the query terms (an IN over literals —
    partition-prunable against a written index), joined to doc lengths
    and to the broadcast one-row corpus stats; one groupBy(doc) sums the
    per-term scores. ``require_all=True`` keeps only docs matching every
    term (conjunctive search) via a distinct-term count."""
    n_docs = lengths.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avg_dl"),
    )
    postings = index.filter(F.col("term").isin([t.lower() for t in terms]))
    dfreq = postings.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    )
    scored = (
        postings.join(dfreq, "term")
        .join(lengths, id_col)
        .crossJoin(F.broadcast(n_docs))
    )
    idf = F.log(
        F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_part = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avg_dl"))
    )
    per_term = F.round(idf * tf_part, 9).cast("decimal(24,9)")
    agg = scored.groupBy(id_col).agg(
        F.count_distinct("term").cast("long").alias("n_terms_matched"),
        F.round(F.sum(per_term).cast("double"), 6).alias("bm25"),
    )
    if require_all:
        agg = agg.filter(F.col("n_terms_matched") == len(set(t.lower() for t in terms)))
    # TakeOrdered pre-prune BEFORE the ranking window: a partitionless
    # row_number gets no WindowGroupLimit pushdown (verified on the
    # physical plan), so without this every matched doc would funnel
    # through ONE partition for ranking — orderBy+limit runs as
    # per-partition partial top-k and the window then ranks k rows
    topk = agg.orderBy(F.col("bm25").desc(), F.col(id_col).asc()).limit(k)
    w = Window.orderBy(F.col("bm25").desc(), F.col(id_col).asc())
    return topk.withColumn("rank", F.row_number().over(w).cast("long"))


def tfidf_vectors(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 6,
) -> DataFrame:
    """Sparse TF-IDF document vectors: one (doc_id, term, tfidf) row per
    distinct term occurrence, weight = tf · ln(N/df).

    The classic retrieval/feature representation sitting between the
    BM25 scorer above and the dense-embedding family: cheap enough to
    build for the whole corpus (the same one-pass postings aggregation
    as the index), sparse enough to join/aggregate downstream. The
    vocabulary side (term → df) is NOT broadcast-hinted: |vocab| scales
    with the corpus, so AQE picks broadcast while it fits and falls back
    to a shuffle join when it doesn't. The corpus size joins in as a
    one-row broadcast. Weights are rounded (1e-6) so ULP-level ln()
    differences between engines can't move a comparison."""
    tf = build_term_index(df, id_col, text_col)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = df.agg(F.count(F.lit(1)).alias("n"))
    return (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            id_col,
            "term",
            F.round(
                F.col("tf") * F.log(F.col("n").cast("double") / F.col("df")),
                round_to,
            ).alias("tfidf"),
        )
    )


def hybrid_search(
    docs: DataFrame,
    embeddings: DataFrame,
    terms: list[str],
    query_vec,
    k: int = 10,
    candidates: int = 50,
    require_all: bool = True,
    id_col: str = "doc_id",
    text_col: str = "text",
    emb_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-stage hybrid retrieval: BM25 lexical candidates → exact
    embedding-cosine rerank — the standard search architecture (cheap
    high-recall lexical stage over the full corpus; the expensive
    semantic scorer touches only ``candidates`` rows).

    The rerank joins the candidate ids against the embedding table
    (broadcast — the candidate set is k-sized) and scores with the
    deterministic sequential-HOF cosine, so the whole operator is
    oracle-twinnable. Candidates without an embedding drop out (inner
    join) — surface them separately if lexical-only fallback is wanted.

    ``require_all`` passes through to the lexical stage. The default
    (True) is conjunctive: multi-term queries where NO single document
    contains every term return zero candidates, so the semantic rerank
    never sees the near-misses. Pass False for the high-recall
    disjunctive stage (docs matching any term, still BM25-ranked) when
    the query is long or exploratory.

    Output: (id, bm25, cos_sim, hybrid_rank) — rank by (cos desc,
    bm25 desc, id).
    """
    from etl_demos_spark.operators.similarity import cosine

    idx = build_term_index(docs, id_col, text_col)
    lens = doc_lengths(docs, id_col, text_col)
    cands = bm25_search(
        idx, lens, terms, id_col, k=candidates, require_all=require_all
    )
    q_lit = F.array(*[F.lit(float(x)) for x in query_vec])
    emb = embeddings.select(
        F.col(emb_id_col).alias(id_col), F.col(vec_col).alias("__v")
    )
    scored = (
        emb.join(F.broadcast(cands.select(id_col, "bm25")), id_col)
        .withColumn("cos_sim", F.round(cosine(F.col("__v"), q_lit), 6))
        .drop("__v")
    )
    w = Window.orderBy(
        F.col("cos_sim").desc(), F.col("bm25").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("hybrid_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("hybrid_rank") <= k)
    )
