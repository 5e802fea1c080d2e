"""Distributed BPE merge learning + encoding (tokenizer induction).

Implements byte-pair-encoding subword learning (Sennrich, Haddow &
Birch, "Neural Machine Translation of Rare Words with Subword Units",
ACL 2016 — the published learn_bpe algorithm) on DataFrames:

1. The corpus collapses to a WORD-FREQUENCY table first (pretokenize →
   groupBy piece). This is the classic trick that makes BPE training
   cheap at any corpus size: every later step runs over distinct pieces
   (vocabulary-sized, ~10⁵-10⁷ rows for a 100 TB corpus) weighted by
   count, never over the corpus again. One combiner-friendly shuffle.
2. Each piece is a space-joined symbol string (initially characters).
   Per merge round: pair counts via the codegen'd adjacent-bigram
   explode (work ∝ Σ|piece| over DISTINCT pieces), weighted by piece
   frequency; the argmax pair is ONE collected row (count desc, pair
   asc — deterministic tie-break); the merge applies as a single JVM
   ``regexp_replace`` with (?<!\\S)/(?!\\S) guards — the same
   non-overlapping left-to-right replacement the reference algorithm
   uses. No driver materialization beyond the 1-row argmax.
3. Lineage is truncated with ``localCheckpoint`` every few rounds —
   an iterative driver loop otherwise compounds the plan (the same
   lesson as operators/graph.py pagerank).

Encoding (``apply_merges``) replays the merge table in rank order.
The expression form chains one ``regexp_replace`` per merge into a
single whole-stage-codegen projection — exact but the generated code
grows with the merge count, so it is capped; the scale path is an
Arrow-batched pandas UDF running the standard iterative merge loop per
pre-token with a memo cache, pinned token-identical in tests.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from etl_demos_spark.operators.text import BPE_PRETOKEN_RE, pretokenize

__all__ = [
    "word_freq_table",
    "learn_bpe_merges",
    "apply_merges",
    "learn_bpe_reference",
]


def word_freq_table(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(piece, cnt) over pre-token pieces — the compact training input.

    Output columns: ``piece`` (string), ``cnt`` (long)."""
    return (
        df.select(F.explode(pretokenize(text_col)).alias("piece"))
        .groupBy("piece")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


# Symbol separator: the unit-separator control char. The classic
# algorithm space-joins symbols, but GPT-2-style pre-tokens CONTAIN
# leading spaces as symbols, which makes a space-joined representation
# ambiguous ('" a"' → '"  a"' parses back wrong). \x1f cannot appear in
# the pre-token classes, so joins/splits are unambiguous.
SEP = "\x1f"


def _sym_init(piece: Column) -> Column:
    """SEP-joined character symbols: 'low' → 'l\x1fo\x1fw'."""
    return F.concat_ws(SEP, F.split(piece, ""))


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent symbol-pair counts weighted by piece frequency.

    arrays_zip of the symbol array with its shifted self → explode —
    all codegen, no interpreted lambdas (the gram-path lesson from
    operators/text.py)."""
    syms = F.split("sym", SEP)
    n = F.size(syms)
    pairs = F.arrays_zip(
        F.slice(syms, 1, n - 1).alias("a"),
        F.slice(syms, 2, n - 1).alias("b"),
    )
    return (
        vocab.filter(n >= 2)
        .select(F.explode(pairs).alias("p"), "cnt")
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("cnt").alias("pair_cnt"))
    )


def _merge_pattern(a: str, b: str) -> str:
    """The reference algorithm's replacement — the pair as two
    SEP-delimited symbols, non-overlapping left-to-right — with the
    word-boundary guards rewritten for the SEP delimiter."""
    return (
        "(?:^|(?<=" + SEP + "))"
        + re.escape(a) + SEP + re.escape(b)
        + "(?=" + SEP + "|$)"
    )


def _merge_replacement(a: str, b: str) -> str:
    """The merged symbol, escaped for use as a REPLACEMENT string:
    Java's Matcher (regexp_replace) treats ``$`` as a group reference
    and ``\\`` as an escape in the replacement — an unescaped '$$'
    merge (markdown/LaTeX corpora) throws INVALID_REGEXP_REPLACE and a
    backslash pair silently collapses to one backslash, corrupting the
    vocab. quoteReplacement semantics: escape backslash first."""
    return (a + b).replace("\\", "\\\\").replace("$", "\\$")


def learn_bpe_merges(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 32,
    checkpoint_every: int = 8,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a document corpus.

    Returns the ranked merge list [(left, right), ...]. Ties break on
    (count desc, left asc, right asc) so the result is independent of
    partitioning. Stops early when no pair occurs twice."""
    vocab = word_freq_table(df, text_col).select(
        _sym_init(F.col("piece")).alias("sym"), "cnt"
    )
    vocab = vocab.localCheckpoint()
    merges: list[tuple[str, str]] = []
    for i in range(n_merges):
        top = (
            _pair_counts(vocab)
            .orderBy(F.col("pair_cnt").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not top or top[0]["pair_cnt"] < 2:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        vocab = vocab.select(
            F.regexp_replace(
                "sym", F.lit(_merge_pattern(a, b)),
                F.lit(_merge_replacement(a, b)),
            ).alias("sym"),
            "cnt",
        )
        if (i + 1) % checkpoint_every == 0:
            vocab = vocab.localCheckpoint()
    return merges


def _encode_piece(piece: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Standard iterative BPE encode of one pre-token piece."""
    syms = list(piece)
    while len(syms) > 1:
        best, best_rank = None, None
        for pair in zip(syms, syms[1:]):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = pair, r
        if best is None:
            break
        a, b = best
        out, i = [], 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def apply_merges(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    use_udf: bool = True,
) -> DataFrame:
    """Encode ``text_col`` into BPE tokens (array<string>) with a learned
    merge table.

    ``use_udf=True`` (scale path): Arrow-batched pandas UDF running the
    standard per-piece merge loop with a memo cache — work ∝ distinct
    pieces per batch, no generated-code growth with merge count.
    ``use_udf=False`` (expression form, exact reference): one
    regexp_replace per merge chained into a single codegen projection —
    viable for small merge tables; the two forms are pinned
    token-identical in tests/test_bpe.py."""
    if not use_udf:
        # reference form; requires df rows to be unique (it re-joins on
        # all columns). Piece order is carried explicitly (posexplode +
        # array_sort) — collect_list order alone is shuffle-dependent.
        sym = F.concat_ws(SEP, F.split(F.col("_piece"), ""))
        for a, b in merges:
            sym = F.regexp_replace(
                sym, F.lit(_merge_pattern(a, b)), F.lit(_merge_replacement(a, b))
            )
        cols = df.columns
        ex = df.select(
            *cols, F.posexplode(pretokenize(text_col)).alias("_pos", "_piece")
        ).withColumn("_sym", sym)
        enc = ex.groupBy(*cols).agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("_pos"),
                                F.split("_sym", SEP).alias("s"),
                            )
                        )
                    ),
                    lambda x: x["s"],
                )
            ).alias(out_col)
        )
        # NULL-SAFE re-join: the equi-join form would miss any row with
        # a NULL in a non-text column (NULL != NULL) and silently hand
        # it an empty token array via the coalesce below
        dl, el = df.alias("__d"), enc.alias("__e")
        cond = None
        for c in cols:
            cur = F.col(f"__d.{c}").eqNullSafe(F.col(f"__e.{c}"))
            cond = cur if cond is None else (cond & cur)
        return dl.join(el, cond, "left").select(
            *[F.col(f"__d.{c}") for c in cols],
            F.coalesce(
                F.col(f"__e.{out_col}"), F.array().cast("array<string>")
            ).alias(out_col),
        )

    ranks = {pair: i for i, pair in enumerate(merges)}
    spark = df.sparkSession
    b_ranks = spark.sparkContext.broadcast(ranks)
    cols = df.columns

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rk = b_ranks.value
        pat = _pretoken_pattern()
        memo: dict[str, list[str]] = {}
        for pdf in batches:
            toks = []
            for t in pdf[text_col]:
                pieces = pat.findall(t or "")
                out: list[str] = []
                for p in pieces:
                    got = memo.get(p)
                    if got is None:
                        got = memo[p] = _encode_piece(p, rk)
                    out.extend(got)
                toks.append(out)
            pdf = pdf.copy()
            pdf[out_col] = toks
            yield pdf

    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    )
    return df.mapInPandas(encode, f"{schema}, {out_col} array<string>")


def _pretoken_pattern():
    """Python-side compile of text.BPE_PRETOKEN_RE. The stdlib ``re``
    has no \\p{L}/\\p{N}; the ``regex`` module matches the JVM's
    unicode-category semantics for this pattern."""
    import regex

    return regex.compile(BPE_PRETOKEN_RE)


def learn_bpe_reference(
    texts: list[str], n_merges: int = 32
) -> list[tuple[str, str]]:
    """Pure-Python reference of learn_bpe_merges (same algorithm, same
    tie-break) for pinning the distributed form in tests."""
    from collections import Counter

    pat = _pretoken_pattern()
    freq = Counter(p for t in texts for p in pat.findall(t))
    vocab = {SEP.join(list(w)): c for w, c in freq.items()}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for w, c in vocab.items():
            syms = w.split(SEP)
            for pair in zip(syms, syms[1:]):
                pairs[pair] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if best[1] < 2:
            break
        (a, b) = best[0]
        merges.append((a, b))
        # callable replacement: re.sub treats \ and \g<> escapes in a
        # string replacement — a lambda substitutes the LITERAL symbol
        rx = re.compile(_merge_pattern(a, b))
        merged = a + b
        vocab = {rx.sub(lambda _m: merged, w): c for w, c in vocab.items()}
    return merges
