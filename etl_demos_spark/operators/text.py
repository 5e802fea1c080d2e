"""Text analysis operators for training-data pipelines.

All hot-path expressions are Spark built-ins (JVM, whole-stage codegen) —
no Python UDFs: at 100 TB a row-at-a-time Python tokenizer is the
difference between hours and weeks. Regex patterns are kept to constructs
with identical semantics in Java regex and RE2 so the DuckDB oracle can
mirror them.

Operators:
- token stats (whitespace + word-regex counting, char classes)
- quality scoring (length / punctuation / stopword / uniqueness ratios)
- language ID (stopword-profile heuristic)
- document fingerprinting (normalized md5; rolling/winnowing in dedup.py)
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

WORD_RE = "[A-Za-z0-9]+"

# Minimal per-language stopword profiles for the heuristic language ID.
# Real pipelines plug in fastText/CLD3 via a pandas_udf (see multimodal.py
# for the UDF plumbing pattern); the heuristic keeps the operator fully
# JVM-side and oracle-checkable.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "es": ("el", "la", "de", "y", "que"),
    "fr": ("le", "la", "de", "et", "que"),
    "de": ("der", "die", "das", "und", "zu"),
}


def token_count(text: Column | str) -> Column:
    """Number of word tokens (letters/digits runs) — robust to repeated
    whitespace and punctuation, identical in Spark and DuckDB/RE2."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(WORD_RE), F.lit(0))).cast("long")


# GPT-2-style pre-tokenizer pattern, restricted to the Java-regex ∩ RE2
# dialect: the upstream pattern's trailing-whitespace lookahead
# (`\s+(?!\S)`) is dropped (RE2 has no lookahead), so a whitespace run
# before a word is one piece (" ?" prefixes still attach a single space
# to the following word run, which is where almost all BPE piece-count
# mass sits). `\s` is replaced by the explicit ASCII class because Java
# includes \x0B in \s and RE2 does not. Contractions, letter runs, digit
# runs, punctuation runs — the standard piece classes.
BPE_PRETOKEN_RE = (
    "'(?:s|t|re|ve|m|ll|d)"
    "| ?\\p{L}+"
    "| ?\\p{N}+"
    "| ?[^ \\t\\n\\r\\f\\p{L}\\p{N}]+"
    "|[ \\t\\n\\r\\f]+"
)


def pretokenize(text: Column | str) -> Column:
    """BPE-style pre-token pieces (array<string>) — the unit a byte-pair
    tokenizer would merge within. One JVM regex pass; the pieces cover
    the input exactly (every char lands in exactly one piece)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(c, F.lit(BPE_PRETOKEN_RE), F.lit(0))


def bpe_token_count(text: Column | str) -> Column:
    """Pre-token piece count — the standard proxy for tokenizer budget
    accounting before the (model-specific) merge table is applied."""
    return F.size(pretokenize(text)).cast("long")


def char_stats(text: Column | str) -> dict[str, Column]:
    c = F.col(text) if isinstance(text, str) else text
    n = F.length(c)
    return {
        "n_chars": n.cast("long"),
        "n_alpha": F.size(F.regexp_extract_all(c, F.lit("[A-Za-z]"), F.lit(0))).cast("long"),
        "n_digit": F.size(F.regexp_extract_all(c, F.lit("[0-9]"), F.lit(0))).cast("long"),
        "n_space": F.size(F.regexp_extract_all(c, F.lit(" "), F.lit(0))).cast("long"),
    }


def lower_tokens(text: Column | str) -> Column:
    """The canonical lowercased word-token array (ONE regexp pass).
    Project it once and feed the ``*_from_tokens`` helpers when several
    metrics share it — each ``stopword_hits``/``quality_score`` call
    otherwise re-tokenizes the full text."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(F.lower(c), F.lit(WORD_RE), F.lit(0))


def stopword_hits_from_tokens(
    tokens: Column, stopwords: tuple[str, ...]
) -> Column:
    return F.size(
        F.filter(tokens, lambda t: t.isin(*stopwords))
    ).cast("long")


def stopword_hits(text: Column | str, stopwords: tuple[str, ...]) -> Column:
    """Count of stopword occurrences (word-boundary safe: tokens compared
    exactly, not substring matches)."""
    return stopword_hits_from_tokens(lower_tokens(text), stopwords)


# PII patterns — constructs with identical semantics in Java regex and
# RE2 (no lookaround, no backreferences) so the DuckDB oracle can mirror
# the redaction bit-for-bit. Deliberately high-precision/low-recall
# shapes: a training pipeline prefers leaving ambiguous text alone over
# mangling prose (emails and URL/phone shapes are unambiguous).
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    # explicit whitespace class, NOT \s: Java's \s includes \x0B and
    # RE2's does not (the BPE_PRETOKEN_RE note above) — with \s a URL
    # followed by a vertical tab redacts differently in Spark vs the
    # DuckDB oracle, breaking the bit-for-bit contract
    (r"https?://[^ \t\n\r\f\x0B]+", "[URL]"),
    (r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "[PHONE]"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
)


def redact_pii(text: Column | str) -> Column:
    """Replace email / URL / phone / SSN shapes with typed placeholders —
    chained regexp_replace, all JVM-side, order matters (emails and URLs
    are consumed before the bare-number patterns can see their digits)."""
    c = F.col(text) if isinstance(text, str) else text
    for pat, token in PII_PATTERNS:
        c = F.regexp_replace(c, pat, token)
    return c


def quality_score_from_tokens(text: Column | str, tokens: Column) -> Column:
    """quality_score over a pre-projected token array (see lower_tokens)."""
    c = F.col(text) if isinstance(text, str) else text
    n_tok = F.size(tokens).cast("double")
    n_chars = F.length(c).cast("double")
    len_ok = F.when((n_chars >= 100) & (n_chars <= 20000), 1.0).otherwise(0.0)
    alpha_ratio = (
        F.size(F.regexp_extract_all(c, F.lit("[A-Za-z]"), F.lit(0))) / F.greatest(n_chars, F.lit(1.0))
    )
    stop_ok = F.when(
        stopword_hits_from_tokens(tokens, LANG_STOPWORDS["en"]) > 0, 1.0
    ).otherwise(0.0)
    diversity = F.size(F.array_distinct(tokens)) / F.greatest(n_tok, F.lit(1.0))
    return (len_ok + alpha_ratio + stop_ok + diversity) / F.lit(4.0)


def quality_score(text: Column | str) -> Column:
    """Composite [0,1] quality heuristic: length band + alpha ratio +
    stopword presence + token diversity. Deterministic, built-ins only.
    """
    return quality_score_from_tokens(text, lower_tokens(text))


def lang_guess_from_tokens(tokens: Column) -> Column:
    """lang_guess over a pre-projected token array (see lower_tokens)."""
    scores = [
        (lang, stopword_hits_from_tokens(tokens, sw))
        for lang, sw in LANG_STOPWORDS.items()
    ]
    best = F.greatest(*[s for _, s in scores])
    expr = F.when(best <= 0, F.lit("und"))
    for lang, s in scores:
        expr = expr.when(s == best, F.lit(lang))
    return expr.otherwise(F.lit("und"))


def lang_guess(text: Column | str) -> Column:
    """Stopword-profile language ID: the language whose stopword profile
    hits the most tokens wins; ties and zero-hit rows → 'und'. Evaluation
    order is the fixed LANG_STOPWORDS order, making ties deterministic.
    """
    return lang_guess_from_tokens(lower_tokens(text))


def fingerprint(text: Column | str) -> Column:
    """Normalized document fingerprint: md5 of lowercased,
    whitespace-collapsed text. Stable across engines (md5 is md5).
    Delegates to normalize_text — ONE canonical normalization, shared
    with shingling/dedup, so a future tweak cannot silently diverge."""
    return F.md5(normalize_text(text))


def text_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One row per document with the full feature set — the building block
    for corpus-quality dashboards and filter thresholds.

    The token array is projected ONCE and shared by every token-derived
    metric: quality + language ID alone would otherwise tokenize each
    document ~6× (4 language profiles + stopword presence + diversity),
    multiplying the dominant regexp cost of the corpus-profiling pass."""
    stats = char_stats(text_col)
    toked = df.withColumn("__toks", lower_tokens(text_col))
    out = toked.select(
        "*",
        token_count(text_col).alias("n_tokens"),
        stats["n_alpha"].alias("n_alpha"),
        stats["n_digit"].alias("n_digit"),
        quality_score_from_tokens(text_col, F.col("__toks")).alias("quality"),
        lang_guess_from_tokens(F.col("__toks")).alias("lang_pred"),
        fingerprint(text_col).alias("fp"),
    )
    return out.drop("__toks")


def normalize_text(text: Column | str) -> Column:
    """Lowercase, trim, collapse whitespace — the shared normalization for
    fingerprints and shingling. Project it ONCE (``.select(...
    normalize_text("text").alias("t"))``) before per-gram expressions so
    the regexp isn't re-evaluated per array element (higher-order-function
    lambdas are interpreted; see operators/dedup.py)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_replace(F.trim(F.lower(c)), "\\s+", " ")


def char_ngram_hashes(norm: Column, k: int = 7) -> Column:
    """Rolling k-gram xxhash64 sequence over an ALREADY-normalized text
    column (project normalize_text ONCE first — the md5_gram_hashes
    contract). The normalization must not live inside this expression:
    higher-order-function lambdas are interpreted, and an embedded
    regexp chain would re-run over the full document once PER GRAM —
    O(len²) regexp work on the function's own scale path. Spark-only
    hash (cheap); use md5_gram_hashes where a DuckDB oracle must
    reproduce the values."""
    n = F.length(norm) - F.lit(k - 1)
    return F.when(
        n >= 1,
        F.transform(
            F.sequence(F.lit(1), n), lambda i: F.xxhash64(norm.substr(i, F.lit(k)))
        ),
    ).otherwise(F.array().cast("array<long>"))


def md5_gram_hashes(norm: Column, k: int = 7) -> Column:
    """k-gram md5-hex sequence over an ALREADY-normalized text column
    (see normalize_text). Cross-engine deterministic: md5 is md5, and hex
    strings order identically under binary collation in Spark and DuckDB
    — so winnowing minima match exactly across engines, unlike xxhash64
    (char_ngram_hashes, the cheaper Spark-only scale path)."""
    n = F.length(norm) - F.lit(k - 1)
    return F.when(
        n >= 1,
        F.transform(F.sequence(F.lit(1), n), lambda i: F.md5(norm.substr(i, F.lit(k)))),
    ).otherwise(F.array().cast("array<string>"))


def word_ngrams(text: Column | str, n: int = 2) -> Column:
    """Array of space-joined word n-grams over the tokenized text.
    Tokenization happens ONCE (single regexp_extract_all), then grams are
    sliced from the materialized token array — no per-gram re-scan of the
    source string. Documents with fewer than n tokens yield an empty
    array."""
    c = F.col(text) if isinstance(text, str) else text
    tokens = F.regexp_extract_all(F.lower(c), F.lit(WORD_RE), F.lit(0))
    m = F.size(tokens) - F.lit(n - 1)
    return F.when(
        m >= 1,
        F.transform(
            F.sequence(F.lit(1), m),
            lambda i: F.concat_ws(" ", F.slice(tokens, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def exploded_word_ngrams(
    df: DataFrame,
    keep_cols: tuple[str, ...],
    text_col: str = "text",
    n: int = 2,
) -> DataFrame:
    """(keep_cols..., gram) rows — the HOT-PATH form of word_ngrams.

    word_ngrams builds the gram array with a higher-order ``transform``
    lambda, which Spark evaluates interpreted (no codegen): measured
    3.4 s vs 0.43 s at sf0.1 for the same 265k grams. This form stays
    fully codegen'd: tokenize once (regexp_extract_all), ``arrays_zip``
    n shifted ``slice`` views (plain expressions, no lambda), explode the
    struct array, then one row-level concat_ws. Output is row-identical
    to ``explode(word_ngrams(...))`` (pinned in tests). Use this wherever
    grams become rows; keep word_ngrams for array-context expressions.
    """
    # project the token array ONCE: putting the tokens expression in
    # both the filter predicate and the projection would tokenize every
    # document twice (codegen does not share subexpressions across the
    # Filter and Project operators)
    toked = df.select(
        *keep_cols,
        F.regexp_extract_all(
            F.lower(F.col(text_col)), F.lit(WORD_RE), F.lit(0)
        ).alias("__toks"),
    )
    m = F.size(F.col("__toks")) - F.lit(n - 1)
    zipped = F.arrays_zip(
        *[F.slice(F.col("__toks"), i + 1, m).alias(f"t{i}") for i in range(n)]
    )
    rows = toked.filter(m >= 1).select(*keep_cols, F.explode(zipped).alias("_z"))
    gram = F.concat_ws(" ", *[F.col(f"_z.t{i}") for i in range(n)])
    return rows.select(*keep_cols, gram.alias("gram"))


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
) -> DataFrame:
    """Intra-document repetition metrics (the Gopher/RefinedWeb quality
    rules family): per document, the fraction of n-grams covered by the
    single most frequent n-gram (``top_gram_frac``) and the fraction of
    n-gram occurrences that are repeats (``dup_gram_frac``). High values
    flag boilerplate / template spam for corpus filtering.

    Scale shape: explode grams → two hash aggregations keyed on
    (doc, gram) then (doc). Both are partial-agg (map-side combine)
    friendly and shuffle only the counted gram rows, never the document
    text; work is ∝ corpus token count, the floor for any exact
    repetition measure. Reference has no equivalent (training-data
    extension surface)."""
    grams = exploded_word_ngrams(df, (id_col,), text_col, n)
    counts = grams.groupBy(id_col, "gram").agg(F.count(F.lit(1)).alias("cnt"))
    return counts.groupBy(id_col).agg(
        F.sum("cnt").cast("long").alias("n_grams"),
        F.max("cnt").cast("long").alias("top_gram_count"),
        F.round(F.max("cnt") / F.sum("cnt"), 6).alias("top_gram_frac"),
        F.round(F.lit(1.0) - F.count(F.lit(1)) / F.sum("cnt"), 6).alias(
            "dup_gram_frac"
        ),
    )


def winnow_fingerprints(hashes: Column, window: int = 8) -> Column:
    """Winnowing (Schleimer/Wilkerson/Aiken, SIGMOD'03): keep the minimum
    hash of every sliding window of ``window`` consecutive k-gram hashes —
    guarantees any match of length ≥ window+k-1 shares a fingerprint.
    Output: distinct selected hashes (the document's fingerprint set).
    Documents with fewer than ``window`` grams yield an empty set (the
    guard matters: sequence(1, m≤0) would count DOWN, and slice() rejects
    a 0 start)."""
    m = F.size(hashes) - F.lit(window - 1)
    mins = F.transform(
        F.sequence(F.lit(1), m),
        lambda i: F.array_min(F.slice(hashes, i, window)),
    )
    empty = F.filter(hashes, lambda _: F.lit(False))
    return F.array_distinct(F.when(m >= 1, mins).otherwise(empty))


def bigram_lm_model(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Self-supervised word-bigram language model over the corpus (the
    CCNet quality-scoring recipe: train an n-gram LM, score documents by
    per-token log-probability, bucket into quality tiers).

    Returns ``(gram, w1, c2, c1, logp)`` where ``logp =
    round(ln(c2/c1), 9)`` is the conditional bigram log-probability.
    Prefix counts come from re-aggregating the bigram counts (``c1(w1) =
    Σ_w2 c2(w1, w2)``) — one pass over the corpus text, two
    combiner-friendly hash aggregations; nothing reads the text twice.

    Scale: model rows ∝ distinct bigrams (Heaps-law sublinear in corpus
    size). For 100 TB scoring, prune to the top-K grams by count and
    broadcast; unseen grams then need a smoothing floor at score time
    (``lm_score_documents(default_logp=...)``).
    """
    grams = exploded_word_ngrams(df, (), text_col, 2)
    c2 = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("c2"))
    c2 = c2.withColumn("w1", F.split(F.col("gram"), " ").getItem(0))
    c1 = c2.groupBy("w1").agg(F.sum("c2").cast("long").alias("c1"))
    return c2.join(c1, "w1").select(
        "gram",
        "w1",
        "c2",
        "c1",
        F.round(F.log(F.col("c2").cast("double") / F.col("c1")), 9).alias("logp"),
    )


def lm_score_documents(
    df: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    rare_max: int = 2,
    default_logp: float | None = None,
) -> DataFrame:
    """Score each document against a bigram LM (see bigram_lm_model).

    Output per document: ``n_bigrams``, ``sum_freq`` (Σ corpus counts of
    its bigrams — integer-exact), ``rare_frac`` (fraction of bigrams with
    corpus count ≤ rare_max), ``avg_logp`` (mean conditional bigram
    log-prob). ``avg_logp`` is summed as DECIMAL(24,9) of the model's
    pre-rounded logp so the aggregate is shuffle-order-independent and
    hash-identical to the DuckDB oracle; the single final double division
    is deterministic IEEE.

    ``default_logp=None`` inner-joins (every gram seen — correct when the
    model was trained on this corpus); a float value left-joins and fills
    unseen grams (the pruned-model smoothing floor for cross-corpus
    scoring). Documents with < 2 tokens have no bigrams and drop out.

    Scale shape: explode grams → join model (broadcast when pruned) →
    one partial-agg groupBy(doc). Work ∝ corpus token count.
    """
    grams = exploded_word_ngrams(df, (id_col,), text_col, 2)
    if default_logp is None:
        j = grams.join(model, "gram")
    else:
        j = grams.join(model, "gram", "left").fillna(
            {"c2": 0, "c1": 0, "logp": default_logp}
        )
    dec = F.col("logp").cast("decimal(24,9)")
    n = F.count(F.lit(1))
    return j.groupBy(id_col).agg(
        n.cast("long").alias("n_bigrams"),
        F.sum("c2").cast("long").alias("sum_freq"),
        F.round(F.sum(F.when(F.col("c2") <= rare_max, 1).otherwise(0)) / n, 6).alias(
            "rare_frac"
        ),
        F.round(F.sum(dec).cast("double") / n, 6).alias("avg_logp"),
    )


def lm_quality_buckets(
    scored: DataFrame,
    score_col: str = "avg_logp",
    id_col: str = "doc_id",
    n_buckets: int = 3,
    exact: bool = True,
) -> DataFrame:
    """Assign CCNet-style quality tiers (1 = lowest score = tail .. n =
    head). ``exact=True`` uses a global ntile window — deterministic and
    oracle-pairable, but a single-partition sort: only for corpora that
    fit one task's sort budget (dimension-sized, or post-aggregation
    outputs). ``exact=False`` is the 100 TB path: cutoffs from
    percentile_approx (one aggregate, driver gets n_buckets-1 doubles),
    then a narrow when-chain — no global sort, bucket boundaries
    approximate but stable."""
    from pyspark.sql import Window

    if exact:
        w = Window.orderBy(F.col(score_col).asc(), F.col(id_col).asc())
        return scored.withColumn("lm_bucket", F.ntile(n_buckets).over(w))
    fracs = [i / n_buckets for i in range(1, n_buckets)]
    cuts = None
    if fracs:  # n_buckets == 1 → no cuts; percentile_approx([]) rejects
        cuts = scored.agg(
            F.percentile_approx(score_col, fracs, 10_000).alias("cuts")
        ).collect()[0]["cuts"]
    if not cuts:
        # empty input or all-NULL scores: percentile_approx returns NULL —
        # every row (if any) is tier 1 rather than a TypeError
        return scored.withColumn("lm_bucket", F.lit(1))
    col = F.lit(1)
    for i, c in enumerate(cuts):
        col = F.when(F.col(score_col) > c, F.lit(i + 2)).otherwise(col)
    return scored.withColumn("lm_bucket", col)
