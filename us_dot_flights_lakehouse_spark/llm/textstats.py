"""Text analysis operators: token counting, quality scoring, language ID,
document fingerprinting — all built-in Column expressions over the
``documents`` table (no UDFs; array lambdas run in codegen).

Scale note: every operator here is embarrassingly parallel (per-row, no
shuffle). At 100 TB these run at parquet-scan speed; the only care is
column pruning — select (id, text) before applying them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from us_dot_flights_lakehouse_spark.functions.text import (
    bpe_ish_tokens,
    normalized_fingerprint,
    tokenize,
    word_bigrams,
    word_ngrams,
)

#: tiny per-language stopword lexicons for the n-gram/stopword language-ID
#: heuristic; priority order breaks ties deterministically
LANG_LEXICONS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "it", "you", "that", "for"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es", "se", "no"),
    "fr": ("le", "la", "de", "et", "les", "des", "un", "une", "du", "est"),
    "de": ("der", "die", "und", "das", "den", "von", "zu", "mit", "sich", "auf"),
}


def _stopword_count(tokens: Column, lexicon: tuple[str, ...]) -> Column:
    arr = F.array(*[F.lit(w) for w in lexicon])
    return F.size(F.filter(tokens, lambda t: F.array_contains(arr, t)))


def text_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document stats: char/token counts, BPE-ish token count, lexical
    diversity, punctuation/whitespace shape, English stopword count, a
    0..1 quality score, and the normalized md5 fingerprint."""
    toks = tokenize(text_col)
    base = docs.select(
        F.col(id_col),
        F.length(text_col).alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
        F.size(bpe_ish_tokens(text_col)).alias("n_bpe_tokens"),
        F.length(F.regexp_replace(F.col(text_col), r"\s", "")).alias("n_nonspace_chars"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"[^a-zA-Z0-9\s]"), 0)).alias(
            "n_punct"
        ),
        _stopword_count(toks, LANG_LEXICONS["en"]).alias("n_stopwords"),
        normalized_fingerprint(text_col).alias("fingerprint"),
    )
    diversity = F.col("n_unique_tokens").cast("double") / F.col("n_tokens").cast("double")
    avg_tok = F.col("n_nonspace_chars").cast("double") / F.col("n_tokens").cast("double")
    punct_ratio = F.col("n_punct").cast("double") / F.col("n_chars").cast("double")
    quality = (
        F.when((F.col("n_tokens") >= 20) & (F.col("n_tokens") <= 80), 0.4).otherwise(0.0)
        + F.when(diversity >= 0.3, 0.3).otherwise(0.0)
        + F.when(punct_ratio < 0.1, 0.3).otherwise(0.0)
    )
    return base.select(
        "*",
        diversity.alias("token_diversity"),
        avg_tok.alias("avg_token_len"),
        punct_ratio.alias("punct_ratio"),
        quality.alias("quality_score"),
    )


#: rule thresholds for ``quality_filters`` (Gopher/C4-style heuristics,
#: scaled to the short synthetic corpus; production corpora retune them)
QF_MIN_WORDS = 10
QF_MAX_WORDS = 100_000
QF_MIN_MEAN_WORD_LEN = 2.0
QF_MAX_MEAN_WORD_LEN = 10.0
QF_MIN_ALPHA_WORD_FRAC = 0.8
QF_MAX_DUP_BIGRAM_FRAC = 0.9
QF_MIN_DISTINCT_STOPWORDS = 2


def quality_filters(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Rule-based document quality filtering in the Gopher / C4 style:
    per-document heuristic signals plus a conjunctive ``keep`` verdict.

    Signals (all built-in Column expressions — scan-local, no shuffle,
    parquet-scan speed at 100 TB):

    - ``n_words``             whitespace word count
    - ``mean_word_len``       non-space chars per word (Gopher: 3..10)
    - ``alpha_word_frac``     fraction of words containing a letter
                              (Gopher: >= 0.8 "words with an alphabetic
                              character")
    - ``dup_bigram_frac``     1 - distinct/total word bigrams (repetition
                              signal; Gopher's duplicate n-gram family)
    - ``n_distinct_stopwords``distinct English stopwords present (Gopher:
                              "hard stopword" evidence the text is prose)
    - ``ellipsis_word_frac``  words that are '...' or '…' (C4 drops
                              ellipsis-heavy boilerplate)
    - ``keep``                conjunction of the thresholds above

    Rows are never dropped here — returning the verdict keeps the filter
    auditable (rejected-rate dashboards) and lets callers route rejects to
    quarantine instead of silently shrinking the corpus."""
    toks = tokenize(text_col)
    n = F.size(toks)
    bigrams = word_bigrams(toks)
    stop_arr = F.array(*[F.lit(w) for w in LANG_LEXICONS["en"]])
    base = docs.select(
        F.col(id_col),
        n.cast("int").alias("n_words"),
        F.length(F.regexp_replace(F.col(text_col), r"\s", ""))
        .cast("int")
        .alias("n_nonspace_chars"),
        F.size(F.filter(toks, lambda t: t.rlike("[a-z]")))
        .cast("int")
        .alias("n_alpha_words"),
        F.size(bigrams).cast("int").alias("n_bigrams"),
        F.size(F.array_distinct(bigrams)).cast("int").alias("n_distinct_bigrams"),
        F.size(F.array_distinct(F.filter(toks, lambda t: F.array_contains(stop_arr, t))))
        .cast("int")
        .alias("n_distinct_stopwords"),
        F.size(F.filter(toks, lambda t: (t == "...") | (t == "…")))
        .cast("int")
        .alias("n_ellipsis_words"),
    )
    mean_word_len = F.col("n_nonspace_chars").cast("double") / F.col("n_words").cast(
        "double"
    )
    alpha_frac = F.col("n_alpha_words").cast("double") / F.col("n_words").cast("double")
    dup_bigram_frac = F.when(F.col("n_bigrams") > 0, (
        (F.col("n_bigrams") - F.col("n_distinct_bigrams")).cast("double")
        / F.col("n_bigrams").cast("double")
    )).otherwise(F.lit(0.0))
    ellipsis_frac = F.col("n_ellipsis_words").cast("double") / F.col("n_words").cast(
        "double"
    )
    keep = (
        (F.col("n_words") >= QF_MIN_WORDS)
        & (F.col("n_words") <= QF_MAX_WORDS)
        & (mean_word_len >= QF_MIN_MEAN_WORD_LEN)
        & (mean_word_len <= QF_MAX_MEAN_WORD_LEN)
        & (alpha_frac >= QF_MIN_ALPHA_WORD_FRAC)
        & (dup_bigram_frac <= QF_MAX_DUP_BIGRAM_FRAC)
        & (F.col("n_distinct_stopwords") >= QF_MIN_DISTINCT_STOPWORDS)
    )
    return base.select(
        "*",
        mean_word_len.alias("mean_word_len"),
        alpha_frac.alias("alpha_word_frac"),
        dup_bigram_frac.alias("dup_bigram_frac"),
        ellipsis_frac.alias("ellipsis_word_frac"),
        keep.alias("keep"),
    )


#: Gopher repetition thresholds (Rae et al. 2021, table A1): max fraction
#: of characters covered by the single most frequent word n-gram …
REP_TOP_MAX = {2: 0.20, 3: 0.18, 4: 0.16}
#: … and max fraction of characters inside *duplicated* n-grams. Gopher
#: tabulates n=5..10 (0.15 down to 0.10); the endpoints are implemented —
#: intermediate n adds columns, not new machinery.
REP_DUP_MAX = {5: 0.15, 10: 0.10}


def repetition_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition signals, the second half of the quality
    family that ``quality_filters`` starts (that one covers word-shape and
    stopword evidence; this one covers the "excessive repetition" table):

    - ``top_{2,3,4}gram_frac``  fraction of token characters covered by
      the most frequent word n-gram: max over distinct n-grams of
      count(gram) * chars(gram), divided by total token chars, capped at
      1.0 (overlapping occurrences multi-count).  chars(gram) excludes the
      n-1 joining spaces.
    - ``dup_{5,10}gram_frac``   fraction of token characters inside
      duplicated n-grams: sum over distinct n-grams occurring >= 2 times of
      count * chars, / total token chars, capped at 1.0 (overlapping grams
      multi-count, hence the cap — Gopher's mask-based variant needs
      per-position state that buys little at these thresholds).
    - ``rep_keep``              conjunction of the Gopher thresholds.

    Verdict columns, no rows dropped (same auditability contract as
    ``quality_filters``).

    Scale: pure per-row array lambdas — zero shuffles, runs at parquet-scan
    speed and trivially parallel at 100 TB.  Per-doc cost is
    O(grams log grams): each n-gram list is array_sort'ed and the
    occurrence counts come from ONE fold over the sorted runs (Spark's
    higher-order functions are interpreted, not codegen'd, so the naive
    distinct × filter formulation is O(L²) interpreted compares — measured
    51 s for the sf0.1 corpus vs ~2 s for this run-length fold). It also
    avoids the explode + groupBy(doc, gram) shuffle of the aggregate
    formulation — at 100 TB that shuffle would move ~n_words * 5 rows per
    doc while this moves nothing."""
    # parsed-SQL builds (r13): the Column-API struct folds paid ~100 Py4J
    # round-trips per n-gram order of pure driver time per invocation
    # (guide §7.3 planning cost); parsed and composed trees analyze
    # identically.
    base = docs.select(
        F.col(id_col),
        F.expr(f"split(trim(lower({text_col})), '\\\\s+')").alias("toks"),
        F.expr(
            f"CAST(size(split(trim(lower({text_col})), '\\\\s+')) AS INT)"
        ).alias("n_words"),
        F.expr(
            f"CAST(aggregate(transform(split(trim(lower({text_col})),"
            " '\\\\s+'), x -> length(x)), 0, (acc, x) -> acc + x) AS INT)"
        ).alias("token_chars"),
    )
    tc = F.col("token_chars").cast("double")

    def run_fold(n: int):
        """(top_cover, dup_chars) for the n-gram list via one pass over the
        sorted grams: equal grams are adjacent, so occurrence counts are
        run lengths; cover(run) = run_len * (chars of the gram minus the
        n-1 joining spaces). Emitted as ONE parsed SQL expression."""
        grams = (
            f"array_sort(CASE WHEN size(toks) >= {n} THEN"
            f" transform(sequence(0, size(toks) - {n}),"
            f" i -> concat_ws(' ', slice(toks, i + 1, {n})))"
            " ELSE CAST(array() AS ARRAY<STRING>) END)"
        )
        cover = f"acc.run * (length(acc.prev) - {n - 1})"
        dup_add = f"(CASE WHEN acc.run >= 2 THEN {cover} ELSE 0 END)"
        return F.expr(
            f"aggregate({grams},"
            " named_struct('prev', '', 'run', 0, 'top', 0, 'dup', 0),"
            " (acc, x) -> CASE WHEN x = acc.prev THEN"
            " named_struct('prev', acc.prev, 'run', acc.run + 1,"
            " 'top', acc.top, 'dup', acc.dup)"
            " ELSE named_struct('prev', x, 'run', 1,"
            f" 'top', greatest(acc.top, {cover}),"
            f" 'dup', acc.dup + {dup_add}) END,"
            f" acc -> named_struct('top', greatest(acc.top, {cover}),"
            f" 'dup', acc.dup + {dup_add}))"
        )

    cols = []
    keep = F.lit(True)
    for n, thr in REP_TOP_MAX.items():
        top = run_fold(n)["top"]
        # overlapping occurrences multi-count chars, so cap — both the top
        # and dup metrics are honest fractions in [0, 1]
        frac = F.when(
            F.col("token_chars") > 0,
            F.least(F.lit(1.0), top.cast("double") / tc),
        ).otherwise(F.lit(0.0))
        cols.append(frac.alias(f"top_{n}gram_frac"))
        keep = keep & (frac <= F.lit(thr))
    for n, thr in REP_DUP_MAX.items():
        dup_chars = run_fold(n)["dup"]
        frac = F.when(
            F.col("token_chars") > 0,
            F.least(F.lit(1.0), dup_chars.cast("double") / tc),
        ).otherwise(F.lit(0.0))
        cols.append(frac.alias(f"dup_{n}gram_frac"))
        keep = keep & (frac <= F.lit(thr))
    return base.select(
        F.col(id_col), "n_words", "token_chars", *cols, keep.alias("rep_keep")
    )


def html_to_text(col: str | Column) -> Column:
    """Boilerplate HTML → text extraction for crawl processing: drop
    script/style blocks and comments, strip remaining tags, decode the
    five standard XML entities, collapse whitespace. A pure
    ``regexp_replace`` chain — scan-local, zero shuffle, codegen'd.

    Patterns deliberately avoid backreferences (separate script/style
    patterns instead of ``<(script|style)>.*?</\\1>``) so RE2-based
    engines (the DuckDB oracle) run the identical regexes; entity
    decoding replaces ``&amp;`` LAST so ``&amp;lt;`` decodes to the
    literal ``&lt;`` as the HTML spec requires, not to ``<``."""
    t = F.col(col) if isinstance(col, str) else col
    t = F.regexp_replace(t, r"(?is)<script[^>]*>.*?</script>", " ")
    t = F.regexp_replace(t, r"(?is)<style[^>]*>.*?</style>", " ")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    t = F.regexp_replace(t, r"(?s)<[^>]*>", " ")
    for ent, ch in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&amp;", "&"),
    ):
        t = F.replace(t, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def unicode_normalize(
    docs: DataFrame,
    form: str = "NFC",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Unicode normalization for corpus canonicalization (NFC/NFKC/NFD/
    NFKD) — the step before fingerprint-based dedup on multilingual
    crawls, where 'é' as U+00E9 vs e+U+0301 would otherwise defeat exact
    dedup. Spark has no built-in normalizer, so this is one of the few
    places the engine deliberately enters Python: an Arrow-batched pandas
    UDF over ``unicodedata.normalize`` (vectorized str accessor; no
    row-at-a-time UDF). Returns (id, norm_text, changed, len_delta).

    Scale: scan-local, zero shuffle; Arrow batch transfer is the cost, so
    project (id, text) first and normalize before any shuffle-heavy
    downstream op (the dedup pipelines consume ``norm_text``).
    ``mapInPandas`` (not a scalar pandas UDF) keeps the whole package
    free of expression-level Python — the plan audit treats
    ArrowEvalPython as a hot-path smell, and the batch kernel is the
    same speed."""

    def kernel(batches):
        import unicodedata

        for pdf in batches:
            out = pdf.rename(columns={text_col: "_t"})[[id_col, "_t"]]
            out["norm_text"] = out["_t"].map(
                lambda t: unicodedata.normalize(form, t) if t is not None else None
            )
            yield out

    out = docs.select(id_col, text_col).mapInPandas(
        kernel, schema=f"{id_col} long, _t string, norm_text string"
    )
    return out.select(
        id_col,
        "norm_text",
        (F.col("norm_text") != F.col("_t")).alias("changed"),
        (F.length("norm_text") - F.length("_t")).cast("int").alias("len_delta"),
    )


def bigram_commonality(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-relative commonality score: for each document, the average
    corpus frequency of its word bigrams (multiplicity-weighted). High
    score = the document is built from corpus-common word transitions
    (boilerplate/templates); low = rare phrasing. The integer-sum /
    single-division formulation keeps the score bit-stable cross-engine —
    the usual n-gram LM log-prob variant is not, because libm log()
    differs in the last ulp across platforms.

    Scale: two hash aggregates (corpus bigram counts, per-doc rollup) and
    one join. The count side is bigram-cardinality (vocabulary²-bounded,
    zipf-concentrated), typically far smaller than the corpus — broadcast
    when it fits, shuffle-join otherwise; Spark's AQE decides from runtime
    stats. Returns (id, n_bigrams, total_freq, avg_bigram_freq)."""
    grams = docs.select(
        F.col(id_col).alias("id"),
        F.explode(word_bigrams(tokenize(text_col))).alias("bg"),
    )
    counts = grams.groupBy("bg").agg(F.count("*").cast("bigint").alias("corpus_freq"))
    return (
        grams.join(counts, "bg")
        .groupBy("id")
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            F.sum("corpus_freq").cast("bigint").alias("total_freq"),
        )
        .select(
            "*",
            (F.col("total_freq").cast("double") / F.col("n_bigrams").cast("double")).alias(
                "avg_bigram_freq"
            ),
        )
    )


def lang_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-lexicon language ID: count lexicon hits per language, pick
    the max with deterministic priority (en > es > fr > de), 'und' when no
    lexicon matches at all."""
    toks = tokenize(text_col)
    scored = docs.select(
        F.col(id_col),
        *[
            _stopword_count(toks, lex).alias(f"c_{lang}")
            for lang, lex in LANG_LEXICONS.items()
        ],
    )
    c = {lang: F.col(f"c_{lang}") for lang in LANG_LEXICONS}
    pred = (
        F.when(
            (c["en"] >= c["es"]) & (c["en"] >= c["fr"]) & (c["en"] >= c["de"]) & (c["en"] > 0),
            "en",
        )
        .when((c["es"] >= c["fr"]) & (c["es"] >= c["de"]) & (c["es"] > 0), "es")
        .when((c["fr"] >= c["de"]) & (c["fr"] > 0), "fr")
        .when(c["de"] > 0, "de")
        .otherwise("und")
    )
    return scored.select("*", pred.alias("lang_pred"))
