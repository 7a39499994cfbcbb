"""Text-analysis operators for document corpora [EXT].

All built-in-function expressions (JVM-side): token counting, quality
scoring, n-gram language-ID heuristic, rolling-hash fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STOPWORDS = (
    "the", "a", "an", "of", "to", "and", "in", "is", "it", "for",
    "on", "with", "as", "at", "by", "be", "or", "are", "was", "this",
)

# Tiny per-language marker lexicons for the n-gram/keyword language-ID
# heuristic (public-knowledge common words).
LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "is"),
    "es": ("el", "la", "de", "que", "los"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "les", "des", "est"),
    "zh": (),  # CJK detection is by script range, not keywords
}


def tokens(text_col: str = "text") -> F.Column:
    return F.split(F.trim(F.col(text_col)), r"\s+")


# BPE-style pre-tokenizer classes: letter runs, digit runs, and
# non-space symbol runs — the segmentation BPE vocabularies are trained
# over (public GPT-2-style pre-tokenization, simplified).
BPE_PRETOKEN_PATTERN = r"\p{L}+|\p{N}+|[^\s\p{L}\p{N}]+"


def subword_pretokens(text_col: str = "text") -> F.Column:
    """BPE-ish pre-token array (regexp_extract_all, codegen'd)."""
    return F.regexp_extract_all(F.col(text_col), F.lit(BPE_PRETOKEN_PATTERN), 0)


def token_count(text_col: str = "text") -> F.Column:
    return F.size(tokens(text_col))


def with_token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """n_tokens, n_chars_measured, avg token length, distinct-token ratio."""
    toks = tokens(text_col)
    n_tok = F.size(toks)
    return docs.withColumn("n_tokens", n_tok).withColumn(
        "n_distinct_tokens", F.size(F.array_distinct(toks))
    ).withColumn(
        "distinct_ratio",
        F.round(F.col("n_distinct_tokens") / F.col("n_tokens"), 6),
    )


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality features: length, token count, mean token length,
    stopword ratio, punctuation density. Used as filters in training-data
    pipelines (keep 50 < n_chars, stopword_ratio > 0.01, ...)."""
    toks = tokens(text_col)
    n_tok = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, F.lower(t))))
    n_chars = F.length(F.col(text_col))
    n_punct = n_chars - F.length(F.regexp_replace(F.col(text_col), r"[.,;:!?]", ""))
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars_measured"),
        n_tok.alias("n_tokens"),
        F.round(
            (n_chars - (n_tok - 1)) / F.when(n_tok == 0, F.lit(None)).otherwise(n_tok),
            6,
        ).alias("mean_token_len"),
        F.round(n_stop / F.when(n_tok == 0, F.lit(None)).otherwise(n_tok), 6).alias(
            "stopword_ratio"
        ),
        F.round(n_punct / F.when(n_chars == 0, F.lit(None)).otherwise(n_chars), 6).alias(
            "punct_ratio"
        ),
    )


# fasttext-style linear quality model: public-heuristic weights over
# cheap surface features (the shape of fastText's linear classifier /
# CCNet's quality scoring — a dot product, no model runtime needed).
# Positive logit = keep. Weights are part of the operator's contract so
# the oracle can reproduce the score exactly.
QUALITY_MODEL_BIAS = -2.0
QUALITY_MODEL_WEIGHTS = (
    ("log_len", 0.5),  # ln(1 + n_chars): longer docs score higher, saturating
    ("stopword_ratio", 6.0),  # natural prose has function words
    ("punct_ratio", -8.0),  # punctuation soup is boilerplate/code
    ("mean_token_len", -0.12),  # very long "words" = URLs, base64, code
    ("digit_ratio", -4.0),  # number dumps
    ("distinct_ratio", 1.5),  # repetition scores low
)


def quality_linear_logit(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Linear document-quality classifier scored entirely in JVM
    expressions: logit = bias + Σ wᵢ·featureᵢ over length/stopword/
    punctuation/word-shape/digit/repetition features, is_quality =
    logit > 0.

    Scale shape: one narrow codegen'd pass — no shuffle, no UDF, no
    model runtime; at 100 TB this runs at scan speed next to any other
    per-doc work. The logit is reported rounded at 1e-6 (both engines
    compute the identical double chain; rounding absorbs last-ulp ln
    divergence) and the keep decision thresholds the raw logit."""
    toks = tokens(text_col)
    n_tok = F.size(toks)
    n_tok_safe = F.when(n_tok == 0, F.lit(None)).otherwise(n_tok)
    n_chars = F.length(F.col(text_col))
    n_chars_safe = F.when(n_chars == 0, F.lit(None)).otherwise(n_chars)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, F.lower(t))))
    n_punct = n_chars - F.length(F.regexp_replace(F.col(text_col), r"[.,;:!?]", ""))
    n_digit = n_chars - F.length(F.regexp_replace(F.col(text_col), r"[0-9]", ""))
    feats = {
        "log_len": F.log(F.lit(1.0) + n_chars.cast("double")),
        "stopword_ratio": n_stop / n_tok_safe,
        "punct_ratio": n_punct / n_chars_safe,
        "mean_token_len": (n_chars - (n_tok - 1)) / n_tok_safe,
        "digit_ratio": n_digit / n_chars_safe,
        "distinct_ratio": F.size(F.array_distinct(toks)) / n_tok_safe,
    }
    logit = F.lit(QUALITY_MODEL_BIAS)
    for name, w in QUALITY_MODEL_WEIGHTS:
        logit = logit + F.lit(w) * feats[name]
    return docs.select(
        "doc_id",
        (F.round(logit * 1e6) / 1e6).alias("quality_logit"),
        (logit > 0).alias("is_quality"),
    )


def detect_language(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Keyword/script language-ID heuristic → lang_pred column.

    CJK by Unicode block; otherwise argmax of marker-word hit counts with
    'en' fallback. Pure built-ins: array_contains over the token array.
    """
    toks = F.transform(tokens(text_col), F.lower)

    def _is_marker(marker_arr):
        return lambda t: F.array_contains(marker_arr, t)

    scores = []
    for lang, markers in LANG_MARKERS.items():
        if not markers:
            continue
        marker_arr = F.array(*[F.lit(m) for m in markers])
        scores.append(
            F.struct(
                F.size(F.filter(toks, _is_marker(marker_arr))).alias("score"),
                F.lit(lang).alias("lang"),
            )
        )
    best = F.array_max(F.array(*scores))
    has_cjk = F.col(text_col).rlike(r"[一-鿿]")
    pred = (
        F.when(has_cjk, F.lit("zh"))
        .when(best["score"] > 0, best["lang"])
        .otherwise(F.lit("en"))
    )
    return docs.withColumn("lang_pred", pred)


def rolling_hash_fingerprint(
    docs: DataFrame, text_col: str = "text", window: int = 8, keep_every: int = 4
) -> DataFrame:
    """Winnowing-style document fingerprint: rolling window of ``window``
    tokens hashed with xxhash64; keep hashes ≡ 0 (mod keep_every) as the
    sketch. Deterministic, shuffle-free (per-row array expression)."""
    from etl_pipeline_orchestration_spark.operators.partitioning import (
        ensure_min_partitions,
    )

    docs = ensure_min_partitions(docs)
    toks = tokens(text_col)
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - window, F.lit(0)))
    grams = F.transform(idx, lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i + 1, window))))
    sketch = F.array_sort(
        F.array_distinct(F.filter(grams, lambda h: F.pmod(h, F.lit(keep_every)) == 0))
    )
    return docs.select("doc_id", sketch.alias("fingerprint"))


def _norm_words(text_col: str = "text") -> F.Column:
    """Whitespace-normalized lowercase word array (matches DuckDB
    ``string_split(regexp_replace(lower(trim(x)), '\\s+', ' ', 'g'), ' ')``)."""
    return F.split(
        F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "), " "
    )


def repetition_scores(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition quality signals per document: duplicate
    word fraction and most-frequent-word mass.

    Single pipeline, no self-join: explode words → partial-aggregated
    count per (doc, word) → per-doc aggregate deriving ALL stats from
    the word-count relation (n_words = Σc, n_distinct = #groups,
    top_word_count = max c). Two shuffles on uniformly distributed keys;
    nothing is quadratic in document length. Fractions are raw IEEE
    divisions (exactly rounded, bit-identical across engines — no
    rounding step needed).
    """
    wc = (
        docs.select(F.col(id_col), F.explode(_norm_words(text_col)).alias("word"))
        .groupBy(id_col, "word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return wc.groupBy(id_col).agg(
        F.sum("c").alias("n_words"),
        F.count(F.lit(1)).alias("n_distinct_words"),
        (1.0 - F.count(F.lit(1)).cast("double") / F.sum("c")).alias("dup_word_frac"),
        (F.max("c").cast("double") / F.sum("c")).alias("top_word_frac"),
    )


def ngram_overlap_contamination(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    benchmark_mod: int = 97,
) -> DataFrame:
    """Benchmark decontamination: documents sharing a word k-gram with
    the benchmark set (here: doc_id ≡ 0 mod ``benchmark_mod``, standing
    in for an eval-suite corpus) and how many distinct k-grams overlap.

    Scale shape: the benchmark side is tiny by construction (eval suites
    are MBs; the corpus is TBs), so its distinct-gram set is BROADCAST —
    the 100 TB probe side is never shuffled, just filtered by a broadcast
    hash join after exploding its per-doc distinct grams. Per-doc
    ``array_distinct`` caps explode output at the gram count, and the
    final count aggregates map-side. At larger benchmark sizes, swap the
    gram string for xxhash64(gram) to shuffle 8-byte keys.
    """
    from etl_pipeline_orchestration_spark.operators.partitioning import (
        ensure_min_partitions,
    )

    toks = _norm_words(text_col)
    n = F.size(toks)
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
        )
    )
    # gram shingling is CPU-bound; single-file parquet at small SF gives
    # 1-3 input splits, so spread the scan first (no-op at real scale)
    with_grams = ensure_min_partitions(docs).filter(n >= k).select(
        F.col(id_col), F.explode(grams).alias("gram")
    )
    is_bench = (F.col(id_col) % benchmark_mod) == 0
    bench = with_grams.filter(is_bench).select("gram").distinct()
    probe = with_grams.filter(~is_bench)
    return (
        probe.join(F.broadcast(bench), "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
