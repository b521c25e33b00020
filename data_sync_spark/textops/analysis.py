"""Text analysis: language ID, quality scoring, token counting, document
fingerprinting. All pure Catalyst expressions (codegen, no UDF), designed so
a DuckDB oracle can reproduce values exactly."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Tiny stopword lexicons per language for the n-gram/stopword-ratio
# heuristic language identifier (public knowledge lists).
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "est"],
    "es": ["el", "la", "los", "que", "de", "una", "es", "por"],
}


def _count_token(text_col: str, token: str):
    """Occurrences of a whole word in the text via length arithmetic —
    portable across Spark/DuckDB (same non-overlapping replace semantics).
    Replacing ' tok ' with ' ' keeps the shared space so adjacent
    occurrences ('the the') are both counted."""
    padded = F.concat(F.lit(" "), F.col(text_col), F.lit(" "))
    needle = f" {token} "
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit(" "))))
        / (len(needle) - 1)
    ).cast("long")


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic language ID: the language whose stopword lexicon matches
    the most words wins (ties broken by language name order). No UDF —
    a greatest/when cascade over per-language counts."""
    out = df
    for lang, words in LANG_STOPWORDS.items():
        score = None
        for w in words:
            c = _count_token(text_col, w)
            score = c if score is None else score + c
        out = out.withColumn(f"_s_{lang}", score)
    langs = sorted(LANG_STOPWORDS)
    best = F.greatest(*[F.col(f"_s_{lang}") for lang in langs])
    pred = None
    for lang in langs:
        cond = F.col(f"_s_{lang}") == best
        pred = F.when(cond, F.lit(lang)) if pred is None else pred.when(cond, F.lit(lang))
    return out.select(
        id_col,
        *[F.col(f"_s_{lang}").alias(f"score_{lang}") for lang in langs],
        pred.alias("predicted_lang"),
    )


def token_counts(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish regex token estimate
    (words and individual punctuation marks count separately)."""
    ws = (
        F.length(F.col(text_col))
        - F.length(F.replace(F.col(text_col), F.lit(" "), F.lit("")))
        + 1
    ).cast("long")
    bpe_ish = F.expr(
        f"CAST(size(regexp_extract_all({text_col}, '[a-zA-Z0-9]+|[^a-zA-Z0-9\\\\s]', 0)) AS BIGINT)"
    )
    return df.select(
        id_col,
        ws.alias("n_ws_tokens"),
        bpe_ish.alias("n_regex_tokens"),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
    )


def quality_scores(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Quality signals: length, word stats, stopword ratio, punctuation
    ratio, repetition (distinct-word ratio)."""
    words = F.split(F.col(text_col), " ")
    n_words = F.size(words).cast("long")
    stop = None
    for w in LANG_STOPWORDS["en"]:
        c = _count_token(text_col, w)
        stop = c if stop is None else stop + c
    punct = F.expr(
        f"CAST(size(regexp_extract_all({text_col}, '[^a-zA-Z0-9 ]', 0)) AS BIGINT)"
    )
    return df.select(
        id_col,
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
        n_words.alias("n_words"),
        F.round(F.size(F.array_distinct(words)) / n_words, 4).cast("double").alias(
            "distinct_word_ratio"
        ),
        F.round(stop / n_words, 4).cast("double").alias("stopword_ratio"),
        F.round(punct / F.length(F.col(text_col)), 4).cast("double").alias("punct_ratio"),
    )


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    algorithm): hash every word k-gram, slide a window of ``w`` hashes, keep
    each window's minimum — the selected fingerprint set is guaranteed to
    share members for any sufficiently long common substring, giving
    position-robust chunk-level near-dup detection.

    Pure higher-order array expressions per row (no explode of the corpus):
    k-gram hashes via transform over positions, window minima via
    transform+slice+array_min, then distinct + sort. Output:
    ``(id, fingerprints array<bigint>)``."""
    words = f"split({text_col}, ' ')"
    n_words = f"size({words})"
    gram = (
        f"transform(sequence(1, greatest({n_words} - {k - 1}, 1)), "
        f"i -> CAST(conv(substr(md5(array_join(slice({words}, i, {k}), ' ')), 1, 8), 16, 10) AS BIGINT))"
    )
    wins = (
        f"transform(sequence(1, greatest(size(_grams) - {w - 1}, 1)), "
        f"i -> array_min(slice(_grams, i, {w})))"
    )
    return (
        df.withColumn("_grams", F.expr(gram))
        .withColumn("fingerprints", F.array_sort(F.array_distinct(F.expr(wins))))
        .select(id_col, "fingerprints")
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Content fingerprints: full-document md5 plus a word-level polynomial
    rolling hash (order-sensitive, whitespace-normalization-insensitive) —
    the building block for winnowing-style chunk fingerprints."""
    poly = F.expr(
        "aggregate(split({t}, ' '), 0L, (acc, w) -> "
        "pmod(acc * 31 + {h}, 1000000007))".format(
            t=text_col, h="CAST(conv(substr(md5(w), 1, 8), 16, 10) AS BIGINT)"
        )
    )
    return df.select(
        id_col,
        F.md5(F.col(text_col)).alias("md5"),
        poly.alias("poly_fingerprint"),
    )
