"""Text analysis operators: token counting, quality scoring, language ID,
document fingerprinting.  All JVM expressions (codegen, no Python)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tantivy_spark.analyzer import tokens_col

# tiny high-frequency stopword lists for the n-gram/stopword-ratio
# language heuristic (deterministic, oracle-expressible)
EN_STOP = ["the", "of", "and", "to", "a", "in", "is", "was", "for", "on",
           "that", "with", "as", "by", "at", "it"]
DE_STOP = ["der", "die", "das", "und", "ist", "von", "mit", "ein", "eine", "zu"]


def token_counts(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, n_tokens, n_chars, avg_token_len_r) — whitespace-free analyzer
    token count plus simple length stats."""
    toks = tokens_col(F.coalesce(F.col(text_col), F.lit("")))
    tok_chars = F.aggregate(toks, F.lit(0).cast("long"),
                            lambda acc, t: acc + F.length(t))
    n = F.size(toks)
    return df.select(
        F.col(id_col).cast("bigint").alias("id"),
        n.cast("bigint").alias("n_tokens"),
        F.length(F.coalesce(F.col(text_col), F.lit(""))).cast("bigint").alias("n_chars"),
        F.round(F.when(n > 0, tok_chars.cast("double") / n).otherwise(0.0), 4)
        .alias("avg_token_len_r"),
    )


def quality_scores(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, stopword_ratio_r, alnum_ratio_r, quality_r) — cheap
    web-corpus quality heuristics: stopword density (fluency proxy),
    alphanumeric character fraction (boilerplate/markup proxy), and a
    blended score."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    toks = tokens_col(text)
    n = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in EN_STOP])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    alnum_chars = F.length(F.regexp_replace(text, r"[^\p{L}\p{N}]", ""))
    total_chars = F.length(text)
    stop_ratio = F.when(n > 0, n_stop.cast("double") / n).otherwise(0.0)
    alnum_ratio = F.when(total_chars > 0,
                         alnum_chars.cast("double") / total_chars).otherwise(0.0)
    quality = stop_ratio * F.lit(0.5) + alnum_ratio * F.lit(0.5)
    return df.select(
        F.col(id_col).cast("bigint").alias("id"),
        F.round(stop_ratio, 4).alias("stopword_ratio_r"),
        F.round(alnum_ratio, 4).alias("alnum_ratio_r"),
        F.round(quality, 4).alias("quality_r"),
    )


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, lang_pred) — stopword-voting language heuristic.

    Deterministic rule: count hits against per-language stop lists;
    predict the argmax, 'unk' when no list reaches 2 hits."""
    toks = tokens_col(F.coalesce(F.col(text_col), F.lit("")))
    en_arr = F.array(*[F.lit(s) for s in EN_STOP])
    de_arr = F.array(*[F.lit(s) for s in DE_STOP])
    en_hits = F.size(F.filter(toks, lambda t: F.array_contains(en_arr, t)))
    de_hits = F.size(F.filter(toks, lambda t: F.array_contains(de_arr, t)))
    pred = (
        F.when((en_hits >= 2) & (en_hits >= de_hits), F.lit("en"))
        .when(de_hits >= 2, F.lit("de"))
        .otherwise(F.lit("unk"))
    )
    return df.select(F.col(id_col).cast("bigint").alias("id"), pred.alias("lang_pred"))


def doc_fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, fp) — order-sensitive 64-bit content fingerprint: xxhash64 of
    the analyzer token stream joined by unit separator.  Equal fingerprints
    == equal token streams (used for near-exact dedup after normalization)."""
    toks = tokens_col(F.coalesce(F.col(text_col), F.lit("")))
    return df.select(
        F.col(id_col).cast("bigint").alias("id"),
        F.xxhash64(F.array_join(toks, "")).alias("fp"),
    )
