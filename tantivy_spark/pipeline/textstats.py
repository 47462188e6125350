"""Text analysis operators: token counting, quality scoring, language ID,
document fingerprinting.

Shape note: every operator here tokenizes ONCE via an exploded token
stream + one map-side-combining groupBy of plain (whole-stage-codegen'd)
conditional aggregates, then joins back to the narrow per-doc char stats.
The previous formulation referenced the token array 2-3x under
higher-order functions, which run interpreted and defeat common-
subexpression elimination — re-tokenizing every document 2-3x.  On a
100-TB corpus that per-document cost dominates; the explode/groupBy shape
keeps everything JVM-side and combines partials before the shuffle."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tantivy_spark import MAX_TOKEN_BYTES
from tantivy_spark.analyzer import JAVA_TOKEN_PATTERN, tokens_col

# tiny high-frequency stopword lists for the n-gram/stopword-ratio
# language heuristic (deterministic, oracle-expressible)
EN_STOP = ["the", "of", "and", "to", "a", "in", "is", "was", "for", "on",
           "that", "with", "as", "by", "at", "it"]
DE_STOP = ["der", "die", "das", "und", "ist", "von", "mit", "ein", "eine", "zu"]


def _token_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """One tokenization pass -> (id, n_tokens, tok_chars, en_hits, de_hits).

    explode_outer keeps zero-token docs; the analyzer tail (40-byte filter
    + lowercase) runs as plain row expressions inside the aggregate, so
    the whole stage is codegen'd and map-side combined."""
    raw = F.regexp_extract_all(F.coalesce(F.col(text_col), F.lit("")),
                               F.lit(JAVA_TOKEN_PATTERN), 0)
    rows = (df.select(F.col(id_col).alias("id"), F.explode_outer(raw).alias("rt"))
            .select("id",
                    (F.col("rt").isNotNull()
                     & (F.octet_length("rt") < MAX_TOKEN_BYTES)).alias("ok"),
                    F.length("rt").alias("len"),
                    F.lower("rt").alias("tok")))
    ok = F.col("ok")
    return rows.groupBy("id").agg(
        F.sum(F.when(ok, 1).otherwise(0)).alias("n_tokens"),
        F.sum(F.when(ok, F.col("len")).otherwise(0)).alias("tok_chars"),
        F.sum(F.when(ok & F.col("tok").isin(EN_STOP), 1).otherwise(0)).alias("en_hits"),
        F.sum(F.when(ok & F.col("tok").isin(DE_STOP), 1).otherwise(0)).alias("de_hits"),
    )


def token_counts(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, n_tokens, n_chars, avg_token_len_r) — whitespace-free analyzer
    token count plus simple length stats."""
    stats = _token_stats(df, text_col, id_col)
    chars = df.select(
        F.col(id_col).cast("bigint").alias("id"),
        F.length(F.coalesce(F.col(text_col), F.lit(""))).cast("bigint").alias("n_chars"))
    n = F.col("n_tokens")
    return chars.join(stats, "id").select(
        "id",
        n.cast("bigint").alias("n_tokens"),
        "n_chars",
        F.round(F.when(n > 0, F.col("tok_chars").cast("double") / n)
                .otherwise(0.0), 4).alias("avg_token_len_r"),
    )


def quality_scores(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, stopword_ratio_r, alnum_ratio_r, quality_r) — cheap
    web-corpus quality heuristics: stopword density (fluency proxy),
    alphanumeric character fraction (boilerplate/markup proxy), and a
    blended score."""
    stats = _token_stats(df, text_col, id_col)
    text = F.coalesce(F.col(text_col), F.lit(""))
    chars = df.select(
        F.col(id_col).cast("bigint").alias("id"),
        F.length(F.regexp_replace(text, r"[^\p{L}\p{N}]", "")).alias("alnum_chars"),
        F.length(text).alias("total_chars"))
    n = F.col("n_tokens")
    stop_ratio = F.when(n > 0, F.col("en_hits").cast("double") / n).otherwise(0.0)
    alnum_ratio = F.when(F.col("total_chars") > 0,
                         F.col("alnum_chars").cast("double")
                         / F.col("total_chars")).otherwise(0.0)
    quality = stop_ratio * F.lit(0.5) + alnum_ratio * F.lit(0.5)
    return chars.join(stats, "id").select(
        "id",
        F.round(stop_ratio, 4).alias("stopword_ratio_r"),
        F.round(alnum_ratio, 4).alias("alnum_ratio_r"),
        F.round(quality, 4).alias("quality_r"),
    )


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, lang_pred) — stopword-voting language heuristic.

    Deterministic rule: count hits against per-language stop lists;
    predict the argmax, 'unk' when no list reaches 2 hits."""
    stats = _token_stats(df, text_col, id_col)
    en_hits, de_hits = F.col("en_hits"), F.col("de_hits")
    pred = (
        F.when((en_hits >= 2) & (en_hits >= de_hits), F.lit("en"))
        .when(de_hits >= 2, F.lit("de"))
        .otherwise(F.lit("unk"))
    )
    return stats.select(F.col("id").cast("bigint").alias("id"),
                        pred.alias("lang_pred"))


#: BPE-style pretokenizer pattern (the GPT-2 family shape, minus the
#: trailing-whitespace lookahead so the same pattern runs under Java
#: regex AND RE2 for the oracle): contractions, space-prefixed letter /
#: digit / punctuation runs, whitespace runs.
BPE_PRETOKEN_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"
)


def bpe_pretoken_counts(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """(id, n_pretokens, n_ws_tokens) — BPE-ish pretokenizer match count
    (the standard LLM-pipeline proxy for 'how many tokens will this doc
    cost') plus the plain whitespace token count.  Pure codegen'd
    regexp_extract_all; no Python in the path."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    pre = F.regexp_extract_all(text, F.lit(BPE_PRETOKEN_PATTERN), 0)
    # non-whitespace pretokens only (whitespace runs match to keep the
    # scan linear, then drop out of the count)
    n_pre = F.size(F.filter(pre, lambda t: ~t.rlike(r"^\s+$")))
    ws = F.filter(F.split(text, r"\s+"), lambda t: F.length(t) > 0)
    return df.select(
        F.col(id_col).cast("bigint").alias("id"),
        n_pre.cast("bigint").alias("n_pretokens"),
        F.size(ws).cast("bigint").alias("n_ws_tokens"),
    )


def doc_fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, fp) — order-sensitive 64-bit content fingerprint: xxhash64 of
    the analyzer token stream joined by unit separator.  Equal fingerprints
    == equal token streams (used for near-exact dedup after normalization)."""
    toks = tokens_col(F.coalesce(F.col(text_col), F.lit("")))
    return df.select(
        F.col(id_col).cast("bigint").alias("id"),
        F.xxhash64(F.array_join(toks, "")).alias("fp"),
    )
