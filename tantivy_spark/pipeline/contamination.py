"""Benchmark decontamination and repetition statistics — the two
remaining data-hygiene passes a training corpus goes through after
dedup: drop documents that leak evaluation data (n-gram overlap with a
benchmark set) and score degenerate repetition (the Gopher-style
duplicate-n-gram filters).

Scale shape:

* ``decontaminate`` — the benchmark side (test sets: thousands to a few
  million n-grams) is aggregated to a DISTINCT n-gram table and
  broadcast; the corpus side explodes to (doc, n-gram) and the match is
  a map-side broadcast-hash semi-join + one groupBy(doc).  No
  all-pairs anything; corpus cost is one pass.  At extreme benchmark
  sizes swap the broadcast for a shuffled join — the code path is the
  same join expression, Spark's AQE picks the strategy once the
  broadcast threshold is crossed.
* ``repetition_stats`` — pure per-document column expressions over one
  token split (duplicate-n-gram fractions) plus one explode+groupBy for
  the top-token fraction; everything JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _ngrams(tokens, n: int):
    """Column expression: array of space-joined token n-grams (empty
    when the document has fewer than ``n`` tokens — the guard matters:
    ``sequence(0, size-n)`` runs DESCENDING for a negative stop and
    would feed ``slice`` a zero start, which raises)."""
    return F.when(
        F.size(tokens) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(tokens) - n),
            lambda i: F.array_join(F.slice(tokens, i + 1, n), " "))
    ).otherwise(F.array().cast("array<string>"))


def _tokens(text_col: str):
    return F.split(F.lower(F.col(text_col)), r"\s+")


def decontaminate(docs: DataFrame, benchmark: DataFrame, n: int = 13,
                  text_col: str = "text", id_col: str = "doc_id",
                  ) -> DataFrame:
    """Flag training documents sharing any whitespace-token ``n``-gram
    with ``benchmark`` (the GPT-3-style 13-gram decontamination pass).

    Returns ``(id_col, n_hits)`` for CONTAMINATED documents only —
    ``n_hits`` counts the document's n-gram occurrences (with
    multiplicity) that appear in the benchmark set.  Join key is the
    n-gram string; the benchmark side is distinct + broadcast.
    """
    toks = _tokens(text_col)
    doc_grams = (docs
                 .filter(F.size(toks) >= n)
                 .select(F.col(id_col),
                         F.explode(_ngrams(toks, n)).alias("g")))
    bench_grams = (benchmark
                   .filter(F.size(_tokens(text_col)) >= n)
                   .select(F.explode(_ngrams(_tokens(text_col), n))
                           .alias("g"))
                   .distinct())
    return (doc_grams
            .join(F.broadcast(bench_grams), "g", "left_semi")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_hits")))


def repetition_stats(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Per-document repetition scores (Gopher rule family):

    * ``dup_2gram_frac`` / ``dup_3gram_frac`` — fraction of n-gram
      OCCURRENCES that are duplicates of an earlier occurrence
      (``1 - distinct/total``; 0.0 when fewer than n tokens),
    * ``top_token_frac`` — the most frequent token's share of all
      tokens (degenerate "word word word ..." detector),
    * ``n_tokens`` — denominator for thresholding.
    """
    toks = _tokens(text_col)
    base = docs.select(F.col(id_col), toks.alias("t"))

    # materialize each gram array as a REAL column before referencing
    # it twice: higher-order functions run interpreted and are not
    # common-subexpression-eliminated, so size(g)/size(distinct(g))
    # over an inline _ngrams() would tokenize every document twice
    grams = base.select(
        id_col, "t",
        _ngrams(F.col("t"), 2).alias("g2"),
        _ngrams(F.col("t"), 3).alias("g3"))

    def dup_frac(g: str):
        tot = F.size(F.col(g))
        return (F.when(tot <= 0, F.lit(0.0))
                .otherwise(1.0 - F.size(F.array_distinct(F.col(g)))
                           / tot.cast("double")))

    narrow = grams.select(
        id_col,
        F.size("t").cast("bigint").alias("n_tokens"),
        dup_frac("g2").alias("dup_2gram_frac"),
        dup_frac("g3").alias("dup_3gram_frac"))
    top = (base.select(id_col, F.explode("t").alias("w"))
           .groupBy(id_col, "w").agg(F.count(F.lit(1)).alias("c"))
           .groupBy(id_col).agg(F.max("c").alias("top_c")))
    return (narrow.join(top, id_col, "left")
            .select(id_col, "n_tokens", "dup_2gram_frac",
                    "dup_3gram_frac",
                    F.when(F.col("n_tokens") <= 0, F.lit(0.0))
                    .otherwise(F.coalesce(F.col("top_c"), F.lit(0))
                               / F.col("n_tokens").cast("double"))
                    .alias("top_token_frac")))
