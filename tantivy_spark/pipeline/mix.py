"""Training-mix construction operators: canonical-document selection
after near-dup clustering, and deterministic token-budget sampling per
stratum — the two steps that turn a deduplicated corpus into an actual
training mixture.

Both are pure DataFrame window/aggregate compositions (no UDFs), so
they stay JVM-side, shuffle once on their natural key, and scale to the
100-TB tier: canonical selection is one window per cluster; budget
sampling is one window per stratum plus a cumulative-sum cutoff, never
a driver-side loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def select_canonical(docs: DataFrame, clusters: DataFrame,
                     id_col: str = "doc_id",
                     quality_col: str | None = None) -> DataFrame:
    """Keep ONE representative per duplicate cluster (the standard
    "keep best, drop the rest" dedup decision that follows
    :func:`tantivy_spark.pipeline.dedup.dup_clusters`).

    ``clusters`` is (doc_id, cluster_id) — docs absent from it are
    singletons and always kept.  The canonical member of a cluster is
    the highest ``quality_col`` (ties and the no-quality case break by
    SMALLEST doc id, so selection is deterministic).

    Returns ``docs`` filtered to canonical members only, with a
    ``dup_cluster_size`` column (1 for singletons) — downstream mixes
    often upweight by it.

    One shuffle: a window over cluster_id.  The docs-side join is a
    LEFT join against the (small relative to corpus) cluster table.
    """
    c = clusters.select(F.col(id_col), F.col("cluster_id"))
    joined = docs.join(c, id_col, "left")
    eff = F.coalesce(F.col("cluster_id"), F.col(id_col).cast("long"))
    joined = joined.withColumn("__cl", eff)
    order = ([F.col(quality_col).desc()] if quality_col else []) + \
        [F.col(id_col).asc()]
    w = Window.partitionBy("__cl").orderBy(*order)
    wsz = Window.partitionBy("__cl")
    return (joined
            .withColumn("__rk", F.row_number().over(w))
            .withColumn("dup_cluster_size",
                        F.count("*").over(wsz).cast("bigint"))
            .filter(F.col("__rk") == 1)
            .drop("__rk", "__cl", "cluster_id"))


def sample_token_budget(docs: DataFrame, budgets: dict[str, int],
                        stratum_col: str = "lang",
                        tokens_col: str = "n_tokens",
                        id_col: str = "doc_id",
                        seed: int = 0) -> DataFrame:
    """Deterministic TOKEN-BUDGET sampling per stratum — build a
    training mixture like "2B tokens of en, 500M of de, ..." from a
    larger corpus.

    Every doc gets a pseudo-random, SEED-DETERMINISTIC rank inside its
    stratum (``xxhash64(id, seed)`` — no Spark ``rand()``, so the
    sample is reproducible across runs, executors, and retries); docs
    are taken in rank order until the stratum's token budget is
    reached.  The first doc that CROSSES the budget is still included
    (so a budget smaller than the smallest doc still yields one doc,
    and the union always covers >= the requested tokens when the
    stratum has them).

    Strata absent from ``budgets`` are dropped.  One shuffle (the
    per-stratum window); the cumulative sum is a running window over
    the hash order, never a collect.
    """
    if not budgets:
        raise ValueError("budgets must name at least one stratum")
    b_map = F.create_map(
        *[x for k, v in budgets.items()
          for x in (F.lit(k), F.lit(int(v)))])
    rnd = F.xxhash64(F.col(id_col).cast("string"), F.lit(seed))
    w = (Window.partitionBy(stratum_col)
         .orderBy(rnd.asc(), F.col(id_col).asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (docs
            .filter(F.col(stratum_col).isin(list(budgets)))
            .withColumn("__budget", b_map[F.col(stratum_col)])
            .withColumn("__cum", F.sum(F.col(tokens_col)).over(w))
            .filter(F.col("__cum") - F.col(tokens_col)
                    < F.col("__budget"))
            .drop("__budget", "__cum"))


def temperature_mix_weights(docs: DataFrame, stratum_col: str = "lang",
                            tokens_col: str = "n_tokens",
                            temperature: float = 2.0) -> DataFrame:
    """Temperature-scaled mixture weights per stratum — the multilingual
    / multi-domain sampling rule (T5 / mT5 style): a stratum with
    ``n_d`` tokens gets sampling probability

        p_d = n_d^(1/T) / sum_d' n_d'^(1/T)

    ``T=1`` is proportional sampling, ``T -> inf`` approaches uniform —
    the standard knob for upweighting low-resource strata without
    letting them dominate.

    Returns ``(stratum, n_tokens BIGINT, weight DOUBLE)`` sorted by
    stratum.  Combine with :func:`sample_token_budget` by turning
    ``weight * total_budget`` into per-stratum budgets.

    Scale shape: ONE partial-aggregated groupBy over the corpus (the
    per-stratum token sums), then the normalization is a cross-stratum
    window over the tiny stratum table — no collect, no second pass
    over the data.
    """
    if temperature <= 0:
        raise ValueError("temperature must be > 0")
    sums = (docs.groupBy(F.col(stratum_col).alias("stratum"))
            .agg(F.sum(tokens_col).cast("bigint").alias("n_tokens")))
    scaled = F.pow(F.col("n_tokens").cast("double"),
                   F.lit(1.0 / float(temperature)))
    w_all = Window.partitionBy()
    return (sums
            .withColumn("weight",
                        scaled / F.sum(scaled).over(w_all))
            .orderBy("stratum"))
