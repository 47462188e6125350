"""Similarity search over embedding columns.

Brute-force cosine top-k is the exact baseline (one scan, JVM-side
zip_with/aggregate dot products, TakeOrderedAndProject top-k).  The scale
path for repeated queries is LSH bucketing (random-hyperplane signatures
via :func:`tantivy_spark.pipeline.dedup.simhash64`-style bit votes) or an
IVF coarse quantizer; the baseline here is the correctness oracle for
those.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, v: acc + v))


def brute_force_cosine_topk(df: DataFrame, query_vec: list[float], k: int = 10,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            exclude_id: int | None = None) -> DataFrame:
    """Exact cosine top-k: (rank, id, cos_r).

    The query vector is baked as a literal array (broadcast-free);
    ordering is (round(cos,4) desc, id asc) so ranks are reproducible
    across engines despite float summation order.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    out = df.select(F.col(id_col).alias("id"), vec.alias("v"))
    if exclude_id is not None:
        out = out.filter(F.col("id") != exclude_id)
    cos = _dot(F.col("v"), q) / (_norm(F.col("v")) * _norm(q))
    scored = out.select("id", F.round(cos, 4).alias("cos_r"))
    ranked = scored.orderBy(F.desc("cos_r"), F.asc("id")).limit(k)
    from pyspark.sql import Window
    w = Window.orderBy(F.desc("cos_r"), F.asc("id"))
    return (ranked.withColumn("rank", F.row_number().over(w).cast("bigint"))
            .select("rank", F.col("id").cast("bigint").alias("id"), "cos_r"))
