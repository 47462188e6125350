"""Similarity search over embedding columns.

Brute-force cosine top-k is the exact baseline (one scan, JVM-side
zip_with/aggregate dot products, TakeOrderedAndProject top-k).  The scale
path for repeated queries is LSH bucketing (random-hyperplane signatures
via :func:`tantivy_spark.pipeline.dedup.simhash64`-style bit votes) or an
IVF coarse quantizer; the baseline here is the correctness oracle for
those.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, v: acc + v))


def hyperplane_lsh_buckets(df: DataFrame, dim: int, n_bits: int = 16,
                           seed: int = 13, id_col: str = "vec_id",
                           vec_col: str = "embedding") -> DataFrame:
    """(id, bucket) — random-hyperplane LSH signature as a bucket id.

    Hyperplanes are a deterministic seeded numpy draw shipped (tiny:
    n_bits x dim f64) into ONE Arrow-batched pandas UDF that computes all
    bits as a single matmul per batch.  (Baking dim x n_bits literal
    arrays into the plan bloats it by thousands of nodes and evaluates an
    interpreted fold per bit per row; the matmul form is both the fast
    and the scalable shape.)  Buckets are reproducible at any parallelism.
    Scale path for repeated ANN queries: bucket once (one narrow table),
    then each query touches only its own bucket (+ optional multiprobe
    neighbors) — candidate sets of ~n/2^bits instead of full scans.
    """
    from pyspark.sql.functions import pandas_udf

    rng = np.random.default_rng(seed)
    planes_t = rng.standard_normal((n_bits, dim)).T.copy()  # (dim, n_bits)
    weights = (1 << np.arange(n_bits, dtype=np.uint64))

    @pandas_udf("long")
    def _bucket(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int64")
        m = np.array(vecs.tolist(), dtype=np.float64)  # (batch, dim)
        bits = (m @ planes_t) > 0                      # (batch, n_bits)
        out = (bits.astype(np.uint64) * weights).sum(axis=1)
        return pd.Series(out.astype(np.int64))

    return df.select(F.col(id_col).alias("id"),
                     _bucket(F.col(vec_col)).alias("bucket"))


def cosine_pairs_udf():
    """Arrow-batched exact cosine between two vector columns — the
    verification kernel for LSH-bucketed candidate pairs (numpy batch
    math instead of per-row interpreted array folds)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _cos(a: pd.Series, b: pd.Series) -> pd.Series:
        if len(a) == 0:
            return pd.Series([], dtype="float64")
        ma = np.array(a.tolist(), dtype=np.float64)
        mb = np.array(b.tolist(), dtype=np.float64)
        num = (ma * mb).sum(axis=1)
        den = np.sqrt((ma * ma).sum(axis=1)) * np.sqrt((mb * mb).sum(axis=1))
        return pd.Series(np.where(den > 0, num / den, 0.0))

    return _cos


def lsh_cosine_topk(df: DataFrame, query_vec: list[float], k: int = 10,
                    n_bits: int = 6, n_tables: int = 4, seed: int = 13,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    exclude_id: int | None = None,
                    multiprobe_bits: int = 1) -> DataFrame:
    """Approximate cosine top-k: OR-amplified multi-table hyperplane LSH.

    Each of ``n_tables`` independent tables hashes vectors to ``n_bits``
    buckets; candidates are the union over tables of the query's bucket
    plus all buckets within ``multiprobe_bits`` Hamming distance, then the
    exact scorer ranks the candidate set.  Recall per true neighbour at
    angular similarity p is 1-(1-p^b)^L — tune (b, L) to the corpus; more
    tables buy recall, more bits buy selectivity.
    """
    import numpy as np

    q = np.asarray(query_vec, dtype=np.float64)
    cand_ids = None
    for t in range(n_tables):
        tseed = seed + 7919 * t
        rng = np.random.default_rng(tseed)
        planes = rng.standard_normal((n_bits, len(q)))
        qb = 0
        for j in range(n_bits):
            if float(planes[j] @ q) > 0:
                qb |= 1 << j
        probes = {qb}
        if multiprobe_bits >= 1:
            probes |= {qb ^ (1 << j) for j in range(n_bits)}
        buckets = hyperplane_lsh_buckets(df, len(q), n_bits, tseed, id_col, vec_col)
        ids = buckets.filter(F.col("bucket").isin(list(probes))).select("id")
        cand_ids = ids if cand_ids is None else cand_ids.unionByName(ids)
    cand_ids = cand_ids.distinct()
    cand = df.join(cand_ids, df[id_col] == cand_ids["id"], "left_semi")
    return brute_force_cosine_topk(cand, query_vec, k=k, id_col=id_col,
                                   vec_col=vec_col, exclude_id=exclude_id)


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
