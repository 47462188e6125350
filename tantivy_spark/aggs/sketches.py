"""Mergeable aggregation sketches across queries and batches.

Reference: the aggregation tree computes per-segment PARTIAL results
that merge upward (``IntermediateAggregationResults``,
src/aggregation/mod.rs:119-128); cardinality uses a DataSketches HLL
sketch per segment merged at collection (metric/cardinality.rs).

Spark provides the same property twice over:

- WITHIN a query, every sketch aggregate (``approx_count_distinct``,
  ``percentile_approx``, ``hll_sketch_agg``) is executed as partial
  per-partition sketches merged by the final aggregation — that is what
  makes the estimates partition-count-invariant (tested).
- ACROSS queries/batches, this module persists the partial sketches
  themselves: ``hll_sketch_agg`` produces a BINARY DataSketches HLL
  sketch (the same sketch family the reference uses), rows of which can
  be stored next to an index batch and later combined with
  ``hll_union_agg`` — re-estimating a growing index touches only the
  tiny sketch table, never the data again.  This is the exact
  incremental-aggregation story of mod.rs:119-128.

Percentiles: Spark's KLL-family ``percentile_approx`` does not expose
its serialized sketch, so the repo carries its own mergeable t-digest
(functions/tdigest.py, the published Dunning-Ertl merging variant):
``percentile_partials`` builds per-partition partial digests map-side
(no raw-value shuffle), ``merge_percentile_sketches`` unions the
few-hundred-byte blobs, and the aggregation tree accepts
``{"percentiles": {..., "sketch": true}}`` for the same digest inline.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cardinality_sketch(df: DataFrame, field: str, *group_keys: str,
                       lg_k: int = 12) -> DataFrame:
    """Partial cardinality sketch(es): one binary DataSketches HLL
    sketch per group (or one row ungrouped).  Persist the output next
    to an index batch; estimates merge later via
    :func:`merge_cardinality` without rescanning the data."""
    agg = F.hll_sketch_agg(F.col(field), lg_k).alias("sketch")
    if group_keys:
        return df.groupBy(*group_keys).agg(agg)
    return df.agg(agg)


def merge_cardinality(sketches: DataFrame, *group_keys: str) -> DataFrame:
    """Union partial sketches (rows of ``sketch`` binary columns,
    e.g. one per ingested batch) and estimate: the distributed
    equivalent of merging IntermediateAggregationResults."""
    agg = F.hll_sketch_estimate(
        F.hll_union_agg(F.col("sketch"))).alias("estimate")
    if group_keys:
        return sketches.groupBy(*group_keys).agg(agg)
    return sketches.agg(agg)


def hll_estimate(col: Column, lg_k: int = 12) -> Column:
    """One-shot DataSketches-HLL cardinality estimate column — the
    reference's cardinality agg algorithm family, usable in the
    aggregation tree via {"cardinality": {..., "sketch": true}}."""
    return F.hll_sketch_estimate(F.hll_sketch_agg(col, lg_k))


# ---------------------------------------------------------------------------
# Percentiles: mergeable t-digest (functions/tdigest.py)
# ---------------------------------------------------------------------------

def percentile_partials(df: DataFrame, field: str, *group_keys: str,
                        delta: float = 200.0) -> DataFrame:
    """Per-PARTITION per-group partial t-digests — the map-side combine
    shape (one ~1.6KB blob per (partition, group), raw values never
    shuffle).  Persist rows next to an index batch; merge later with
    :func:`merge_percentile_sketches`."""
    from pyspark.sql.types import (BinaryType, StructField, StructType)

    fields = [df.schema[k] for k in group_keys]
    out_schema = StructType(list(fields) + [StructField("sketch",
                                                        BinaryType())])
    cols = list(group_keys) + [field]

    def gen(batches):
        import pandas as pd

        from tantivy_spark.functions import tdigest as td
        for pdf in batches:
            if group_keys:
                grouped = pdf.groupby(list(group_keys), dropna=False)
                rows = [tuple(k if isinstance(k, tuple) else (k,))
                        + (td.build(g[field].to_numpy(), delta),)
                        for k, g in grouped]
            else:
                rows = [(td.build(pdf[field].to_numpy(), delta),)]
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              out_schema.fields])

    return df.select(*cols).mapInPandas(gen, out_schema)


def merge_percentile_sketches(sketches: DataFrame,
                              *group_keys: str) -> DataFrame:
    """Merge partial digest rows (column ``sketch``) into ONE digest per
    group — concatenate centroids + re-compress, associative like the
    reference's IntermediateAggregationResults merge."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def _merge(blobs: pd.Series) -> bytes:
        from tantivy_spark.functions import tdigest as td
        return td.merge(blobs.dropna().tolist())

    agg = _merge(F.col("sketch")).alias("sketch")
    if group_keys:
        return sketches.groupBy(*group_keys).agg(agg)
    return sketches.agg(agg)


def percentile_estimate(sketches: DataFrame, percents: list[float],
                        *group_keys: str) -> DataFrame:
    """Quantile estimates from merged digests: one ``array<double>``
    column ``values`` ordered like ``percents`` (0-100 scale)."""
    from pyspark.sql.functions import pandas_udf

    qs = [float(p) / 100.0 for p in percents]

    @pandas_udf("array<double>")
    def _q(blobs: pd.Series) -> pd.Series:
        from tantivy_spark.functions import tdigest as td
        return blobs.map(lambda b: [] if b is None
                         else [float(x) for x in td.quantile(b, qs)])

    return sketches.select(*group_keys, _q(F.col("sketch")).alias("values"))


def tdigest_quantiles(col: Column, percents: list[float],
                      delta: float = 200.0) -> Column:
    """Grouped-agg t-digest quantile column for the aggregation tree
    ({"percentiles": {..., "sketch": true}}): returns array<double>
    ordered like ``percents`` — numerically the same digest family as
    the persisted cross-batch path."""
    from pyspark.sql.functions import pandas_udf

    qs = [float(p) / 100.0 for p in percents]

    @pandas_udf("array<double>")
    def _q(v: pd.Series) -> list:
        from tantivy_spark.functions import tdigest as td
        return [float(x) for x in
                td.quantile(td.build(v.to_numpy(), delta), qs)]

    return _q(col)
