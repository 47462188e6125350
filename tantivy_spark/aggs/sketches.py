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
its serialized sketch, so cross-query percentile merging is NOT offered
— re-aggregation is one fast-field column scan (documented trade-off;
the reference's DDSketch merge has no public Spark surface).
"""

from __future__ import annotations

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
