"""Elasticsearch-compatible aggregation request trees on DataFrames."""

from tantivy_spark.aggs.tree import (  # noqa: F401
    AggregationLimitsError, DEFAULT_BUCKET_LIMIT, run_agg_tree, to_es_json,
)
