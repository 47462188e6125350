"""Elasticsearch-compatible aggregation request trees on DataFrames."""

from tantivy_spark.aggs.tree import run_agg_tree  # noqa: F401
