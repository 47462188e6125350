"""Incremental / streaming index ingestion."""

from tantivy_spark.streaming.ingest import IncrementalIndexer  # noqa: F401
