"""Index construction, codecs, merge, reading, and the writer facade."""

from tantivy_spark.index.build import (  # noqa: F401
    IndexConfig, build_index, build_index_wide)
from tantivy_spark.index.reader import IndexReader  # noqa: F401


def __getattr__(name):
    # IndexWriter pulls in streaming; import lazily to keep module load light
    if name == "IndexWriter":
        from tantivy_spark.index.writer import IndexWriter
        return IndexWriter
    raise AttributeError(name)
