"""IndexWriter facade: the reference's writer API shape over the
incremental ingest + deletes + merge machinery.

Reference semantics (src/indexer/index_writer.rs): ``add_document`` /
``delete_term`` / ``delete_query`` BUFFER operations; nothing is visible
to readers until ``commit()``, which atomically publishes the pending
batch (our manifest plays meta.json's role) and returns an opstamp.
``rollback()`` discards everything buffered since the last commit.

Spark shape: adds buffer as DataFrames (lazy — no materialization until
commit); a commit unions them into ONE micro-batch ingested through
:class:`tantivy_spark.streaming.IncrementalIndexer` (per-batch
subdirectories, crash-idempotent, manifest-gated visibility), then
applies the buffered deletes against the fresh reader.  Deletes
buffered in the same transaction as adds apply AFTER the adds, like the
reference's opstamp ordering for a delete issued after an add.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from tantivy_spark.index.build import IndexConfig
from tantivy_spark.index.reader import IndexReader
from tantivy_spark.streaming.ingest import IncrementalIndexer


class IndexWriter:
    def __init__(self, spark: SparkSession, index_dir: str,
                 cfg: IndexConfig | None = None,
                 segments_per_batch: int = 4):
        self.spark = spark
        self.index_dir = index_dir
        self._indexer = IncrementalIndexer(
            spark, index_dir, cfg, segments_per_batch=segments_per_batch)
        #: ordered op buffer — order IS the semantics: a delete only
        #: affects docs added by EARLIER ops (the reference applies
        #: operations in opstamp order, index_writer.rs: deletes target
        #: lower opstamps only, which is what makes the delete-then-
        #: re-add UPDATE recipe atomic within one commit)
        self._pending_ops: list[tuple[str, object]] = []

    # ------------------------------------------------------------ buffering
    def add_documents(self, df: DataFrame) -> "IndexWriter":
        """Buffer a frame of documents (columns per the IndexConfig).
        Invisible to readers until commit()."""
        self._pending_ops.append(("add", df))
        return self

    def delete_term(self, term: str) -> "IndexWriter":
        """Buffer a delete of every doc containing ``term`` (applies at
        commit, ref: IndexWriter::delete_term)."""
        self._pending_ops.append(("term", term))
        return self

    def delete_by_keys(self, keys: list[str]) -> "IndexWriter":
        """Buffer a primary-key delete (the delete_term-on-id-field case)."""
        self._pending_ops.append(("keys", list(keys)))
        return self

    def delete_query(self, query) -> "IndexWriter":
        """Buffer a delete of every doc matching a query tree
        (ref: IndexWriter::delete_query)."""
        self._pending_ops.append(("query", query))
        return self

    def rollback(self) -> "IndexWriter":
        """Discard everything buffered since the last commit
        (ref: IndexWriter::rollback)."""
        self._pending_ops.clear()
        return self

    # -------------------------------------------------------------- commit
    @property
    def _next_opstamp(self) -> int:
        """Monotonic commit stamp from the manifest — EVERY commit
        (including deletes-only) advances it, like the reference
        IndexWriter's opstamps (index_writer.rs).  Initialized past the
        highest published batch id for pre-counter manifests."""
        m = self._indexer.manifest
        batches = m.get("batches", {})
        floor = 1 + max((int(b) for b in batches), default=-1)
        return max(int(m.get("opstamp", 0)), floor)

    def _publish_opstamp(self, opstamp: int) -> None:
        """Persist the advanced counter.  For add-commits process_batch
        already rewrote the manifest with the batch row; this extra write
        also covers deletes-only commits, whose stamp would otherwise be
        reused by the next commit."""
        from tantivy_spark.streaming.ingest import _write_manifest

        self._indexer.manifest["opstamp"] = opstamp + 1
        _write_manifest(self._indexer.manifest_path, self._indexer.manifest)

    def commit(self) -> int:
        """Apply the buffered ops IN ORDER (the reference's opstamp
        semantics: a delete only affects docs from earlier ops — the
        delete-old + add-new UPDATE recipe replaces atomically within
        one commit).  Runs of consecutive adds publish as one
        micro-batch (atomic manifest swap); each delete applies against
        the index as of the ops before it.  Returns the final opstamp —
        unique and monotonic across commits of every kind."""
        from functools import reduce

        from tantivy_spark.index import deletes as dl

        opstamp = self._next_opstamp
        pending_adds: list[DataFrame] = []

        def flush_adds():
            nonlocal opstamp
            if pending_adds:
                batch = reduce(lambda a, b: a.unionByName(b), pending_adds)
                st = self._next_opstamp
                self._indexer.process_batch(batch, st)
                pending_adds.clear()
                opstamp = st

        for kind, arg in self._pending_ops:
            if kind == "add":
                pending_adds.append(arg)
                continue
            flush_adds()
            reader = IndexReader(self.spark, self.index_dir)
            if kind == "term":
                dl.delete_by_term(self.spark, reader, arg)
            elif kind == "keys":
                dl.delete_by_keys(self.spark, reader, arg)
            else:
                dl.delete_by_query(self.spark, reader, arg)
        flush_adds()
        self._pending_ops.clear()
        self._publish_opstamp(opstamp)
        return opstamp

    # ------------------------------------------------------------- reading
    def reader(self) -> IndexReader:
        """Snapshot reader over everything COMMITTED so far."""
        return IndexReader(self.spark, self.index_dir)

    def maybe_compact(self, out_dir: str, max_segments: int = 16,
                      n_target_segments: int = 8):
        """Run the merge policy when the index has accumulated too many
        segments (ref: segment_updater's background merges — explicit
        here, schedule it from your orchestrator)."""
        from tantivy_spark.index.merge import maybe_compact

        return maybe_compact(self.spark, self.index_dir, out_dir,
                             max_segments=max_segments,
                             n_target_segments=n_target_segments)
