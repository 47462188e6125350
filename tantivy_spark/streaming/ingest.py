"""Incremental index ingestion via Structured Streaming foreachBatch.

The reference has no streaming engine — ingestion is micro-batched
through IndexWriter commits (ARCHITECTURE.md:31-53).  The Spark-native
equivalent: a ``foreachBatch`` sink where every micro-batch becomes a set
of fresh immutable segments appended to the index, with the manifest
playing meta.json's role (atomic swap, opstamp == batch_id).  Periodic
compaction = ``tantivy_spark.index.merge.merge_segments`` on a schedule,
the analogue of the background merge policy.

Atomicity: every batch writes into its OWN partition subdirectories
(``postings/batch=N``, ``docmap/batch=N``, ...) with overwrite mode, and
the manifest records the batch only after every write landed.  A crash at
ANY point before the manifest write leaves orphan files that the retry
overwrites exactly — re-delivery is idempotent whether the previous
attempt failed before, between, or after the parquet writes (the
reference's equivalent guarantee is the meta.json atomic swap +
failpoint-tested serializer, tests/failpoints/mod.rs).  Readers see the
``batch`` partition column via partition discovery; every consumer
addresses columns by name, so it is inert.

Failpoints: ``indexer.failpoints.add("after_postings")`` makes the next
``process_batch`` raise right after the postings write — the unit tests
inject crashes at each window and assert the retry converges to the
clean-run result.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tantivy_spark.index.build import (
    FIELDNORM_SENTINEL,
    POSTINGS_SCHEMA,
    IndexConfig,
    _segment_kernel,
    _tokenized_docs,
    _write_manifest,
)

FAILPOINTS = ("after_postings", "after_docmap", "after_lineage",
              "after_term_stats")


class InjectedFailure(IOError):
    """Raised by an armed failpoint (test instrumentation)."""


class IncrementalIndexer:
    def __init__(self, spark: SparkSession, index_dir: str,
                 cfg: IndexConfig | None = None,
                 segments_per_batch: int = 4):
        self.spark = spark
        self.index_dir = index_dir
        self.cfg = cfg or IndexConfig()
        self.segments_per_batch = segments_per_batch
        #: armed failure-injection points (see module docstring)
        self.failpoints: set[str] = set()
        os.makedirs(index_dir, exist_ok=True)
        self.manifest_path = os.path.join(index_dir, "meta.json")
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                self.manifest = json.load(f)
            if self.manifest.get("stages"):
                raise ValueError(
                    "IncrementalIndexer requires a fresh or streaming-built "
                    "index dir; extend a batch-built/merged index by "
                    "re-ingesting into a new dir or merging afterwards")
        else:
            self.manifest = {
                "version": 1, "config": self.cfg.__dict__, "stages": {},
                "totals": {"num_docs": 0, "total_num_tokens": 0,
                           "num_segments": 0, "avg_fieldnorm": 0.0},
                "batches": {}, "next_segment_ord": 0,
            }
            # persist the empty manifest: a reader over a fresh index sees
            # zero published batches instead of a missing meta.json
            _write_manifest(self.manifest_path, self.manifest)
        self.manifest.setdefault("batches", {})
        self.manifest.setdefault("next_segment_ord",
                                 self.manifest["totals"].get("num_segments", 0))
        self._drop_orphan_batches()

    def _drop_orphan_batches(self) -> None:
        """Crash recovery at startup: delete ``batch=N`` subdirectories the
        manifest never published.  Readers already ignore them
        (IndexReader restricts every table to manifest batches), and a
        redelivered batch overwrites the same paths — this just reclaims
        the space and keeps ad-hoc directory listings honest."""
        import shutil

        published = set(self.manifest["batches"])
        for table in ("postings", "docmap", "term_stats", "lineage"):
            tdir = os.path.join(self.index_dir, table)
            if not os.path.isdir(tdir):
                continue
            for sub in os.listdir(tdir):
                if sub.startswith("batch=") and \
                        sub.split("=", 1)[1] not in published:
                    shutil.rmtree(os.path.join(tdir, sub), ignore_errors=True)

    def _fail(self, point: str) -> None:
        if point in self.failpoints:
            raise InjectedFailure(point)

    def _bdir(self, table: str, bid: str) -> str:
        return os.path.join(self.index_dir, table, f"batch={bid}")

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        bid = str(int(batch_id))
        if bid in self.manifest["batches"]:
            return  # re-delivery of a committed batch: exactly-once skip
        t0 = time.time()
        n_seg = self.segments_per_batch
        base = int(self.manifest["next_segment_ord"])
        cfg = IndexConfig(
            key_col=self.cfg.key_col, text_col=self.cfg.text_col,
            field_cols=self.cfg.field_cols,
            n_segments=n_seg,
            segment_expr=(
                f"{base} + pmod(xxhash64({self.cfg.key_col}), {n_seg})"
                if self.cfg.segment_expr is None
                else f"{base} + ({self.cfg.segment_expr})"),
            with_positions=self.cfg.with_positions,
            chunk_docs=self.cfg.chunk_docs,
        )
        postings = (
            _tokenized_docs(batch_df, cfg)
            .groupBy("segment_ord")
            .applyInArrow(_segment_kernel(cfg), schema=POSTINGS_SCHEMA)
        )
        # every write is an OVERWRITE of this batch's own subdirectory —
        # a retried batch rewrites the same paths byte-for-byte
        postings.write.mode("overwrite").option(
            "compression", self.cfg.compression).parquet(
            self._bdir("postings", bid))
        self._fail("after_postings")

        from tantivy_spark.index.build import _segmented_docs
        w = Window.partitionBy("segment_ord").orderBy("key")
        ffs = list(cfg.fast_field_cols or ())
        docmap = (_segmented_docs(batch_df, cfg)
                  .select("segment_ord", "key", *ffs)
                  .withColumn("doc_id", (F.row_number().over(w) - 1).cast("int"))
                  .select("segment_ord", "doc_id", "key", *ffs))
        docmap.write.mode("overwrite").option(
            "compression", self.cfg.compression).parquet(
            self._bdir("docmap", bid))
        self._fail("after_docmap")

        # per-batch stats from the freshly written sentinel rows (doc
        # counts from exactly ONE field's sentinel chain on multi-field)
        from tantivy_spark.index.build import fieldnorm_sentinel
        doc_sentinel = fieldnorm_sentinel(
            next(iter(self.cfg.field_cols)) if self.cfg.field_cols else None)
        batch_postings = self.spark.read.parquet(self._bdir("postings", bid))
        is_sent = F.col("term").startswith(FIELDNORM_SENTINEL)
        is_doc_sent = F.col("term") == doc_sentinel
        stats = batch_postings.filter(is_sent).agg(
            F.coalesce(F.sum(F.when(is_doc_sent, F.col("doc_freq"))),
                       F.lit(0)).alias("docs"),
            F.coalesce(F.sum("total_tf"), F.lit(0)).alias("tokens"),
            F.countDistinct("segment_ord").alias("segs"),
        ).collect()[0]

        # lineage rows for the new segments
        (batch_postings.groupBy("segment_ord").agg(
            F.sum(F.when(is_doc_sent, F.col("doc_freq"))).alias("n_docs"),
            F.sum(F.when(is_sent, F.col("total_tf"))).alias("n_tokens"),
            F.sum(F.when(~is_sent, 1).otherwise(0)).alias("posting_rows"),
            F.sum(F.when(~is_sent, F.col("doc_freq"))).alias("postings"),
            (F.sum(F.octet_length("docs")) + F.sum(F.octet_length("tfs"))
             + F.sum(F.octet_length("fns"))
             + F.sum(F.coalesce(F.octet_length("pos"), F.lit(0)))).alias("bytes"),
        ).write.mode("overwrite").parquet(self._bdir("lineage", bid)))
        self._fail("after_lineage")

        # incremental term_stats delta (reader sums per term)
        (batch_postings.filter(~is_sent)
         .groupBy("term")
         .agg(F.sum("doc_freq").alias("doc_freq"), F.sum("total_tf").alias("total_tf"))
         .write.mode("overwrite").parquet(self._bdir("term_stats", bid)))
        self._fail("after_term_stats")

        t = self.manifest["totals"]
        t["num_docs"] += int(stats["docs"])
        t["total_num_tokens"] += int(stats["tokens"])
        t["num_segments"] += int(stats["segs"])
        t["avg_fieldnorm"] = (t["total_num_tokens"] / t["num_docs"]) if t["num_docs"] else 0.0
        if self.cfg.field_cols:
            from tantivy_spark.index.build import FIELD_SEP
            frows = (batch_postings.filter(is_sent).groupBy("term")
                     .agg(F.sum("doc_freq").alias("nd"),
                          F.sum("total_tf").alias("nt")).collect())
            fstats = t.setdefault("fields", {})
            for r in frows:
                fld = r["term"].split(FIELD_SEP, 1)[1]
                e = fstats.setdefault(
                    fld, {"num_docs": 0, "total_num_tokens": 0,
                          "avg_fieldnorm": 0.0})
                e["num_docs"] += int(r["nd"])
                e["total_num_tokens"] += int(r["nt"])
                e["avg_fieldnorm"] = (e["total_num_tokens"] / e["num_docs"]
                                      if e["num_docs"] else 0.0)
        self.manifest["next_segment_ord"] = base + n_seg
        self.manifest["batches"][bid] = {
            "segments": [base, base + n_seg], "docs": int(stats["docs"]),
            "wall_sec": time.time() - t0,
        }
        # the atomic publish point: everything above is invisible to
        # readers-of-the-manifest until this rename lands
        _write_manifest(self.manifest_path, self.manifest)
