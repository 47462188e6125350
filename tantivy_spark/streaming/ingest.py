"""Incremental index ingestion via Structured Streaming foreachBatch.

The reference has no streaming engine — ingestion is micro-batched
through IndexWriter commits (ARCHITECTURE.md:31-53).  The Spark-native
equivalent: a ``foreachBatch`` sink where every micro-batch becomes a set
of fresh immutable segments appended to the index, with the manifest
playing meta.json's role (atomic swap, opstamp == batch_id).  Periodic
compaction = ``tantivy_spark.index.merge.merge_segments`` on a schedule,
the analogue of the background merge policy.

Usage::

    indexer = IncrementalIndexer(spark, index_dir, cfg)
    (stream.writeStream.foreachBatch(indexer.process_batch)
        .trigger(availableNow=True).start())

Batch idempotency: processed batch_ids are recorded in the manifest and
re-deliveries are skipped.  (A crash after the parquet append but before
the manifest write could leave orphan rows on retry; a production
deployment would write per-batch subdirectories — kept simple here.)
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


class IncrementalIndexer:
    def __init__(self, spark: SparkSession, index_dir: str,
                 cfg: IndexConfig | None = None,
                 segments_per_batch: int = 4):
        self.spark = spark
        self.index_dir = index_dir
        self.cfg = cfg or IndexConfig()
        self.segments_per_batch = segments_per_batch
        os.makedirs(index_dir, exist_ok=True)
        self.manifest_path = os.path.join(index_dir, "meta.json")
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                self.manifest = json.load(f)
        else:
            self.manifest = {
                "version": 1, "config": self.cfg.__dict__, "stages": {},
                "totals": {"num_docs": 0, "total_num_tokens": 0,
                           "num_segments": 0, "avg_fieldnorm": 0.0},
                "batches": {}, "next_segment_ord": 0,
            }
        self.manifest.setdefault("batches", {})
        self.manifest.setdefault("next_segment_ord",
                                 self.manifest["totals"].get("num_segments", 0))

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        bid = str(int(batch_id))
        if bid in self.manifest["batches"]:
            return  # re-delivery of a committed batch: exactly-once skip
        t0 = time.time()
        n_seg = self.segments_per_batch
        base = int(self.manifest["next_segment_ord"])
        cfg = IndexConfig(
            key_col=self.cfg.key_col, text_col=self.cfg.text_col,
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
        postings.write.mode("append").parquet(os.path.join(self.index_dir, "postings"))

        from tantivy_spark.index.build import _segmented_docs
        w = Window.partitionBy("segment_ord").orderBy("key")
        docmap = (_segmented_docs(batch_df, cfg)
                  .select("segment_ord", "key")
                  .withColumn("doc_id", (F.row_number().over(w) - 1).cast("int"))
                  .select("segment_ord", "doc_id", "key"))
        docmap.write.mode("append").parquet(os.path.join(self.index_dir, "docmap"))

        # per-batch stats from the freshly written sentinel rows
        new_postings = self.spark.read.parquet(os.path.join(self.index_dir, "postings"))
        is_sent = F.col("term") == FIELDNORM_SENTINEL
        batch_segs = new_postings.filter(
            is_sent & (F.col("segment_ord") >= base)
            & (F.col("segment_ord") < base + n_seg))
        stats = batch_segs.agg(
            F.coalesce(F.sum("doc_freq"), F.lit(0)).alias("docs"),
            F.coalesce(F.sum("total_tf"), F.lit(0)).alias("tokens"),
            F.countDistinct("segment_ord").alias("segs"),
        ).collect()[0]

        # append lineage rows for the new segments
        lin = new_postings.filter(
            (F.col("segment_ord") >= base) & (F.col("segment_ord") < base + n_seg)
        ).groupBy("segment_ord").agg(
            F.sum(F.when(is_sent, F.col("doc_freq"))).alias("n_docs"),
            F.sum(F.when(is_sent, F.col("total_tf"))).alias("n_tokens"),
            F.sum(F.when(~is_sent, 1).otherwise(0)).alias("posting_rows"),
            F.sum(F.when(~is_sent, F.col("doc_freq"))).alias("postings"),
            (F.sum(F.octet_length("docs")) + F.sum(F.octet_length("tfs"))
             + F.sum(F.octet_length("fns"))
             + F.sum(F.coalesce(F.octet_length("pos"), F.lit(0)))).alias("bytes"),
        )
        lin.write.mode("append").parquet(os.path.join(self.index_dir, "lineage"))

        # incremental term_stats delta (reader sums per term)
        (new_postings.filter(
            (~is_sent) & (F.col("segment_ord") >= base)
            & (F.col("segment_ord") < base + n_seg))
         .groupBy("term")
         .agg(F.sum("doc_freq").alias("doc_freq"), F.sum("total_tf").alias("total_tf"))
         .write.mode("append").parquet(os.path.join(self.index_dir, "term_stats")))

        t = self.manifest["totals"]
        t["num_docs"] += int(stats["docs"])
        t["total_num_tokens"] += int(stats["tokens"])
        t["num_segments"] += int(stats["segs"])
        t["avg_fieldnorm"] = (t["total_num_tokens"] / t["num_docs"]) if t["num_docs"] else 0.0
        self.manifest["next_segment_ord"] = base + n_seg
        self.manifest["batches"][bid] = {
            "segments": [base, base + n_seg], "docs": int(stats["docs"]),
            "wall_sec": time.time() - t0,
        }
        _write_manifest(self.manifest_path, self.manifest)
