"""Segment merge: k segments -> 1, tantivy stacking semantics.

Reference semantics (/root/reference/src/indexer/merger.rs:648-847):
doc ids are remapped by *stacking* — segment k's docs get offset
sum(max_doc of segments < k); per-term postings from different segments
concatenate in segment order (doc ranges are disjoint, so the merged list
stays sorted); doc_freqs sum; total_num_tokens is recomputed.

Spark-first shape: because our posting lists are stored as bounded chunks
(<= CHUNK_DOCS postings per row), merging needs NO pairwise list merge at
all — each chunk is independently rebased (decode -> +offset -> re-encode,
vectorized numpy) and renumbered into the merged term's chunk sequence.
The only coordination is the per-term chunk renumbering, computed as a
prefix-sum over the tiny (term, segment) chunk-count table.

Skew: the rebase shuffle is keyed by (term, salt) — ``salt = xxhash(chunk)
% n_salts`` — so a hot term's thousands of chunks spread across
partitions instead of hammering one reducer.  Renumbering is
order-deterministic regardless of salt placement, so salting never
changes the output (asserted by tests).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from tantivy_spark.bm25 import tf_cache_f32
from tantivy_spark.index import codec
from tantivy_spark.index.build import (
    FIELDNORM_SENTINEL,
    POSTINGS_SCHEMA,
    _write_manifest,
)


def _rebase_kernel(offsets: dict[int, int], avg_fieldnorm: float,
                   dead: dict[int, np.ndarray] | None = None):
    """mapInPandas kernel: rebase each posting chunk by its segment offset.

    With ``dead`` (per-segment sorted dead doc ids), deleted docs are
    physically dropped and the survivors renumbered densely — the
    reference merger's alive-doc remapping (merger.rs:697-708):
    ``new_id = old_id - #dead_before(old_id) + alive_offset(segment)``.
    """
    cache = tf_cache_f32(max(avg_fieldnorm, 1e-9))
    dead = dead or {}

    def rebase(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out_rows = []
            for row in pdf.itertuples(index=False):
                seg = int(row.segment_ord)
                off = offsets[seg]
                meta = list(zip(row.last_docs, row.n_docs, row.bits_doc,
                                row.bits_tf, row.wand_fn, row.wand_tf))
                d, t = codec.decode_postings(bytes(row.docs), bytes(row.tfs), meta)
                fn = codec.decode_fns(bytes(row.fns))
                pos_flat = (codec.decode_positions(bytes(row.pos), t)
                            if row.pos is not None else None)
                dd = dead.get(seg)
                if dd is not None and len(dd):
                    alive = ~np.isin(d, dd)
                    if pos_flat is not None:
                        pos_keep = np.repeat(alive, t)
                        pos_flat = pos_flat[pos_keep]
                    d, t, fn = d[alive], t[alive], fn[alive]
                    if len(d) == 0:
                        continue
                    d = d - np.searchsorted(dd, d)
                db, tb, fb, new_meta = codec.encode_postings(d + off, t, fn, cache)
                pb = (codec.encode_positions(pos_flat, t)
                      if pos_flat is not None else None)
                m = list(zip(*new_meta))
                out_rows.append((
                    0, row.term, int(row.new_chunk_id), len(d),
                    int(t.sum()), db, tb, fb, pb,
                    list(m[0]), list(m[1]), list(m[2]), list(m[3]),
                    list(m[4]), list(m[5]),
                ))
            if out_rows:
                yield pd.DataFrame(out_rows, columns=[
                    "segment_ord", "term", "chunk_id", "doc_freq", "total_tf",
                    "docs", "tfs", "fns", "pos", "last_docs", "n_docs",
                    "bits_doc", "bits_tf", "wand_fn", "wand_tf",
                ])

    return rebase


def maybe_compact(spark: SparkSession, index_dir: str, out_dir: str,
                  max_segments: int = 16, n_salts: int = 8) -> dict | None:
    """Merge-policy analogue (ref: LogMergePolicy / segment_updater.rs):
    compact the index when it has accumulated more than ``max_segments``
    segments (e.g. after streaming ingest).  Returns the new manifest or
    None when no compaction was needed."""
    with open(os.path.join(index_dir, "meta.json")) as f:
        manifest = json.load(f)
    if int(manifest["totals"].get("num_segments", 0)) <= max_segments:
        return None
    return merge_segments(spark, index_dir, out_dir, n_salts=n_salts)


def merge_segments(spark: SparkSession, index_dir: str, out_dir: str,
                   n_salts: int = 8) -> dict:
    """Merge every segment of ``index_dir`` into a single segment at
    ``out_dir``.  Returns the new manifest."""
    t_start = time.time()
    with open(os.path.join(index_dir, "meta.json")) as f:
        manifest = json.load(f)
    os.makedirs(out_dir, exist_ok=True)

    lineage = spark.read.parquet(os.path.join(index_dir, "lineage")).collect()
    seg_docs = {int(r["segment_ord"]): int(r["n_docs"] or 0) for r in lineage}

    # deletes are physically dropped at merge (reference: merger drops
    # deleted docs and renumbers the survivors; total_num_tokens is
    # recomputed from alive fieldnorms — merger.rs:85-114, 697-708)
    dead: dict[int, np.ndarray] = {}
    deletes_path = os.path.join(index_dir, "deletes")
    if os.path.isdir(deletes_path):
        for row in spark.read.parquet(deletes_path).distinct().collect():
            dead.setdefault(int(row["segment_ord"]), []).append(int(row["doc_id"]))
        dead = {s: np.sort(np.array(v, dtype=np.int64)) for s, v in dead.items()}

    alive_docs = {seg: n - len(dead.get(seg, ())) for seg, n in seg_docs.items()}
    offsets: dict[int, int] = {}
    acc = 0
    for seg in sorted(alive_docs):
        offsets[seg] = acc
        acc += alive_docs[seg]

    postings = spark.read.parquet(os.path.join(index_dir, "postings"))
    real = postings.filter(F.col("term") != FIELDNORM_SENTINEL)
    sent = postings.filter(F.col("term") == FIELDNORM_SENTINEL)

    # alive-only global stats (drives both the block-max cache and the
    # merged manifest)
    alive_tokens = 0
    for row in sent.select("segment_ord", "doc_freq", "docs").collect():
        counts = codec.vint_decode(bytes(row["docs"]), int(row["doc_freq"]))
        dd = dead.get(int(row["segment_ord"]))
        if dd is not None and len(dd):
            mask = np.ones(len(counts), dtype=bool)
            mask[dd] = False
            counts = counts[mask]
        alive_tokens += int(counts.sum())
    total_alive = acc
    avg_fn = (alive_tokens / total_alive) if total_alive else 1.0

    # ---- per-term chunk renumbering via prefix sums (no giant window) ----
    counts = real.groupBy("term", "segment_ord").agg(F.count("*").alias("n_chunks"))
    w = (Window.partitionBy("term").orderBy("segment_ord")
         .rowsBetween(Window.unboundedPreceding, -1))
    base = counts.withColumn(
        "chunk_base", F.coalesce(F.sum("n_chunks").over(w), F.lit(0)))
    rebased_input = (
        real.join(base.select("term", "segment_ord", "chunk_base"),
                  ["term", "segment_ord"])
        .withColumn("new_chunk_id", F.col("chunk_base") + F.col("chunk_id"))
        .drop("chunk_base")
        # hot-term skew: spread a term's chunks across reducers
        .withColumn("salt", F.pmod(F.xxhash64("term", "segment_ord", "chunk_id"),
                                   F.lit(n_salts)))
        .repartition("term", "salt")
        .drop("salt")
    )
    merged = rebased_input.mapInPandas(_rebase_kernel(offsets, avg_fn, dead),
                                       schema=POSTINGS_SCHEMA)

    # ---- merged fieldnorm sentinel: concat per-doc stats in segment order
    def merge_sentinels(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("segment_ord", ignore_index=True)
        counts_parts, fns_parts = [], []
        for row in pdf.itertuples(index=False):
            n = int(row.doc_freq)
            counts = codec.vint_decode(bytes(row.docs), n)
            fns = np.frombuffer(bytes(row.fns), dtype=np.uint8)
            dd = dead.get(int(row.segment_ord))
            if dd is not None and len(dd):
                mask = np.ones(n, dtype=bool)
                mask[dd] = False
                counts, fns = counts[mask], fns[mask]
            counts_parts.append(counts)
            fns_parts.append(fns)
        all_counts = np.concatenate(counts_parts) if counts_parts else np.zeros(0, np.uint32)
        all_fns = np.concatenate(fns_parts) if fns_parts else np.zeros(0, np.uint8)
        return pd.DataFrame([(
            0, FIELDNORM_SENTINEL, 0, len(all_counts), int(all_counts.sum()),
            codec.vint_encode(all_counts), b"", all_fns.tobytes(), None,
            [], [], [], [], [], [],
        )], columns=["segment_ord", "term", "chunk_id", "doc_freq", "total_tf",
                     "docs", "tfs", "fns", "pos", "last_docs", "n_docs",
                     "bits_doc", "bits_tf", "wand_fn", "wand_tf"])

    sent_merged = (sent.withColumn("g", F.lit(0)).groupBy("g")
                   .applyInPandas(lambda pdf: merge_sentinels(pdf.drop(columns=["g"])),
                                  schema=POSTINGS_SCHEMA))

    # final layout: range-partitioned by term + sorted within partitions,
    # so every term lookup prunes to one partition's row groups — the
    # FST-ordered-dictionary equivalent at file-layout level
    merged.unionByName(sent_merged) \
        .repartitionByRange(max(spark.sparkContext.defaultParallelism, 8), "term") \
        .sortWithinPartitions("term", "chunk_id") \
        .write.mode("overwrite").parquet(os.path.join(out_dir, "postings"))

    # ---- docmap rebase (alive docs only, densely renumbered) --------------
    docmap = spark.read.parquet(os.path.join(index_dir, "docmap"))
    if dead:
        dels_df = spark.read.parquet(deletes_path).distinct()
        docmap = docmap.join(F.broadcast(dels_df),
                             ["segment_ord", "doc_id"], "left_anti")
    off_expr = F.create_map(
        *[x for seg, off in offsets.items() for x in (F.lit(seg), F.lit(off))])
    w_alive = Window.partitionBy("segment_ord").orderBy("doc_id")
    (docmap
     .withColumn("alive_rank", F.row_number().over(w_alive) - 1)
     .select(
         F.lit(0).cast("int").alias("segment_ord"),
         (F.col("alive_rank") + off_expr[F.col("segment_ord")]).cast("int")
         .alias("doc_id"),
         "key")
     .write.mode("overwrite").parquet(os.path.join(out_dir, "docmap")))

    # ---- term_stats / lineage / manifest ----------------------------------
    new_postings = spark.read.parquet(os.path.join(out_dir, "postings"))
    (new_postings.filter(F.col("term") != FIELDNORM_SENTINEL)
     .groupBy("term")
     .agg(F.sum("doc_freq").alias("doc_freq"), F.sum("total_tf").alias("total_tf"))
     .write.mode("overwrite").parquet(os.path.join(out_dir, "term_stats")))

    is_sent = F.col("term") == FIELDNORM_SENTINEL
    (new_postings.groupBy("segment_ord").agg(
        F.sum(F.when(is_sent, F.col("doc_freq"))).alias("n_docs"),
        F.sum(F.when(is_sent, F.col("total_tf"))).alias("n_tokens"),
        F.sum(F.when(~is_sent, 1).otherwise(0)).alias("posting_rows"),
        F.sum(F.when(~is_sent, F.col("doc_freq"))).alias("postings"),
        (F.sum(F.octet_length("docs")) + F.sum(F.octet_length("tfs"))
         + F.sum(F.octet_length("fns"))
         + F.sum(F.coalesce(F.octet_length("pos"), F.lit(0)))).alias("bytes"),
    ).write.mode("overwrite").parquet(os.path.join(out_dir, "lineage")))

    new_manifest = dict(manifest)
    new_manifest["totals"] = {
        "num_docs": total_alive,
        "total_num_tokens": alive_tokens,
        "num_segments": 1,
        "avg_fieldnorm": avg_fn,
    }
    new_manifest["stages"] = dict(manifest.get("stages", {}),
                                  merge={"wall_sec": time.time() - t_start,
                                         "status": "done"})
    new_manifest["merged_from"] = {"index_dir": index_dir,
                                   "offsets": {str(k): v for k, v in offsets.items()},
                                   "n_salts": n_salts}
    _write_manifest(os.path.join(out_dir, "meta.json"), new_manifest)
    return new_manifest
