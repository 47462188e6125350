"""Partition-parallel inverted-index build.

Spark-first translation of the reference's indexing pipeline
(/root/reference/src/indexer/index_writer.rs:182-299 — N worker threads,
each building an independent in-RAM segment, flushed under a memory
budget):

* one **segment** == one Spark partition group, assigned by a
  deterministic, parallelism-independent expression over the document key
  (so the index — and therefore every docID and score — is identical at
  any cluster size);
* each segment is built by a single Arrow ``applyInPandas`` kernel that
  tokenizes, aggregates (term, doc) -> tf/positions, and writes
  block-compressed posting lists (delta+bitpack full blocks, VInt tails,
  per-block block-max metadata — ref semantics
  src/postings/serializer.rs:379-481);
* posting lists are split into bounded **chunks** (<= CHUNK_DOCS postings)
  so no single row ever exceeds a few MB regardless of term hotness — this
  is the unit of skew-free merge and of WAND block iteration;
* global statistics (term -> doc_freq, total docs/tokens) are plain
  DataFrame aggregations;
* the build is **checkpoint-resumable**: each stage writes its output and
  a manifest entry; re-running skips completed stages.  Per-partition
  lineage + throughput metrics land in ``lineage/`` and ``meta.json``.

Layout of an index directory::

    {out}/docmap/      (segment_ord, doc_id, key, num_tokens)
    {out}/postings/    (segment_ord, term, chunk_id, doc_freq, total_tf,
                        docs, tfs, fns, pos, last_docs, n_docs,
                        bits_doc, bits_tf, wand_fn, wand_tf)
    {out}/term_stats/  (term, doc_freq, total_tf)
    {out}/lineage/     (segment_ord, stage, rows, bytes, wall_sec)
    {out}/meta.json    manifest
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict, dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tantivy_spark.analyzer import tokenize_with_positions_series
from tantivy_spark.bm25 import tf_cache_f32
from tantivy_spark.fieldnorm import fieldnorm_to_id
from tantivy_spark.index import codec

CHUNK_DOCS = 1 << 17  # max postings per chunk row (1024 blocks)

POSTINGS_SCHEMA = (
    "segment_ord INT, term STRING, chunk_id INT, doc_freq BIGINT, total_tf BIGINT, "
    "docs BINARY, tfs BINARY, fns BINARY, pos BINARY, "
    "last_docs ARRAY<INT>, n_docs ARRAY<INT>, bits_doc ARRAY<INT>, bits_tf ARRAY<INT>, "
    "wand_fn ARRAY<INT>, wand_tf ARRAY<INT>"
)

DOCMAP_SCHEMA = "segment_ord INT, doc_id INT, key STRING, num_tokens INT"


@dataclass
class IndexConfig:
    key_col: str = "url"
    text_col: str = "text"
    n_segments: int = 8
    segment_expr: str | None = None   # SQL over input cols; default pmod(xxhash64(key), n)
    with_positions: bool = True

    def segment_sql(self) -> str:
        if self.segment_expr:
            return self.segment_expr
        return f"pmod(xxhash64({self.key_col}), {self.n_segments})"


def _stage_done(out_dir: str, stage: str) -> bool:
    return os.path.exists(os.path.join(out_dir, stage, "_SUCCESS"))


def _segmented_docs(df: DataFrame, cfg: IndexConfig) -> DataFrame:
    """(segment_ord, key, text) with deterministic segment assignment."""
    return df.select(
        F.expr(cfg.segment_sql()).cast("int").alias("segment_ord"),
        F.col(cfg.key_col).alias("key"),
        F.col(cfg.text_col).alias("text"),
    )


def _segment_kernel(cfg: IndexConfig):
    """applyInPandas kernel: one whole segment in -> posting rows out.

    The analogue of one reference indexing thread
    (SegmentWriter + PostingsSerializer).  All heavy lifting is
    pandas/numpy-vectorized; the only Python loop is per unique term
    (each iteration operates on numpy slices).
    """
    with_positions = cfg.with_positions

    def build_segment(pdf: pd.DataFrame) -> pd.DataFrame:
        seg = int(pdf["segment_ord"].iloc[0])
        pdf = pdf.sort_values("key", kind="mergesort", ignore_index=True)
        n_docs = len(pdf)
        tok_lists = tokenize_with_positions_series(pdf["text"])
        counts = tok_lists.map(len).to_numpy(dtype=np.int64)
        fn_ids_per_doc = fieldnorm_to_id(counts)
        # segment-average fieldnorm drives block-max pair selection
        # (ref: serializer.rs:404-428 uses the segment's average)
        total_tokens = int(counts.sum())
        avg_fn = (total_tokens / n_docs) if n_docs else 1.0
        cache = tf_cache_f32(max(avg_fn, 1e-9))

        doc_rep = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
        flat = [p for lst in tok_lists for p in lst]
        if not flat:
            return pd.DataFrame({c: pd.Series(dtype=t) for c, t in _EMPTY_POSTINGS.items()})
        terms = pd.array([p[0] for p in flat], dtype="string")
        poss = np.fromiter((p[1] for p in flat), dtype=np.int64, count=len(flat))

        fdf = pd.DataFrame({"term": terms, "doc": doc_rep, "pos": poss})
        fdf.sort_values(["term", "doc", "pos"], kind="mergesort", ignore_index=True, inplace=True)
        t_codes, t_uniques = pd.factorize(fdf["term"], sort=False)  # already sorted
        docs_all = fdf["doc"].to_numpy()
        pos_all = fdf["pos"].to_numpy()
        # (term, doc) run-length -> tf
        td_change = np.empty(len(fdf), dtype=bool)
        td_change[0] = True
        td_change[1:] = (t_codes[1:] != t_codes[:-1]) | (docs_all[1:] != docs_all[:-1])
        td_starts = np.nonzero(td_change)[0]
        tfs_all = np.diff(np.append(td_starts, len(fdf)))
        docs_td = docs_all[td_starts]
        tcodes_td = t_codes[td_starts]
        # per-term ranges over the (term, doc) axis
        t_change = np.empty(len(td_starts), dtype=bool)
        t_change[0] = True
        t_change[1:] = tcodes_td[1:] != tcodes_td[:-1]
        t_starts = np.nonzero(t_change)[0]
        t_ends = np.append(t_starts[1:], len(td_starts))
        # flat-position ranges per term
        pos_starts = td_starts[t_starts]
        pos_ends = np.append(td_starts[t_starts[1:]], len(fdf))

        rows = []
        for ti in range(len(t_starts)):
            lo, hi = t_starts[ti], t_ends[ti]
            term = str(t_uniques[tcodes_td[t_starts[ti]]])
            d = docs_td[lo:hi]
            tf = tfs_all[lo:hi]
            fn = fn_ids_per_doc[d]
            term_pos = pos_all[pos_starts[ti]:pos_ends[ti]] if with_positions else None
            # chunk split
            for c0 in range(0, len(d), CHUNK_DOCS):
                c1 = min(c0 + CHUNK_DOCS, len(d))
                db, tb, fb, meta = codec.encode_postings(d[c0:c1], tf[c0:c1], fn[c0:c1], cache)
                if with_positions:
                    p_lo = int(tf[:c0].sum())
                    p_hi = p_lo + int(tf[c0:c1].sum())
                    pb = codec.encode_positions(term_pos[p_lo:p_hi], tf[c0:c1])
                else:
                    pb = None
                m = list(zip(*meta))
                rows.append((
                    seg, term, c0 // CHUNK_DOCS, c1 - c0, int(tf[c0:c1].sum()),
                    db, tb, fb, pb,
                    list(m[0]), list(m[1]), list(m[2]), list(m[3]), list(m[4]), list(m[5]),
                ))
        return pd.DataFrame(rows, columns=list(_EMPTY_POSTINGS.keys()))

    return build_segment


_EMPTY_POSTINGS = {
    "segment_ord": "int32", "term": "object", "chunk_id": "int32",
    "doc_freq": "int64", "total_tf": "int64",
    "docs": "object", "tfs": "object", "fns": "object", "pos": "object",
    "last_docs": "object", "n_docs": "object", "bits_doc": "object",
    "bits_tf": "object", "wand_fn": "object", "wand_tf": "object",
}


def build_index(spark: SparkSession, df: DataFrame, out_dir: str,
                cfg: IndexConfig | None = None, resume: bool = True) -> dict:
    """Build (or resume building) an index from a pages-like DataFrame.

    Returns the manifest dict (also written to ``{out_dir}/meta.json``).
    """
    cfg = cfg or IndexConfig()
    os.makedirs(out_dir, exist_ok=True)
    manifest_path = os.path.join(out_dir, "meta.json")
    manifest: dict = {"version": 1, "config": asdict(cfg), "stages": {}}
    if resume and os.path.exists(manifest_path):
        with open(manifest_path) as f:
            old = json.load(f)
        if old.get("config") == manifest["config"]:
            manifest = old
        else:
            resume = False  # config changed: full rebuild

    docs = _segmented_docs(df, cfg)

    # ---- stage: docmap (DocAddress assignment + fieldnorms) -------------
    t0 = time.time()
    if not (resume and _stage_done(out_dir, "docmap")):
        from tantivy_spark.analyzer import fieldnorm_col
        w = Window.partitionBy("segment_ord").orderBy("key")
        docmap = docs.select(
            "segment_ord", "key",
            fieldnorm_col(F.col("text")).alias("num_tokens"),
        ).withColumn("doc_id", (F.row_number().over(w) - 1).cast("int")) \
         .select("segment_ord", "doc_id", "key", "num_tokens")
        docmap.write.mode("overwrite").parquet(os.path.join(out_dir, "docmap"))
        manifest["stages"]["docmap"] = {"wall_sec": time.time() - t0, "status": "done"}
        _write_manifest(manifest_path, manifest)

    # ---- stage: postings (per-segment Arrow kernel) ----------------------
    t0 = time.time()
    if not (resume and _stage_done(out_dir, "postings")):
        postings = (
            docs.groupBy("segment_ord")
            .applyInPandas(_segment_kernel(cfg), schema=POSTINGS_SCHEMA)
        )
        postings.write.mode("overwrite").parquet(os.path.join(out_dir, "postings"))
        manifest["stages"]["postings"] = {"wall_sec": time.time() - t0, "status": "done"}
        _write_manifest(manifest_path, manifest)

    # ---- stage: term_stats + lineage -------------------------------------
    t0 = time.time()
    if not (resume and _stage_done(out_dir, "term_stats")):
        postings = spark.read.parquet(os.path.join(out_dir, "postings"))
        (postings.groupBy("term")
         .agg(F.sum("doc_freq").alias("doc_freq"), F.sum("total_tf").alias("total_tf"))
         .write.mode("overwrite").parquet(os.path.join(out_dir, "term_stats")))
        manifest["stages"]["term_stats"] = {"wall_sec": time.time() - t0, "status": "done"}
        _write_manifest(manifest_path, manifest)

    t0 = time.time()
    if not (resume and _stage_done(out_dir, "lineage")):
        postings = spark.read.parquet(os.path.join(out_dir, "postings"))
        docmap = spark.read.parquet(os.path.join(out_dir, "docmap"))
        lin_p = postings.groupBy("segment_ord").agg(
            F.lit("postings").alias("stage"),
            F.count("*").alias("rows"),
            (F.sum(F.octet_length("docs")) + F.sum(F.octet_length("tfs"))
             + F.sum(F.octet_length("fns"))
             + F.sum(F.coalesce(F.octet_length("pos"), F.lit(0)))).alias("bytes"),
            F.sum("doc_freq").alias("postings"),
        )
        lin_d = docmap.groupBy("segment_ord").agg(
            F.lit("docmap").alias("stage"),
            F.count("*").alias("rows"),
            F.sum("num_tokens").alias("bytes"),
            F.count("*").alias("postings"),
        )
        lin_p.unionByName(lin_d).write.mode("overwrite").parquet(os.path.join(out_dir, "lineage"))
        manifest["stages"]["lineage"] = {"wall_sec": time.time() - t0, "status": "done"}
        _write_manifest(manifest_path, manifest)

    # ---- totals -----------------------------------------------------------
    if "totals" not in manifest:
        docmap = spark.read.parquet(os.path.join(out_dir, "docmap"))
        tot = docmap.agg(
            F.count("*").alias("num_docs"),
            F.sum("num_tokens").alias("total_num_tokens"),
            F.countDistinct("segment_ord").alias("num_segments"),
        ).collect()[0]
        num_docs = tot["num_docs"] or 0
        total_tokens = int(tot["total_num_tokens"] or 0)
        manifest["totals"] = {
            "num_docs": num_docs,
            "total_num_tokens": total_tokens,
            "num_segments": tot["num_segments"],
            "avg_fieldnorm": (total_tokens / num_docs) if num_docs else 0.0,
        }
        wall = sum(s.get("wall_sec", 0.0) for s in manifest["stages"].values())
        manifest["metrics"] = {
            "build_wall_sec": wall,
            "docs_per_sec": (num_docs / wall) if wall > 0 else None,
            "tokens_per_sec": (total_tokens / wall) if wall > 0 else None,
        }
        _write_manifest(manifest_path, manifest)
    return manifest


def _write_manifest(path: str, manifest: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, default=str)
    os.replace(tmp, path)  # atomic publish, analogue of meta.json swap
