"""spark-submit entry point: build an inverted index from a parquet
table of pages (north rule: runs via ``spark-submit --py-files`` on
multi-executor clusters; resumable; per-partition lineage + metrics).

    spark-submit --py-files dist/tantivy_spark.zip \\
        scripts/build_index_submit.py <input_parquet> <index_dir> \\
        [--key-col url] [--text-col text] [--n-segments 128] \\
        [--fast-fields col1,col2] [--no-resume]

Uses the session spark-submit provides (master/executors come from the
submit command line, NOT from this script).  Prints one JSON line of
build metrics (docs, wall seconds, docs/sec, segment count) read back
from the index manifest + lineage, so orchestration can scrape it.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("input_parquet")
    ap.add_argument("index_dir")
    ap.add_argument("--key-col", default="url")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--n-segments", type=int, default=128)
    ap.add_argument("--fast-fields", default="")
    ap.add_argument("--no-resume", action="store_true")
    args = ap.parse_args()

    # imported AFTER spark-submit has set up sys.path from --py-files
    from pyspark.sql import SparkSession

    from tantivy_spark.index.build import IndexConfig, build_index

    spark = SparkSession.builder.appName("tantivy_spark_build").getOrCreate()
    docs = spark.read.parquet(args.input_parquet)
    n_docs = docs.count()
    cfg = IndexConfig(
        key_col=args.key_col, text_col=args.text_col,
        n_segments=args.n_segments,
        fast_field_cols=[c for c in args.fast_fields.split(",") if c] or None)
    t0 = time.time()
    build_index(spark, docs, args.index_dir, cfg,
                resume=not args.no_resume)
    dt = time.time() - t0
    manifest = json.load(
        open(f"{args.index_dir.rstrip('/')}/meta.json"))
    print(json.dumps({
        "n_docs": n_docs,
        "build_sec": round(dt, 3),
        "docs_per_sec": round(n_docs / dt, 1) if dt > 0 else None,
        "n_segments": manifest.get("totals", {}).get(
            "num_segments", args.n_segments),
        "index_dir": args.index_dir,
    }))


if __name__ == "__main__":
    main()
