"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is the total wall time of the headline query suite (lower is
better).  The index build is timed separately and reported inside
``queries`` as build_docs_per_sec plus per-query latencies.

Scaling-efficiency evidence (north rule: >=0.8 going N -> 4N executors)
is produced by scripts/scaling.py, which runs this same build at
local[8] and local[32] in separate processes and appends the measured
efficiency to BENCH_SCALING.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # shuffle/spill on shm, like scripts/scaling.py — must precede the JVM
    os.makedirs("/dev/shm/spark_local", exist_ok=True)
    os.environ.setdefault("SPARK_LOCAL_DIRS", "/dev/shm/spark_local")

    from pyspark.sql import functions as F

    import __spark_entry__ as e
    from tantivy_spark.index.build import IndexConfig, build_index
    from tantivy_spark.index.reader import IndexReader
    from tantivy_spark.query import (
        BooleanQuery, Occur, PhraseQuery, TermQuery,
    )
    from tantivy_spark.query.exact import ExactSearcher
    from tantivy_spark.session import get_spark

    from tantivy_spark.session import warmup_python_workers

    spark = get_spark("bench", master=f"local[{cpus}]")
    warmup_python_workers(spark)

    timings: dict[str, float] = {}

    # ---- index build (fresh, no cache) ---------------------------------
    out = f"/tmp/tantivy_spark_bench_idx_{os.path.basename(sf_dir.rstrip('/'))}"
    shutil.rmtree(out, ignore_errors=True)
    docs = e._documents_as_keyed(spark, sf_dir)
    n_docs = docs.count()
    t0 = time.time()
    build_index(spark, docs, out,
                IndexConfig(key_col="key", text_col="text",
                            n_segments=int(cpus) if cpus.isdigit() else 32,
                            segment_expr=None), resume=False)
    build_sec = time.time() - t0
    timings["index_build"] = round(build_sec, 3)
    timings["build_docs_per_sec"] = round(n_docs / build_sec, 1)

    searcher = ExactSearcher(IndexReader(spark, out))

    # ---- headline queries ------------------------------------------------
    suite = {
        "q_term_top10": lambda: searcher.search(TermQuery("the"), k=10).collect(),
        "q_and_top10": lambda: searcher.search(
            BooleanQuery([(Occur.MUST, TermQuery("fast")),
                          (Occur.MUST, TermQuery("scan"))]), k=10).collect(),
        "q_or_top10": lambda: searcher.search(
            BooleanQuery([(Occur.SHOULD, TermQuery("fast")),
                          (Occur.SHOULD, TermQuery("slow"))]), k=10).collect(),
        "q_phrase_top10": lambda: searcher.search(
            PhraseQuery(["order", "sort"]), k=10).collect(),
        "q_wand_or_top10": lambda: __import__(
            "tantivy_spark.query.wand", fromlist=["wand_topk"]
        ).wand_topk(searcher.reader, ["fast", "slow"], k=10, mode="or").collect(),
        "q_wand_and_top10": lambda: __import__(
            "tantivy_spark.query.wand", fromlist=["wand_topk"]
        ).wand_topk(searcher.reader, ["fast", "scan"], k=10, mode="and").collect(),
        "q_count_and": lambda: searcher.count(
            BooleanQuery([(Occur.MUST, TermQuery("fast")),
                          (Occur.MUST, TermQuery("scan"))])),
        "agg_terms": lambda: e.agg_terms_events(spark, sf_dir).collect(),
        "agg_date_hist": lambda: e.agg_date_histogram(spark, sf_dir).collect(),
        "agg_stats": lambda: e.agg_stats_value(spark, sf_dir).collect(),
        "dedup_exact": lambda: e.dedup_exact_docs(spark, sf_dir).collect(),
        "minhash_lsh": lambda: e.minhash_lsh_pairs(spark, sf_dir).collect(),
        "ann_cosine": lambda: e.ann_cosine_topk(spark, sf_dir).collect(),
        "token_counts": lambda: e.token_counts_docs(spark, sf_dir).count(),
    }
    total = build_sec
    for name, fn in suite.items():
        t0 = time.time()
        fn()
        dt = time.time() - t0
        timings[name] = round(dt, 3)
        total += dt

    # ---- throughput regime: 800k-doc synthetic corpus -------------------
    # The sf0.1 numbers above are fixed-overhead-dominated (5k docs); this
    # regime measures the engine itself: build docs/sec and query latency
    # where posting lists are long enough for pruning to matter.
    big_n = int(os.environ.get("SPARK_GRAFT_BIG_DOCS", "800000"))
    if big_n > 0:
        from tantivy_spark.corpus import synthetic_pages
        from tantivy_spark.query.wand import wand_topk

        corpus_path = f"/dev/shm/tantivy_bench_corpus_{big_n}"
        if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
            synthetic_pages(spark, big_n).repartition(64) \
                .write.mode("overwrite").parquet(corpus_path)
        docs_big = spark.read.parquet(corpus_path).select("url", "text")
        docs_big.count()  # warm the input read before timing the build
        out_big = "/dev/shm/tantivy_bench_idx"
        # best-of-2: this sandbox shows external load spikes that can
        # stretch a single run several-fold; the min is the engine number
        big_build = None
        for _trial in range(2):
            shutil.rmtree(out_big, ignore_errors=True)
            t0 = time.time()
            build_index(spark, docs_big, out_big, IndexConfig(
                key_col="url", text_col="text",
                n_segments=int(cpus) if cpus.isdigit() else 32), resume=False)
            dt = time.time() - t0
            big_build = dt if big_build is None else min(big_build, dt)
        timings["big_build_sec"] = round(big_build, 3)
        timings["big_build_docs_per_sec"] = round(big_n / big_build, 1)

        big_reader = IndexReader(spark, out_big)
        big_suite = {
            "big_wand_or": lambda: wand_topk(
                big_reader, ["the", "of"], k=10, mode="or").collect(),
            "big_wand_or_seeded": lambda: wand_topk(
                big_reader, ["the", "of"], k=10, mode="or",
                seed_threshold=True).collect(),
            "big_wand_and": lambda: wand_topk(
                big_reader, ["the", "of"], k=10, mode="and").collect(),
            "big_exact_term": lambda: ExactSearcher(big_reader).search(
                TermQuery("the"), k=10).collect(),
        }
        for name, fn in big_suite.items():
            t0 = time.time()
            fn()
            timings[name] = round(time.time() - t0, 3)

        # pipeline throughput over the big corpus (docs/sec)
        from tantivy_spark.pipeline.dedup import simhash64
        from tantivy_spark.pipeline.textstats import token_counts
        keyed = docs_big.select(F.xxhash64("url").alias("doc_id"), "text")
        t0 = time.time()
        simhash64(keyed).count()
        dt = time.time() - t0
        timings["big_simhash_sec"] = round(dt, 3)
        timings["big_simhash_docs_per_sec"] = round(big_n / dt, 1)
        t0 = time.time()
        token_counts(keyed).count()
        dt = time.time() - t0
        timings["big_token_counts_sec"] = round(dt, 3)
        timings["big_token_counts_docs_per_sec"] = round(big_n / dt, 1)

    print(json.dumps({
        "metric": "index_build_plus_query_suite_wall",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "cpus": cpus,
        "n_docs": n_docs,
        "big_n_docs": big_n,
    }))


if __name__ == "__main__":
    main()
