"""Capture .explain("formatted") for every round-8-touched query, into
plans/r08/<name>_<tag>.txt.

Usage: python scripts/capture_plans_r08.py <tag> [repo_root]
  tag        'before' (run with repo_root = a worktree at the round-start
             commit) or 'after' (current tree)
  repo_root  package root to import from (default: this repo)

Only builds plans — no jobs beyond tiny setup reads (the big corpus and
stores must already exist in /dev/shm from bench_extra/bench runs).
"""

from __future__ import annotations

import os
import sys

TAG = sys.argv[1] if len(sys.argv) > 1 else "after"
ROOT = os.path.abspath(sys.argv[2]) if len(sys.argv) > 2 else \
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_DIR = os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "plans", "r08")
sys.path.insert(0, ROOT)
os.makedirs("/dev/shm/spark_local", exist_ok=True)
os.environ.setdefault("SPARK_LOCAL_DIRS", "/dev/shm/spark_local")
os.makedirs(OUT_DIR, exist_ok=True)

from pyspark.sql import functions as F  # noqa: E402


def save(df, name):
    p = os.path.join(OUT_DIR, f"{name}_{TAG}.txt")
    with open(p, "w") as fh:
        fh.write(df._jdf.queryExecution().explainString(
            df._sc._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted")))
    print(f"-> {p}", flush=True)


def main():
    from tantivy_spark.session import get_spark
    spark = get_spark("plans_r08", master="local[8]",
                      shuffle_partitions=8)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as e

    # declared queries touched this round (same shapes the driver runs)
    for name in ["substring_dedup_docs", "minhash_lsh_pairs",
                 "simhash_near_dup_pairs", "incremental_dedup_docs",
                 "simhash_incremental_docs", "search_phrase",
                 "search_phrase_prefix"]:
        try:
            save(e.queries()[name](spark, sf_dir), name)
        except Exception as ex:
            print(f"SKIP {name}: {type(ex).__name__}: {ex}", flush=True)

    # bench-row big shapes (corpus + stores from earlier bench runs)
    corpus = "/dev/shm/tantivy_bench_corpus_800000"
    if os.path.exists(os.path.join(corpus, "_SUCCESS")):
        from tantivy_spark.pipeline.dedup import (
            band_signatures, dedup_against, dedup_substrings,
            minhash_signatures, simhash64, simhash_dedup_against)
        docs = spark.read.parquet(corpus).select("url", "text")
        keyed = docs.select(F.xxhash64("url").alias("doc_id"), "text")
        sub_base = keyed.filter(F.pmod(F.col("doc_id"), F.lit(4)) == 0)
        sub = sub_base.union(
            sub_base.filter(F.col("doc_id") % 50 == 0)
            .select((F.col("doc_id") + F.lit(1)).alias("doc_id"), "text"))
        save(dedup_substrings(sub, min_len=20), "big_substring_dedup")
        new_batch = (keyed.filter(F.col("doc_id") % 50 == 0)
                     .select((F.col("doc_id") + F.lit(1)).alias("doc_id"),
                             "text"))
        sig_store = "/dev/shm/tantivy_bench_sigs_800000"
        band_store = "/dev/shm/tantivy_bench_sigbands_800000"
        if os.path.exists(os.path.join(band_store, "_SUCCESS")):
            ref_sigs = spark.read.parquet(sig_store)
            ref_bands = spark.read.parquet(band_store)
            save(dedup_against(new_batch, ref_sigs, num_hashes=32, bands=8,
                               rows_per_band=4, threshold=0.5,
                               ref_bands=ref_bands),
                 "big_incremental_dedup_prebuilt")
        sh_store = "/dev/shm/tantivy_bench_shchunks_800000"
        if os.path.exists(os.path.join(sh_store, "_SUCCESS")):
            sh_ref = spark.read.parquet(sh_store)
            save(simhash_dedup_against(simhash64(new_batch), sh_ref,
                                       max_hamming=3),
                 "big_simhash_admission")
    spark.stop()


if __name__ == "__main__":
    main()
