"""Round-8 optimization micro-benches (guide §1: measure first).

NOT the frozen driver bench (bench.py is untouched); this harness
isolates the expensive operators with noop sinks / targeted actions,
labels jobs, and captures .explain("formatted") to plans/r08/.

Usage: python bench_extra.py <target> [trials]
Targets: merge, sorted_merge, substring, minhash, admission, simhash_admission,
         build, smallq, plans
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
os.makedirs("/dev/shm/spark_local", exist_ok=True)
os.environ.setdefault("SPARK_LOCAL_DIRS", "/dev/shm/spark_local")

PLANS_DIR = os.path.join(REPO, "plans", "r08")
BIG_N = int(os.environ.get("SPARK_GRAFT_BIG_DOCS", "800000"))
CORPUS = f"/dev/shm/tantivy_bench_corpus_{BIG_N}"


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, name, fn, trials=2):
    out = []
    for i in range(trials):
        spark.sparkContext.setJobDescription(f"{name}#{i}")
        t0 = time.time()
        fn()
        out.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"metric": name, "trials": out, "best": min(out),
                      "load": [round(x, 1) for x in os.getloadavg()]}),
          flush=True)
    return min(out)


def save_plan(df, name):
    os.makedirs(PLANS_DIR, exist_ok=True)
    p = os.path.join(PLANS_DIR, name + ".txt")
    with open(p, "w") as fh:
        fh.write(df._jdf.queryExecution().explainString(
            df._sc._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted")))
    print(f"plan -> {p}", flush=True)


def get_session():
    from tantivy_spark.session import get_spark, warmup_python_workers
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("bench_extra", master=f"local[{cpus}]")
    warmup_python_workers(spark)
    return spark


def big_docs(spark):
    from pyspark.sql import functions as F  # noqa: F401
    from tantivy_spark.corpus import synthetic_pages
    if not os.path.exists(os.path.join(CORPUS, "_SUCCESS")):
        synthetic_pages(spark, BIG_N).repartition(64) \
            .write.mode("overwrite").parquet(CORPUS)
    docs = spark.read.parquet(CORPUS).select("url", "text")
    docs.count()
    return docs


def ensure_big_index(spark, docs):
    from tantivy_spark.index.build import IndexConfig, build_index
    out_big = "/dev/shm/tantivy_bench_idx"
    if not os.path.exists(os.path.join(out_big, "meta.json")):
        build_index(spark, docs, out_big,
                    IndexConfig(key_col="url", text_col="text",
                                n_segments=32), resume=False)
    return out_big


def run_merge(spark, docs, trials):
    from tantivy_spark.index.merge import merge_segments
    out_big = ensure_big_index(spark, docs)
    out_m = "/dev/shm/tantivy_bench_idx_merged_x"

    def once():
        shutil.rmtree(out_m, ignore_errors=True)
        m = merge_segments(spark, out_big, out_m, n_target_segments=8)
        print("phases:", m["stages"]["merge"].get("phases"), flush=True)
    timed(spark, "merge_800k_32to8", once, trials)
    shutil.rmtree(out_m, ignore_errors=True)


def run_sorted_merge(spark, docs, trials):
    from pyspark.sql import functions as F
    from tantivy_spark.index.build import IndexConfig, build_index
    from tantivy_spark.index.merge import merge_segments
    out_sorted = "/dev/shm/tantivy_bench_idx_sorted_x"
    if not os.path.exists(os.path.join(out_sorted, "meta.json")):
        build_index(spark, docs.withColumn("tlen", F.octet_length("text")),
                    out_sorted,
                    IndexConfig(key_col="url", text_col="text",
                                n_segments=32, sort_col="desc:tlen"),
                    resume=False)

    def once():
        out_m = "/dev/shm/tantivy_bench_idx_smerged_x"
        shutil.rmtree(out_m, ignore_errors=True)
        m = merge_segments(spark, out_sorted, out_m, n_target_segments=8)
        print("phases:", m["stages"]["merge"].get("phases"), flush=True)
        shutil.rmtree(out_m, ignore_errors=True)
    timed(spark, "sorted_merge_800k_32to8", once, trials)


def run_substring(spark, docs, trials):
    from pyspark.sql import functions as F
    from tantivy_spark.pipeline.dedup import dedup_substrings
    keyed = docs.select(F.xxhash64("url").alias("doc_id"), "text")
    sub_base = keyed.filter(F.pmod(F.col("doc_id"), F.lit(4)) == 0)
    sub_corpus = sub_base.union(
        sub_base.filter(F.col("doc_id") % 50 == 0)
        .select((F.col("doc_id") + F.lit(1)).alias("doc_id"), "text"))
    # rebuild the DataFrame per trial — re-collecting the SAME DataFrame
    # object lets the scheduler skip already-materialized shuffle stages
    # (cached toRdd lineage), which is not what bench.py measures
    timed(spark, "substring_dedup_200k",
          lambda: dedup_substrings(sub_corpus, min_len=20)
          .select(F.sum(F.length("text")).alias("b"),
                  F.sum("n_tokens_removed").alias("rm")).collect(), trials)
    save_plan(dedup_substrings(sub_corpus, min_len=20), "substring_dedup_cur")


def run_minhash(spark, trials):
    import __spark_entry__ as e
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    q = e.minhash_lsh_pairs(spark, sf_dir)
    timed(spark, "minhash_lsh_sf01", lambda: e.minhash_lsh_pairs(
        spark, sf_dir).collect(), trials)
    save_plan(q, "minhash_lsh_cur")
    # big-corpus variant to see the scale shape
    from pyspark.sql import functions as F
    from tantivy_spark.pipeline.dedup import (minhash_lsh_candidates,
                                              minhash_signatures)
    docs = big_docs(spark)
    keyed = docs.select(F.xxhash64("url").alias("doc_id"), "text") \
        .filter(F.pmod(F.col("doc_id"), F.lit(8)) == 0)
    sigs = minhash_signatures(keyed, num_hashes=32)
    cand = minhash_lsh_candidates(sigs, bands=8, rows_per_band=4)
    timed(spark, "minhash_lsh_100k", lambda: minhash_lsh_candidates(
        minhash_signatures(keyed, num_hashes=32),
        bands=8, rows_per_band=4).count(), trials)


def run_admission(spark, docs, trials):
    from pyspark.sql import functions as F
    from tantivy_spark.pipeline.dedup import (band_signatures, dedup_against,
                                              minhash_signatures)
    keyed = docs.select(F.xxhash64("url").alias("doc_id"), "text")
    sig_store = f"/dev/shm/tantivy_bench_sigs_{BIG_N}"
    if not os.path.exists(os.path.join(sig_store, "_SUCCESS")):
        minhash_signatures(keyed, num_hashes=32).write.mode(
            "overwrite").parquet(sig_store)
    band_store = f"/dev/shm/tantivy_bench_sigbands_{BIG_N}"
    if not os.path.exists(os.path.join(band_store, "_SUCCESS")):
        band_signatures(spark.read.parquet(sig_store), bands=8,
                        rows_per_band=4).write.mode(
            "overwrite").parquet(band_store)
    ref_sigs = spark.read.parquet(sig_store)
    ref_bands = spark.read.parquet(band_store)
    new_batch = (keyed.filter(F.col("doc_id") % 50 == 0)
                 .select((F.col("doc_id") + F.lit(1)).alias("doc_id"),
                         "text"))
    new_batch.count()
    # component timings
    timed(spark, "adm_sig_batch_only",
          lambda: noop(minhash_signatures(new_batch, num_hashes=32)), trials)
    timed(spark, "adm_full",
          lambda: dedup_against(new_batch, ref_sigs, num_hashes=32, bands=8,
                                rows_per_band=4, threshold=0.5).count(),
          trials)
    timed(spark, "adm_prebuilt",
          lambda: dedup_against(new_batch, ref_sigs, num_hashes=32, bands=8,
                                rows_per_band=4, threshold=0.5,
                                ref_bands=ref_bands).count(), trials)
    save_plan(dedup_against(new_batch, ref_sigs, num_hashes=32, bands=8,
                            rows_per_band=4, threshold=0.5,
                            ref_bands=ref_bands), "incremental_dedup_cur")


def run_simhash_admission(spark, docs, trials):
    from pyspark.sql import functions as F
    from tantivy_spark.pipeline.dedup import (simhash64, simhash_chunks,
                                              simhash_dedup_against)
    keyed = docs.select(F.xxhash64("url").alias("doc_id"), "text")
    sh_store = f"/dev/shm/tantivy_bench_shchunks_{BIG_N}"
    if not os.path.exists(os.path.join(sh_store, "_SUCCESS")):
        simhash_chunks(simhash64(keyed), max_hamming=3).write.mode(
            "overwrite").parquet(sh_store)
    sh_ref = spark.read.parquet(sh_store)
    new_batch = (keyed.filter(F.col("doc_id") % 50 == 0)
                 .select((F.col("doc_id") + F.lit(1)).alias("doc_id"),
                         "text"))
    timed(spark, "shadm_sig_batch_only",
          lambda: noop(simhash64(new_batch)), trials)
    timed(spark, "shadm_full",
          lambda: simhash_dedup_against(simhash64(new_batch), sh_ref,
                                        max_hamming=3).count(), trials)
    save_plan(simhash_dedup_against(simhash64(new_batch), sh_ref,
                                    max_hamming=3), "simhash_admission_cur")


def run_build(spark, docs, trials):
    from tantivy_spark.index.build import IndexConfig, build_index
    out_big = "/dev/shm/tantivy_bench_idx_x"
    cfg = IndexConfig(key_col="url", text_col="text", n_segments=32)

    def once():
        shutil.rmtree(out_big, ignore_errors=True)
        build_index(spark, docs, out_big, cfg, resume=False)
    timed(spark, "build_800k_32seg", once, trials)
    shutil.rmtree(out_big, ignore_errors=True)


def run_smallq(spark, trials):
    import __spark_entry__ as e
    from tantivy_spark.index.build import IndexConfig, build_index
    from tantivy_spark.index.reader import IndexReader
    from tantivy_spark.query import BooleanQuery, Occur, PhraseQuery, TermQuery
    from tantivy_spark.query.exact import ExactSearcher
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out = "/tmp/tantivy_spark_benchx_idx"
    docs = e._documents_as_keyed(spark, sf_dir)
    cfg = IndexConfig(key_col="key", text_col="text", n_segments=32,
                      fast_field_cols=["n_chars", "lang"])
    if not os.path.exists(os.path.join(out, "meta.json")):
        shutil.rmtree(out, ignore_errors=True)
        build_index(spark, docs, out, cfg, resume=False)
    searcher = ExactSearcher(IndexReader(spark, out))
    # component: doc_freqs lookup alone
    timed(spark, "smallq_doc_freqs",
          lambda: searcher.reader.doc_freqs(["fast", "scan"]), trials)
    timed(spark, "smallq_term", lambda: searcher.search(
        TermQuery("the"), k=10).collect(), trials)
    timed(spark, "smallq_and", lambda: searcher.search(
        BooleanQuery([(Occur.MUST, TermQuery("fast")),
                      (Occur.MUST, TermQuery("scan"))]), k=10).collect(),
          trials)
    timed(spark, "smallq_phrase", lambda: searcher.search(
        PhraseQuery(["order", "sort"]), k=10).collect(), trials)
    save_plan(searcher.search(TermQuery("the"), k=10), "q_term_cur")
    save_plan(searcher.search(PhraseQuery(["order", "sort"]), k=10),
              "q_phrase_cur")


def main():
    target = sys.argv[1] if len(sys.argv) > 1 else "all"
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_session()
    docs = None
    if target in ("merge", "sorted_merge", "substring", "admission",
                  "simhash_admission", "build", "all"):
        docs = big_docs(spark)
    if target in ("merge", "all"):
        run_merge(spark, docs, trials)
    if target in ("sorted_merge", "all"):
        run_sorted_merge(spark, docs, trials)
    if target in ("substring", "all"):
        run_substring(spark, docs, trials)
    if target in ("minhash", "all"):
        run_minhash(spark, trials)
    if target in ("admission", "all"):
        run_admission(spark, docs, trials)
    if target in ("simhash_admission", "all"):
        run_simhash_admission(spark, docs, trials)
    if target in ("build", "all"):
        run_build(spark, docs, trials)
    if target in ("smallq", "all"):
        run_smallq(spark, trials)
    spark.stop()


if __name__ == "__main__":
    main()
