"""One-off: time sorted merge vs stacking merge at the bench shape
(800k docs, 32 segments -> 8) to track the r7 sorted-merge rework."""
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from tantivy_spark.corpus import synthetic_pages
from tantivy_spark.index.build import IndexConfig, build_index
from tantivy_spark.index.merge import merge_segments

cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = (SparkSession.builder.master(f"local[{cpus}]")
         .config("spark.sql.shuffle.partitions", cpus)
         .config("spark.driver.memory", "48g")
         .config("spark.sql.adaptive.enabled", "true")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

big_n = int(os.environ.get("SPARK_GRAFT_BIG_DOCS", "800000"))
corpus_path = f"/dev/shm/tantivy_bench_corpus_{big_n}"
if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
    synthetic_pages(spark, big_n).repartition(64) \
        .write.mode("overwrite").parquet(corpus_path)
docs_big = spark.read.parquet(corpus_path).select("url", "text")
docs_big.count()

out_sorted = "/dev/shm/tantivy_bench_idx_sorted"
shutil.rmtree(out_sorted, ignore_errors=True)
build_index(spark,
            docs_big.withColumn("tlen", F.octet_length("text")),
            out_sorted,
            IndexConfig(key_col="url", text_col="text",
                        n_segments=int(cpus), sort_col="desc:tlen"),
            resume=False)

out_plain = "/dev/shm/tantivy_bench_idx_plain"
shutil.rmtree(out_plain, ignore_errors=True)
build_index(spark, docs_big, out_plain,
            IndexConfig(key_col="url", text_col="text",
                        n_segments=int(cpus)), resume=False)

results = {}
for name, src in (("stacking_merge", out_plain), ("sorted_merge", out_sorted)):
    walls = []
    for _ in range(3):
        out_m = "/dev/shm/tantivy_bench_idx_m"
        shutil.rmtree(out_m, ignore_errors=True)
        t0 = time.time()
        merge_segments(spark, src, out_m, n_target_segments=8)
        walls.append(round(time.time() - t0, 2))
        shutil.rmtree(out_m, ignore_errors=True)
    results[name] = walls

shutil.rmtree(out_sorted, ignore_errors=True)
shutil.rmtree(out_plain, ignore_errors=True)
print("LOADAVG", os.getloadavg())
print("RESULT", results,
      {k: round(big_n / min(v), 1) for k, v in results.items()})
