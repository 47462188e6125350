"""Scaling-efficiency evidence: run the same index build at two local
parallelism levels (cluster-size proxy per BASELINE.md) and report
throughput at both plus efficiency = (T_N / T_4N) / 4.

The input is a deterministic synthetic webtext corpus (pages schema)
materialized to parquet ONCE and read identically by both levels — big
enough that per-core compute dominates fixed scheduling overheads, which
is the regime the north rule's two-cluster-size criterion describes.

Each level runs in its own subprocess so each gets a fresh JVM with its
own local[N] master.  Results land in BENCH_SCALING.json.

Usage: python scripts/scaling.py [n_docs] [n_low] [n_high]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GEN = r"""
import sys
sys.path.insert(0, {repo!r})
from tantivy_spark.session import get_spark
from tantivy_spark.corpus import synthetic_pages
n_docs = int(sys.argv[1]); path = sys.argv[2]
spark = get_spark("gen", master="local[32]", shuffle_partitions=32)
synthetic_pages(spark, n_docs).repartition(64).write.mode("overwrite").parquet(path)
"""

CHILD = r"""
import json, os, shutil, sys, time
sys.path.insert(0, {repo!r})
os.makedirs("/dev/shm/spark_local", exist_ok=True)
os.environ.setdefault("SPARK_LOCAL_DIRS", "/dev/shm/spark_local")
from tantivy_spark.session import get_spark
from tantivy_spark.index.build import IndexConfig, build_index
from pyspark.sql import functions as F

cores = int(sys.argv[1])
path = sys.argv[2]
from tantivy_spark.session import warmup_python_workers
spark = get_spark(f"scale{{cores}}", master=f"local[{{cores}}]",
                  shuffle_partitions=cores)
warmup_python_workers(spark)  # long-lived executors never pay spawn storms
docs = spark.read.parquet(path).select("url", "text")
n = docs.count()
load_before = [round(x, 2) for x in os.getloadavg()]
trials = []
for trial in range(4):
    out = f"/dev/shm/tantivy_scale_{{cores}}"
    shutil.rmtree(out, ignore_errors=True)
    # segment count fixed across runs so the produced index is identical;
    # parallelism varies only through executor threads
    t0 = time.time()
    build_index(spark, docs, out, IndexConfig(
        key_col="url", text_col="text", n_segments=128), resume=False)
    trials.append(round(time.time() - t0, 3))
best = min(trials)
print(json.dumps({{"cores": cores, "n_docs": n, "sec": best,
                   "docs_per_sec": n / best, "trials": trials,
                   "load_before": load_before,
                   "load_after": [round(x, 2) for x in os.getloadavg()]}}))
"""


def run_level(cores: int, path: str) -> dict:
    script = CHILD.format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", script, str(cores), path],
        capture_output=True, text=True, timeout=3600,
    )
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_low = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_high = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    path = f"/dev/shm/tantivy_scale_corpus_{n_docs}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        gen = subprocess.run(
            [sys.executable, "-c", GEN.format(repo=REPO), str(n_docs), path],
            capture_output=True, text=True, timeout=3600)
        if gen.returncode != 0:
            raise RuntimeError(gen.stderr[-2000:])
    sf_dir = path
    lo = run_level(n_low, path)
    hi = run_level(n_high, path)
    speedup = lo["sec"] / hi["sec"]
    efficiency = speedup / (n_high / n_low)
    result = {
        "sf_dir": sf_dir,
        "low": lo,
        "high": hi,
        "speedup": round(speedup, 3),
        "scale_factor": n_high / n_low,
        "scaling_efficiency": round(efficiency, 3),
        "target": 0.8,
    }
    print(json.dumps(result, indent=1))
    with open(os.path.join(REPO, "BENCH_SCALING.json"), "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
