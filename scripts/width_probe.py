"""Build the big bench index ONCE at a given local[N] width in a fresh
JVM and print one JSON line {"cpus": N, "build_sec": s, "docs_per_sec":
d, "load_before": [...], "load_after": [...]}.

Run by bench.py as a subprocess so the width probe gets its own Spark
master (one JVM cannot change local[N] after startup).

Usage: python scripts/width_probe.py <corpus_parquet_path> <cpus>
       [n_segments] [trials]

``n_segments`` defaults to 32 and should match the main bench's big
build, so the probe varies ONLY executor-thread width — the produced
index is identical (the same discipline as scripts/scaling.py, which
pins 128 segments across widths).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    corpus_path, cpus = sys.argv[1], sys.argv[2]
    n_segments = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    n_trials = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    os.makedirs("/dev/shm/spark_local", exist_ok=True)
    os.environ.setdefault("SPARK_LOCAL_DIRS", "/dev/shm/spark_local")

    from tantivy_spark.index.build import IndexConfig, build_index
    from tantivy_spark.session import get_spark, warmup_python_workers

    spark = get_spark(f"width_probe_{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    warmup_python_workers(spark)
    docs = spark.read.parquet(corpus_path).select("url", "text")
    n = docs.count()  # warm the input read before timing
    out = f"/dev/shm/tantivy_width_probe_idx_{cpus}"
    load_before = [round(x, 2) for x in os.getloadavg()]
    trials = []
    for _ in range(n_trials):  # best-of-N, same discipline as the bench
        shutil.rmtree(out, ignore_errors=True)
        t0 = time.time()
        build_index(spark, docs, out, IndexConfig(
            key_col="url", text_col="text", n_segments=n_segments),
            resume=False)
        trials.append(round(time.time() - t0, 3))
    shutil.rmtree(out, ignore_errors=True)
    dt = min(trials)
    print(json.dumps({
        "cpus": int(cpus),
        "n_segments": n_segments,
        "n_docs": n,
        "build_sec": dt,
        "trials": trials,
        "docs_per_sec": round(n / dt, 1),
        "load_before": load_before,
        "load_after": [round(x, 2) for x in os.getloadavg()],
    }))


if __name__ == "__main__":
    main()
