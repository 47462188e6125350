"""Checkpoint-resume invariants: a build interrupted after any stage can
resume and produce an index byte-identical (content-wise) to an
uninterrupted build (north rule: resumable from checkpoint with
per-partition lineage)."""

import json
import os
import shutil

from pyspark.sql import functions as F

from tantivy_spark.corpus import synthetic_pages
from tantivy_spark.index.build import IndexConfig, build_index


def _content_hash(spark, path, order_cols):
    df = spark.read.parquet(path).orderBy(*order_cols)
    binish = [f.name for f in df.schema.fields if f.dataType.simpleString() == "binary"]
    cols = [F.md5(F.col(c)).alias(c) if c in binish else F.col(c) for c in df.columns]
    pdf = df.select(cols).toPandas()
    import hashlib
    return hashlib.md5(pdf.to_csv(index=False).encode()).hexdigest()


def _cfg():
    return IndexConfig(key_col="url", text_col="text", n_segments=4)


def test_kill_and_resume_identical(spark, tmp_path_factory):
    pages = synthetic_pages(spark, 300, seed=5).select("url", "text")
    base = str(tmp_path_factory.mktemp("ridx"))
    full = os.path.join(base, "full")
    resumed = os.path.join(base, "resumed")

    build_index(spark, pages, full, _cfg())

    # simulate a crash between the postings stage and the stats stages:
    # copy only the first two stage outputs, then resume
    os.makedirs(resumed)
    for stage in ("docmap", "postings"):
        shutil.copytree(os.path.join(full, stage), os.path.join(resumed, stage))
    with open(os.path.join(full, "meta.json")) as f:
        m = json.load(f)
    crash_manifest = {
        "version": m["version"], "config": m["config"],
        "stages": {k: v for k, v in m["stages"].items()
                   if k in ("docmap", "postings")},
    }
    with open(os.path.join(resumed, "meta.json"), "w") as f:
        json.dump(crash_manifest, f)

    m2 = build_index(spark, pages, resumed, _cfg(), resume=True)

    assert m2["totals"] == m["totals"]
    for sub, order in [("postings", ["segment_ord", "term", "chunk_id"]),
                       ("docmap", ["segment_ord", "doc_id"]),
                       ("term_stats", ["term"]),
                       ("lineage", ["segment_ord"])]:
        assert _content_hash(spark, os.path.join(full, sub), order) == \
            _content_hash(spark, os.path.join(resumed, sub), order), sub


def test_lineage_metrics_present(spark, tiny_index):
    lin = spark.read.parquet(os.path.join(tiny_index.index_dir, "lineage"))
    rows = lin.collect()
    assert len(rows) == tiny_index.manifest["totals"]["num_segments"]
    assert all(r["n_docs"] is not None and r["bytes"] > 0 for r in rows)
    metrics = tiny_index.manifest["metrics"]
    assert metrics["docs_per_sec"] and metrics["build_wall_sec"] > 0


def test_rebuild_from_scratch_is_deterministic(spark, tmp_path_factory):
    pages = synthetic_pages(spark, 300, seed=5).select("url", "text")
    a = str(tmp_path_factory.mktemp("d1") / "a")
    b = str(tmp_path_factory.mktemp("d2") / "b")
    build_index(spark, pages, a, _cfg())
    build_index(spark, pages, b, _cfg())
    assert _content_hash(spark, f"{a}/postings", ["segment_ord", "term", "chunk_id"]) \
        == _content_hash(spark, f"{b}/postings", ["segment_ord", "term", "chunk_id"])
