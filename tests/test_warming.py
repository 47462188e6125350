"""Warmer + generation GC on the reloading reader (ref:
src/reader/warming.rs test_warming): registered warmers run against
every NEW reader generation BEFORE it is published, and retiring a
generation releases its pinned tables (the WarmingState GC)."""

from pyspark.sql import functions as F

from tantivy_spark.corpus import synthetic_pages
from tantivy_spark.index.build import IndexConfig, build_index
from tantivy_spark.index.reader import ReloadingReader


def _build(spark, out, n):
    pages = synthetic_pages(spark, n, seed=5).select("url", "text")
    build_index(spark, pages, out,
                IndexConfig(key_col="url", text_col="text", n_segments=2),
                resume=False)


def test_warmers_run_per_generation_and_gc(spark, tmp_path):
    out = str(tmp_path / "widx")
    _build(spark, out, 120)

    calls = []                                   # (warmer_id, num_docs)
    warm1 = lambda r: (r.warm(), calls.append((1, r.num_docs)))  # noqa: E731
    warm2 = lambda r: calls.append((2, r.num_docs))              # noqa: E731

    rr = ReloadingReader(spark, out, delay_s=0.0, warmers=[warm1, warm2])
    gen1 = rr.reader()
    # warming.rs: one warm per warmer per generation, before publishing
    assert calls == [(1, 120), (2, 120)]
    assert gen1.term_stats.storageLevel.useMemory   # pinned by warm1

    # new commit -> new generation: warmers re-run with the NEW doc
    # count; the retiring generation is GC'd (unpersisted) BEFORE the
    # new one warms — Spark keys caches by plan, and same-dir
    # generations share plans, so the fresh generation's pins survive
    _build(spark, out, 200)
    gen2 = rr.reader()
    assert calls == [(1, 120), (2, 120), (1, 200), (2, 200)]
    assert gen2.num_docs == 200
    assert gen2.term_stats.storageLevel.useMemory
    # the retired reader object stays USABLE (falls back to parquet)
    assert gen1.num_docs == 120

    # no manifest change -> same snapshot, no extra warms
    assert rr.reader() is gen2
    assert len(calls) == 4


def test_unpersist_releases_pins(spark, tmp_path):
    """The WarmingState garbage_collect analogue, unit-level: warm()
    pins, unpersist() releases, the reader stays usable."""
    from tantivy_spark.index.reader import IndexReader

    out = str(tmp_path / "gidx")
    _build(spark, out, 50)
    r = IndexReader(spark, out).warm()
    assert r.term_stats.storageLevel.useMemory
    assert r.docmap.storageLevel.useMemory
    r.unpersist()
    assert not r.term_stats.storageLevel.useMemory
    assert not r.docmap.storageLevel.useMemory
    assert r.term_stats.count() > 0


def test_manual_policy_never_auto_reloads(spark, tmp_path):
    out = str(tmp_path / "midx")
    _build(spark, out, 60)
    rr = ReloadingReader(spark, out, delay_s=None)
    gen1 = rr.reader()
    _build(spark, out, 90)
    assert rr.reader() is gen1                   # Manual: no auto pickup
    assert rr.reload().num_docs == 90            # explicit reload only
