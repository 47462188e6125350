"""Index sorting (sort_by_field analogue) + compaction-policy tests."""

import pytest
from pyspark.sql import functions as F

from tantivy_spark.corpus import synthetic_pages
from tantivy_spark.index.build import IndexConfig, build_index
from tantivy_spark.index.reader import IndexReader
from tantivy_spark.query import TermQuery
from tantivy_spark.query.exact import ExactSearcher


def test_index_sorting_orders_docids(spark, tmp_path_factory):
    pages = synthetic_pages(spark, 150, seed=21).select(
        "url", "text", F.octet_length("text").alias("tlen"))
    out = str(tmp_path_factory.mktemp("soidx") / "s")
    build_index(spark, pages, out, IndexConfig(
        key_col="url", text_col="text", n_segments=2, sort_col="desc:tlen"))
    reader = IndexReader(spark, out)
    # doc ids within each segment must follow descending text length
    dm = reader.docmap.join(
        pages.select(F.col("url").alias("key"), "tlen"), "key")
    rows = dm.orderBy("segment_ord", "doc_id").collect()
    by_seg = {}
    for r in rows:
        by_seg.setdefault(r["segment_ord"], []).append(r["tlen"])
    for seg, lens in by_seg.items():
        assert lens == sorted(lens, reverse=True), seg
    # search still works and matches an unsorted build's result keys
    out2 = str(tmp_path_factory.mktemp("soidx2") / "u")
    build_index(spark, pages, out2, IndexConfig(
        key_col="url", text_col="text", n_segments=2))
    a = ExactSearcher(reader).search(TermQuery("the"), k=8).collect()
    b = ExactSearcher(IndexReader(spark, out2)).search(TermQuery("the"), k=8).collect()
    assert sorted(r["key"] for r in a) == sorted(r["key"] for r in b)
    for ra in a:
        match = [rb for rb in b if rb["key"] == ra["key"]]
        assert match and ra["score"] == pytest.approx(match[0]["score"], rel=1e-12)


def test_maybe_compact_policy(spark, tmp_path_factory):
    from tantivy_spark.index.merge import maybe_compact

    pages = synthetic_pages(spark, 100, seed=22).select("url", "text")
    out = str(tmp_path_factory.mktemp("cidx") / "i")
    build_index(spark, pages, out, IndexConfig(key_col="url", text_col="text",
                                               n_segments=6))
    dest = str(tmp_path_factory.mktemp("cidx2") / "m")
    # threshold above current count: no-op
    assert maybe_compact(spark, out, dest, max_segments=10) is None
    # threshold below: compacts down to the target tier (NOT to one —
    # per-segment query kernels parallelize by segment)
    m = maybe_compact(spark, out, dest, max_segments=3, n_target_segments=2)
    assert m is not None
    assert IndexReader(spark, dest).manifest["totals"]["num_segments"] == 2
