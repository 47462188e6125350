"""Multivalued fast-field columns and facets through segment merge
(ref: src/indexer/merger.rs:1844 test_merge_multivalued_int_fields_simple
and :1537 test_merge_facets): per-doc value LISTS survive the merge
bit-identically (the reference's values_for_doc assertions), and facet
counts over the merged index equal the pre-merge counts."""

import pytest
from pyspark.sql import functions as F

from tantivy_spark.aggs import run_agg_tree
from tantivy_spark.index.build import IndexConfig, build_index
from tantivy_spark.index.merge import merge_segments
from tantivy_spark.index.reader import IndexReader
from tantivy_spark.query.exact import ExactSearcher

#: the reference vector's doc value lists (merger.rs:1866-1876)
INTVALS = [[1, 2], [1, 2, 3], [4, 5], [1, 2], [1, 5], [3], [17],
           [20], [28, 27], [1_000]]


@pytest.fixture(scope="module")
def mv_merged(spark, tmp_path_factory):
    rows = [(f"d{i:02d}", i, "doc text %d" % i, v)
            for i, v in enumerate(INTVALS)]
    df = spark.createDataFrame(
        rows, "key STRING, i LONG, text STRING, intvals ARRAY<LONG>")
    base = tmp_path_factory.mktemp("mvm")
    src = str(base / "src")
    # 3 segments ~ the reference's three commits
    build_index(spark, df, src,
                IndexConfig(key_col="key", text_col="text", n_segments=3,
                            segment_expr="int(i / 4)",
                            fast_field_cols=["intvals"]),
                resume=False)
    out = str(base / "merged")
    merge_segments(spark, src, out, n_target_segments=1)
    return (ExactSearcher(IndexReader(spark, src)),
            ExactSearcher(IndexReader(spark, out)))


def test_values_for_doc_preserved(mv_merged):
    """merger.rs:1884-1931 — every doc's value LIST (order included)
    reads back identically from the merged segment."""
    _src, merged = mv_merged
    got = {r["key"]: list(r["intvals"])
           for r in merged.reader.docmap.select("key", "intvals").collect()}
    assert got == {f"d{i:02d}": v for i, v in enumerate(INTVALS)}


def test_merged_is_one_segment(mv_merged):
    _src, merged = mv_merged
    assert (merged.reader.docmap.select("segment_ord").distinct().count()
            == 1)


def test_multivalue_agg_identical_after_merge(spark, mv_merged):
    """Per-occurrence terms aggregation over the array fast field gives
    the SAME buckets before and after the merge (the reference asserts
    merged columnar reads equal the pre-merge reads)."""
    src, merged = mv_merged

    def buckets(s):
        out = run_agg_tree(s.reader.docmap,
                           {"t": {"terms": {"field": "intvals",
                                            "size": 100}}})["t"]
        return sorted((int(r["key"]), int(r["doc_count"]))
                      for r in out.collect())

    b = buckets(merged)
    assert b == buckets(src)
    # spot-check the reference data: value 1 occurs in 4 docs, 5 in 2
    d = dict(b)
    assert d[1] == 4 and d[5] == 2 and d[1000] == 1


def test_facet_counts_identical_after_merge(spark, tmp_path_factory):
    """merger.rs:1537 test_merge_facets — hierarchical facet counts over
    the merged index equal the pre-merge counts (the reference asserts
    its facet term dictionary merges without losing or double-counting
    any path)."""
    from tantivy_spark.query import AllQuery
    from tantivy_spark.query.facets import FacetCollector, search_facets

    facets = [["/top/a", "/top/b"], ["/top/a"], ["/top/c"],
              ["/top/a", "/top/c"], ["/top/b"], ["/top/d/e"]]
    rows = [(f"f{i}", i, "text %d" % i, "\n".join(fs))
            for i, fs in enumerate(facets)]
    df = spark.createDataFrame(rows,
                               "key STRING, i LONG, text STRING, fc STRING")
    base = tmp_path_factory.mktemp("fmerge")
    src = str(base / "src")
    build_index(spark, df, src,
                IndexConfig(key_col="key", n_segments=3,
                            segment_expr="pmod(i, 3)",
                            field_cols={"text": "text", "fc": "fc"},
                            field_analyzers={"fc": "facet"}),
                resume=False)
    out = str(base / "merged")
    merge_segments(spark, src, out, n_target_segments=1)

    def counts(idx_dir):
        s = ExactSearcher(IndexReader(spark, idx_dir))
        fc = search_facets(s, AllQuery(),
                           FacetCollector(field="fc").add_facet("/top"))
        return fc.get("/top")

    got = counts(out)
    assert got == counts(src)
    assert dict(got)["/top/a"] == 3 and dict(got)["/top/b"] == 2
