"""IndexRecordOption parity (ref: src/schema/index_record_option.rs):
"basic" indexes docids only — term frequency reads as 1 everywhere, so
BM25 scores as if every match occurred once (the reference's TermScorer
on a Basic field); "freqs" keeps tf but no positions; both reject
positional queries with the schema error."""

import pytest
from pyspark.sql import functions as F

from tantivy_spark.index.build import IndexConfig, build_index
from tantivy_spark.index.reader import IndexReader
from tantivy_spark.query import PhraseQuery, TermQuery
from tantivy_spark.query.exact import ExactSearcher

ROWS = [("a", 0, "data data data merge"),      # tf(data)=3
        ("b", 1, "data merge sort scan"),      # tf(data)=1
        ("c", 2, "sort scan merge join")]


def _build(spark, out, opt):
    df = spark.createDataFrame(ROWS, "key STRING, i LONG, text STRING")
    build_index(spark, df, out,
                IndexConfig(key_col="key", n_segments=1, segment_expr="0",
                            record_option=opt), resume=False)
    return ExactSearcher(IndexReader(spark, out))


def test_basic_scores_with_tf_one(spark, tmp_path):
    """On a Basic field the reference's term_freq() is 1 — docs with
    equal fieldnorm score IDENTICALLY regardless of true tf."""
    s = _build(spark, str(tmp_path / "basic"), "basic")
    got = {r["key"]: r["score"]
           for r in s.search(TermQuery("data"), k=3).collect()}
    assert set(got) == {"a", "b"}
    assert got["a"] == got["b"]        # same fieldnorm (4 tokens), tf=1


def test_freqs_scores_with_true_tf(spark, tmp_path):
    s = _build(spark, str(tmp_path / "freqs"), "freqs")
    got = {r["key"]: r["score"]
           for r in s.search(TermQuery("data"), k=3).collect()}
    assert got["a"] > got["b"]          # tf 3 beats tf 1


def test_freqs_matches_positions_scores(spark, tmp_path):
    """Dropping positions changes NOTHING about scoring — freqs and
    positions builds score identically."""
    s1 = _build(spark, str(tmp_path / "f2"), "freqs")
    s2 = _build(spark, str(tmp_path / "p2"), "positions")
    a = [(r["key"], r["score"]) for r in s1.search(TermQuery("data"),
                                                   k=3).collect()]
    b = [(r["key"], r["score"]) for r in s2.search(TermQuery("data"),
                                                   k=3).collect()]
    assert a == b


@pytest.mark.parametrize("opt", ["basic", "freqs"])
def test_positional_queries_raise(spark, tmp_path, opt):
    s = _build(spark, str(tmp_path / opt), opt)
    with pytest.raises(ValueError, match="does not have positions"):
        s.search(PhraseQuery(["data", "merge"]), k=3).collect()


def test_counts_unaffected(spark, tmp_path):
    s = _build(spark, str(tmp_path / "cnt"), "basic")
    assert s.count(TermQuery("data")) == 2
    assert s.count(TermQuery("merge")) == 3


def test_unknown_option_raises(spark, tmp_path):
    with pytest.raises(ValueError, match="unknown record_option"):
        _build(spark, str(tmp_path / "bad"), "proximity")


def test_freqs_index_merges(spark, tmp_path):
    """Positions-less postings (pos=None chunks) flow through the merge
    kernels unchanged."""
    from tantivy_spark.index.merge import merge_segments

    df = spark.createDataFrame(ROWS, "key STRING, i LONG, text STRING")
    src = str(tmp_path / "src")
    build_index(spark, df, src,
                IndexConfig(key_col="key", n_segments=2,
                            segment_expr="pmod(i, 2)",
                            record_option="freqs"), resume=False)
    out = str(tmp_path / "merged")
    merge_segments(spark, src, out, n_target_segments=1)
    s = ExactSearcher(IndexReader(spark, out))
    got = {r["key"]: r["score"]
           for r in s.search(TermQuery("data"), k=3).collect()}
    want = {r["key"]: r["score"]
            for r in ExactSearcher(IndexReader(spark, src))
            .search(TermQuery("data"), k=3).collect()}
    assert got == want and set(got) == {"a", "b"}
