"""Indexed fast fields: columns stored ON the docmap (the per-segment
columnar store, analogue of the reference's fast-field files) and the
query-scoped aggregation surface (aggregations as collectors over a
query's doc set, ref src/aggregation/)."""

import pytest
from pyspark.sql import functions as F

from tantivy_spark.index.build import IndexConfig, build_index
from tantivy_spark.index.reader import IndexReader
from tantivy_spark.query import TermQuery
from tantivy_spark.query.ast import FastFieldRangeQuery
from tantivy_spark.query.exact import ExactSearcher
from tantivy_spark.query.searcher import Searcher

SF = "/root/testdata/sf0.001"


def _keyed_docs(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return docs.select(
        F.format_string("%010d", F.col("doc_id")).alias("key"),
        "doc_id", "text", "n_chars", "lang")


@pytest.fixture(scope="module")
def ff_searcher(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ff") / "idx")
    cfg = IndexConfig(key_col="key", text_col="text", n_segments=4,
                      segment_expr="pmod(doc_id, 4)",
                      fast_field_cols=["n_chars", "lang"])
    build_index(spark, _keyed_docs(spark), out, cfg)
    return ExactSearcher(IndexReader(spark, out))


def test_indexed_fastfield_range_joinfree(spark, ff_searcher):
    """Range over an indexed fast field resolves on the docmap scan —
    no set_fast_fields, no join — and the predicate pushes to parquet."""
    q = FastFieldRangeQuery("n_chars", 500, 1500)
    got = ff_searcher.count(q)
    want = (spark.read.parquet(f"{SF}/documents.parquet")
            .filter((F.col("n_chars") >= 500) & (F.col("n_chars") <= 1500))
            .count())
    assert got == want > 0
    plan = ff_searcher.matching(q)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "GreaterThanOrEqual(n_chars,500)" in plan  # pushed to the scan
    assert "Join" not in plan


def test_fastfield_intersects_with_text_query(spark, ff_searcher):
    from tantivy_spark.query import BooleanQuery, Occur

    q = BooleanQuery([(Occur.MUST, TermQuery("data")),
                      (Occur.MUST, FastFieldRangeQuery("n_chars", 500, 1500))])
    got = ff_searcher.count(q)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    toks = F.split(F.lower(F.col("text")), r"[^\p{L}\p{N}]+")
    want = docs.filter(F.array_contains(toks, "data")
                       & (F.col("n_chars") >= 500)
                       & (F.col("n_chars") <= 1500)).count()
    assert got == want > 0


def test_parsed_typed_range_over_indexed_fastfield(ff_searcher):
    from tantivy_spark.query.parser import QueryParser

    p = QueryParser(field_types={"n_chars": "i64"})
    q = p.parse("n_chars:[500 TO 1500]")
    assert q == FastFieldRangeQuery("n_chars", 500, 1500)
    assert ff_searcher.count(q) == \
        ff_searcher.count(FastFieldRangeQuery("n_chars", 500, 1500))


def test_aggregate_over_query_matches(spark, ff_searcher):
    """Searcher.aggregate: ES request tree over the query's doc set using
    the indexed fast fields."""
    s = Searcher(ff_searcher.reader)
    req = {"by_lang": {"terms": {"field": "lang", "size": 5},
                       "aggs": {"av": {"avg": {"field": "n_chars"}}}}}
    got = {(r["key"], r["doc_count"], round(r["av.value"], 4))
           for r in s.aggregate(TermQuery("data"), req)["by_lang"].collect()}

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    toks = F.split(F.lower(F.col("text")), r"[^\p{L}\p{N}]+")
    want = {(r["lang"], r["cnt"], round(r["av"], 4)) for r in
            docs.filter(F.array_contains(toks, "data")
                        & F.col("lang").isNotNull())
            .groupBy("lang")
            .agg(F.count("*").alias("cnt"), F.avg("n_chars").alias("av"))
            .orderBy(F.desc("cnt"), F.asc("lang")).limit(5).collect()}
    assert got == want and got


def test_terms_agg_drops_missing_values(spark):
    """ES semantics: docs missing the bucketed field fall out of terms
    buckets (the `missing` agg is the explicit collector for them)."""
    from tantivy_spark.aggs import run_agg_tree

    df = spark.createDataFrame(
        [("a", 1.0), (None, 2.0), ("b", 3.0), ("a", 4.0)],
        "lang STRING, v DOUBLE")
    out = run_agg_tree(df, {"t": {"terms": {"field": "lang"}}})["t"].collect()
    assert {(r["key"], r["doc_count"]) for r in out} == {("a", 2), ("b", 1)}


def test_merge_carries_fast_fields(spark, tmp_path_factory, ff_searcher):
    from tantivy_spark.index.merge import merge_segments

    out = str(tmp_path_factory.mktemp("ff_merged") / "idx")
    merge_segments(spark, ff_searcher.reader.index_dir, out,
                   n_target_segments=2)
    merged = ExactSearcher(IndexReader(spark, out))
    q = FastFieldRangeQuery("n_chars", 500, 1500)
    assert merged.count(q) == ff_searcher.count(q) > 0
    assert set(merged.reader.docmap.columns) >= {"key", "n_chars", "lang"}
