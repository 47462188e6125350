"""Postings-writer MAX_TOKEN_LEN guard (ref: postings_writer.rs:144-152,
MAX_TOKEN_LEN = u16::MAX - 5 = 65530, tokenizer/mod.rs:168; ports
postings/mod.rs test_index_max_length_token and
test_drop_token_that_are_too_long): tokens longer than MAX_TOKEN_LEN
silently drop at the WRITER — independent of the analyzer chain — and
do not count toward fieldnorms.  The 40-byte RemoveLong belongs only to
the default chain (tokenizer_manager.rs:58-78), so custom chains (raw /
whitespace / facet / json) may index terms far past 40 bytes."""

import pytest
from pyspark.sql import functions as F

from tantivy_spark.index.build import IndexConfig, build_index
from tantivy_spark.index.reader import IndexReader
from tantivy_spark.query import AllQuery, TermQuery
from tantivy_spark.query.exact import ExactSearcher

MAX_TOKEN_LEN = 65530


def _ws_index(spark, out, texts):
    rows = [(f"d{i}", i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "key STRING, i LONG, text STRING")
    build_index(spark, df, out,
                IndexConfig(key_col="key", n_segments=1, segment_expr="0",
                            field_cols={"text": "text"},
                            field_analyzers={"text": "whitespace"}),
                resume=False)
    return ExactSearcher(IndexReader(spark, out))


def test_index_max_length_token(spark, tmp_path):
    """postings/mod.rs:156 — a token of EXACTLY MAX_TOKEN_LEN bytes
    indexes (num_terms == 1, term bytes preserved)."""
    ok = "a" * MAX_TOKEN_LEN
    s = _ws_index(spark, str(tmp_path / "ok"), [ok])
    terms = [r["term"] for r in s.reader.term_stats.collect()]
    assert len(terms) == 1
    assert terms[0].split("\x1f")[-1] == ok   # field prefix precedes
    assert s.count(TermQuery(ok, field="text")) == 1


def test_drop_token_that_are_too_long(spark, tmp_path):
    """postings/mod.rs:188 — MAX_TOKEN_LEN+1 drops silently; the doc's
    other tokens index normally (term dict holds ONLY "hello")."""
    s = _ws_index(spark, str(tmp_path / "drop"),
                  ["a" * (MAX_TOKEN_LEN + 1) + " hello"])
    terms = [r["term"].split("\x1f")[-1]
             for r in s.reader.term_stats.collect()]
    assert terms == ["hello"]
    assert s.count(TermQuery("hello", field="text")) == 1


def test_dropped_token_does_not_count_fieldnorm(spark, tmp_path):
    """postings_writer.rs:140-162 — num_tokens excludes dropped tokens:
    the BM25 score of "hello" in (overlong + hello) equals the score in
    a doc that is ONLY "hello"."""
    s1 = _ws_index(spark, str(tmp_path / "a"),
                   ["a" * (MAX_TOKEN_LEN + 1) + " hello"])
    s2 = _ws_index(spark, str(tmp_path / "b"), ["hello"])
    r1 = s1.search(TermQuery("hello", field="text"), k=1).collect()
    r2 = s2.search(TermQuery("hello", field="text"), k=1).collect()
    assert r1[0]["score"] == r2[0]["score"]


def test_long_json_path_terms_index(spark, tmp_path):
    """Regression for the over-eager 40-byte cap: a json term whose
    PATH pushes the full term past 40 bytes must still index (the
    reference caps only the string-VALUE tokens via the default chain;
    the composed path++value term is bounded by MAX_TOKEN_LEN)."""
    import json as _json

    long_path_doc = _json.dumps(
        {"a_rather_long_outer_attribute_name":
         {"and_a_long_inner_attribute_name": "hit"}})
    rows = [("d0", 0, long_path_doc)]
    df = spark.createDataFrame(rows, "key STRING, i LONG, props STRING")
    out = str(tmp_path / "jlong")
    build_index(spark, df, out,
                IndexConfig(key_col="key", n_segments=1, segment_expr="0",
                            field_cols={"props": "props"},
                            field_analyzers={"props": "json_typed"}),
                resume=False)
    s = ExactSearcher(IndexReader(spark, out))
    path = ("a_rather_long_outer_attribute_name"
            ".and_a_long_inner_attribute_name")
    assert len(f"{path}=hit") > 40
    assert s.count(TermQuery(f"{path}=hit", field="props")) == 1


def test_long_facet_paths_index(spark, tmp_path):
    """Deep facet paths (> 40 bytes) survive — FacetTokenizer has no
    RemoveLong in the reference."""
    from tantivy_spark.query.facets import FacetCollector, search_facets

    fc = "/category/electronics/computers/laptops/gaming_machines"
    assert len(fc) > 40
    rows = [("d0", 0, "some text", fc)]
    df = spark.createDataFrame(rows,
                               "key STRING, i LONG, text STRING, fc STRING")
    out = str(tmp_path / "flong")
    build_index(spark, df, out,
                IndexConfig(key_col="key", n_segments=1, segment_expr="0",
                            field_cols={"text": "text", "fc": "fc"},
                            field_analyzers={"fc": "facet"}),
                resume=False)
    s = ExactSearcher(IndexReader(spark, out))
    got = search_facets(
        s, AllQuery(),
        FacetCollector(field="fc")
        .add_facet("/category/electronics/computers/laptops"))
    assert got.get("/category/electronics/computers/laptops") == \
        [("/category/electronics/computers/laptops/gaming_machines", 1)]


def test_phrase_on_positionless_index_raises(spark, tmp_path):
    """Schema-error parity (phrase_query/mod.rs "field does not have
    positions"): a phrase query against an index built with
    with_positions=False fails LOUDLY on the driver, not with an
    opaque executor decode crash."""
    from tantivy_spark.query import PhraseQuery

    rows = [("a", 0, "order sort merge"), ("b", 1, "sort order x")]
    df = spark.createDataFrame(rows, "key STRING, i LONG, text STRING")
    out = str(tmp_path / "npidx")
    build_index(spark, df, out,
                IndexConfig(key_col="key", n_segments=1, segment_expr="0",
                            with_positions=False), resume=False)
    s = ExactSearcher(IndexReader(spark, out))
    with pytest.raises(ValueError, match="does not have positions"):
        s.search(PhraseQuery(["order", "sort"]), k=5).collect()
    # non-positional queries still work fine
    from tantivy_spark.query import TermQuery
    assert s.count(TermQuery("sort")) == 2
