"""Fast-field tokenizers (ref: TextOptions::set_fast(Some(tokenizer)),
src/fastfield/mod.rs:1208 test_fast_field_tokenizer and :1237
test_text_fast_field_tokenizer): the fast-field tokenizer NORMALIZES
the stored string value — equal normalized values unify — and the
"default" chain stores one value per TOKEN (multivalued)."""

import pytest
from pyspark.sql import functions as F

from tantivy_spark.aggs import run_agg_tree
from tantivy_spark.index.build import IndexConfig, build_index
from tantivy_spark.index.reader import IndexReader
from tantivy_spark.query import TermQuery
from tantivy_spark.query.exact import ExactSearcher


def _build(spark, out, rows, tokenizer):
    df = spark.createDataFrame(rows, "key STRING, i LONG, text STRING, "
                               "level STRING")
    cfg = IndexConfig(key_col="key", text_col="text", n_segments=1,
                      segment_expr="0", fast_field_cols=["level"],
                      fast_field_tokenizers={"level": tokenizer}
                      if tokenizer else None)
    build_index(spark, df, out, cfg, resume=False)
    return ExactSearcher(IndexReader(spark, out))


def test_lowercase_normalizer_whole_value(spark, tmp_path):
    """fastfield/mod.rs:1208 — raw+LowerCaser: "Test1 test2" stores as
    the single value "test1 test2" (NOT split)."""
    s = _build(spark, str(tmp_path / "lc"),
               [("a", 0, "doc", "Test1 test2")], "lowercase")
    got = [r["level"] for r in s.reader.docmap.select("level").collect()]
    assert got == ["test1 test2"]


def test_default_tokenizer_unifies_values(spark, tmp_path):
    """fastfield/mod.rs:1237 — "info" and "INFO" normalize to the same
    dictionary value; a terms aggregation over the column sees ONE
    bucket with doc_count 2 (the ord_to_str/term_ords assertions)."""
    s = _build(spark, str(tmp_path / "dflt"),
               [("a", 0, "doc one", "info"), ("b", 1, "doc two", "INFO")],
               "default")
    out = run_agg_tree(s.reader.docmap, {"t": {"terms": {"field": "level"}}})
    rows = [(r["key"], int(r["doc_count"])) for r in out["t"].collect()]
    assert rows == [("info", 2)]


def test_default_tokenizer_multitoken_is_multivalued(spark, tmp_path):
    """The "default" chain stores one value per TOKEN — the reference's
    multivalued text fast field; per-occurrence counting applies."""
    s = _build(spark, str(tmp_path / "mv"),
               [("a", 0, "doc", "Warn Error"), ("b", 1, "doc", "error")],
               "default")
    out = run_agg_tree(s.reader.docmap, {"t": {"terms": {"field": "level"}}})
    rows = {r["key"]: int(r["doc_count"]) for r in out["t"].collect()}
    assert rows == {"error": 2, "warn": 1}


def test_raw_keeps_value(spark, tmp_path):
    s = _build(spark, str(tmp_path / "raw"),
               [("a", 0, "doc", "INFO")], "raw")
    assert [r["level"] for r in s.reader.docmap.select("level")
            .collect()] == ["INFO"]


def test_unknown_tokenizer_raises(spark, tmp_path):
    with pytest.raises(ValueError, match="unknown fast-field tokenizer"):
        _build(spark, str(tmp_path / "bad"),
               [("a", 0, "doc", "x")], "porter")


def test_search_still_works_next_to_normalized_ff(spark, tmp_path):
    s = _build(spark, str(tmp_path / "srch"),
               [("a", 0, "findme here", "A"), ("b", 1, "other", "B")],
               "lowercase")
    assert {r["key"] for r in s.search(TermQuery("findme"), k=5)
            .collect()} == {"a"}
