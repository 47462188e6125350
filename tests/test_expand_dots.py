"""JsonObjectOptions::set_expand_dots_enabled parity (ref:
src/fastfield/mod.rs:1088-1163): with expansion DISABLED (the reference
default) a json key holding a LITERAL dot stays distinct from real
nesting and is addressed with the escaped ``\\.`` form; with expansion
ENABLED the dotted key folds into the nested-path namespace, so BOTH
the escaped and the unescaped path find it."""

import json

import pytest
from pyspark.sql import functions as F

from tantivy_spark.analyzer import json_typed_tokens
from tantivy_spark.functions.jsonterm import json_num_term
from tantivy_spark.index.build import IndexConfig, build_index
from tantivy_spark.index.reader import IndexReader
from tantivy_spark.query.exact import ExactSearcher
from tantivy_spark.query.parser import QueryParser


def _terms(spark, payload: str, **kw) -> set[str]:
    return set(spark.createDataFrame([(payload,)], "j STRING")
               .select(F.explode(json_typed_tokens(F.col("j"), **kw))
                       .alias("t"))
               .toPandas()["t"])


def test_dotted_key_escapes_by_default(spark):
    """fastfield/mod.rs:1088 (expand_dots_disabled): {"attr.age": 32}
    is NOT addressable as the nested path attr.age — the key's dot is
    escaped in the term, distinct from real nesting."""
    toks = _terms(spark, json.dumps({"attr.age": 32}))
    assert json_num_term(r"attr\.age", 32) in toks
    assert json_num_term("attr.age", 32) not in toks
    # real nesting keeps the bare dotted path
    toks_nested = _terms(spark, json.dumps({"attr": {"age": 32}}))
    assert json_num_term("attr.age", 32) in toks_nested
    assert json_num_term(r"attr\.age", 32) not in toks_nested


def test_dotted_key_expands_when_enabled(spark):
    """fastfield/mod.rs:1139 (expand_dots_enabled): the dotted key is
    treated as if the json were nested — both doc shapes produce the
    SAME term."""
    t_dotted = _terms(spark, json.dumps({"attr.age": 32}), expand_dots=True)
    t_nested = _terms(spark, json.dumps({"attr": {"age": 32}}),
                      expand_dots=True)
    assert json_num_term("attr.age", 32) in t_dotted
    assert t_dotted == t_nested


def test_backslash_in_key_stays_distinct(spark):
    r"""A key holding a literal backslash ("a\b") cannot collide with
    the escaped-dot form of another key — backslashes escape first."""
    toks = _terms(spark, json.dumps({"a\\.b": 1}))
    assert json_num_term("a\\\\\\.b", 1) in toks          # a\\\.b
    assert json_num_term(r"a\.b", 1) not in toks


@pytest.fixture(scope="module")
def dots_index(spark, tmp_path_factory):
    """Two docs: one literal-dot key, one real nesting — built twice
    (reference-default vs expand_dots)."""
    rows = [("d1", 0, json.dumps({"attr.age": 32})),
            ("d2", 1, json.dumps({"attr": {"age": 32}}))]
    df = spark.createDataFrame(rows, "key STRING, i LONG, props STRING")
    out = {}
    for mode, chain in (("plain", "json_typed"),
                        ("expand", "json_typed_expand_dots")):
        p = str(tmp_path_factory.mktemp("dots") / mode)
        build_index(spark, df, p,
                    IndexConfig(key_col="key", field_cols={"props": "props"},
                                field_analyzers={"props": chain},
                                n_segments=1, segment_expr="0"),
                    resume=False)
        out[mode] = ExactSearcher(IndexReader(spark, p))
    return out


def test_query_addressing_disabled(spark, dots_index):
    """End-to-end port of test_fast_field_in_json_field_expand_dots_
    disabled: the escaped path finds the literal-dot doc, the bare
    nested path finds only real nesting."""
    p = QueryParser(fields=["props", "text"])
    s = dots_index["plain"]

    def keys(q):
        return {r["key"] for r in s.search(p.parse(q), k=10).collect()}

    assert keys(r"props.attr\.age:32") == {"d1"}
    assert keys("props.attr.age:32") == {"d2"}


def test_query_addressing_enabled(spark, dots_index):
    """End-to-end port of test_fast_field_in_json_field_expand_dots_
    enabled: BOTH path spellings address the expanded key, and the
    literal-dot doc unifies with real nesting."""
    p = QueryParser(fields=["props", "text"], expand_dots_fields=["props"])
    s = dots_index["expand"]

    def keys(q):
        return {r["key"] for r in s.search(p.parse(q), k=10).collect()}

    assert keys("props.attr.age:32") == {"d1", "d2"}
    assert keys(r"props.attr\.age:32") == {"d1", "d2"}
