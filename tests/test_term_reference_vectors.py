"""Verbatim ports of the reference's TermQuery unit tests
(/root/reference/src/query/term_query/mod.rs), pinning the same f32
scores and the fast-field fallback semantics:

- test_term_query_no_freq: single-doc score = ln(4/3) (mod.rs:20-44)
- test_term_weight: multi-field per-field BM25 statistics with pinned
  scores incl. a parsed two-term union (mod.rs:82-135)
- test_term_query_explain: ln(2) + InvalidArgument on non-matching
  docs (mod.rs:186-218)
- fast-field fallback: TermQuery on a FAST-only (unindexed) column
  counts via a columnar equality filter — numeric, text, and ip-key
  variants — and ERRORS when scoring is required (mod.rs:220-446)
"""

import math

import pytest

from tantivy_spark.query import ast
from tantivy_spark.query.golden import GoldenIndex


def test_term_query_no_freq_score():
    # mod.rs:20-44 — one single-token doc: score is exactly idf = ln(4/3)
    g = GoldenIndex(["0"], ["a"], n_segments=1)
    top = g.top_k(ast.TermQuery("a"), k=1)
    assert top[0][3] == pytest.approx(0.28768212, rel=1e-5)
    assert top[0][3] == pytest.approx(math.log(4.0 / 3.0), rel=1e-6)


# ------------------------------------------------- test_term_weight (Spark)

LEFT_0 = ("left1 left2 left2 left2f2 left2f2 left3 abcde abcde abcde abcde "
          "abcde abcde abcde abcde abcde abcewde abcde abcde")
LARGE_0 = " ".join(f"large{i}" for i in range(287))


@pytest.fixture(scope="module")
def weight_searcher(spark, tmp_path_factory):
    from tantivy_spark.index.build import IndexConfig, build_index
    from tantivy_spark.index.reader import IndexReader
    from tantivy_spark.query.exact import ExactSearcher

    df = spark.createDataFrame(
        [("0000000000", LEFT_0, "right1 right2", LARGE_0),
         ("0000000001", "left4 left1", "", "")],
        "key STRING, left STRING, right STRING, large STRING")
    out = str(tmp_path_factory.mktemp("termref") / "weight")
    build_index(spark, df, out,
                IndexConfig(key_col="key", n_segments=1,
                            field_cols={"left": "left", "right": "right",
                                        "large": "large"}))
    return ExactSearcher(IndexReader(spark, out))


def _hits(searcher, q, k=5):
    return {r["doc_id"]: r["score"] for r in searcher.search(q, k=k).collect()}


def test_term_weight_left2(weight_searcher):
    s = _hits(weight_searcher, ast.TermQuery("left2", field="left"))
    assert sorted(s) == [0]
    assert s[0] == pytest.approx(0.77802235, rel=1e-5)


def test_term_weight_left1(weight_searcher):
    s = _hits(weight_searcher, ast.TermQuery("left1", field="left"))
    assert sorted(s) == [0, 1]
    assert s[1] == pytest.approx(0.27101856, rel=1e-5)
    assert s[0] == pytest.approx(0.13736556, rel=1e-5)


def test_term_weight_parsed_union(weight_searcher):
    # "left:left2 left:left1" — SHOULD union with summed scores
    from tantivy_spark.query.parser import QueryParser

    q = QueryParser().parse("left:left2 left:left1")
    s = _hits(weight_searcher, q)
    assert s[0] == pytest.approx(0.9153879, rel=1e-5)
    assert s[1] == pytest.approx(0.27101856, rel=1e-5)


# ------------------------------------------------------------------ explain

def test_term_query_explain_ln2(spark, tmp_path_factory):
    from tantivy_spark.index.build import IndexConfig, build_index
    from tantivy_spark.index.reader import IndexReader
    from tantivy_spark.query.exact import ExactSearcher

    df = spark.createDataFrame(
        [(f"{i:010d}", t) for i, t in enumerate(["b", "a", "a", "b"])],
        "url STRING, text STRING")
    out = str(tmp_path_factory.mktemp("termref") / "explain")
    build_index(spark, df, out,
                IndexConfig(key_col="url", text_col="text", n_segments=1))
    s = ExactSearcher(IndexReader(spark, out))
    exp = s.explain(ast.TermQuery("a"), 0, 1)
    assert exp["value"] == pytest.approx(math.log(2.0), rel=1e-6)
    # non-matching / out-of-range docs -> InvalidArgument (ValueError)
    with pytest.raises(ValueError):
        s.explain(ast.TermQuery("a"), 0, 0)
    with pytest.raises(ValueError):
        s.explain(ast.TermQuery("a"), 0, 3)


# ------------------------------------------- fast-field fallback (mod.rs:220+)

@pytest.fixture(scope="module")
def fallback_searcher(spark, tmp_path_factory):
    from tantivy_spark.functions.ip import ip_key
    from tantivy_spark.index.build import IndexConfig, build_index
    from tantivy_spark.index.reader import IndexReader
    from tantivy_spark.query.exact import ExactSearcher

    rows = [
        ("0000000000", "", 10, "hello", ip_key("127.0.0.1")),
        ("0000000001", "", 20, "world", ip_key("127.0.0.2")),
        ("0000000002", "", 10, "hello", ip_key("127.0.0.1")),
    ]
    df = spark.createDataFrame(
        rows, "key STRING, text STRING, num LONG, label STRING, ip STRING")
    out = str(tmp_path_factory.mktemp("termref") / "fallback")
    build_index(spark, df, out,
                IndexConfig(key_col="key", text_col="text", n_segments=1,
                            fast_field_cols=["num", "label", "ip"]))
    return ExactSearcher(IndexReader(spark, out))


def test_fallback_to_fastfield_numeric(fallback_searcher):
    # mod.rs:220-266 — numeric FAST-only field, counts work
    assert fallback_searcher.count(ast.TermQuery("10", field="num")) == 2
    assert fallback_searcher.count(ast.TermQuery("20", field="num")) == 1
    assert fallback_searcher.count(ast.TermQuery("30", field="num")) == 0


def test_fallback_text_fast_only(fallback_searcher):
    # mod.rs:268-305
    assert fallback_searcher.count(ast.TermQuery("hello", field="label")) == 2
    assert fallback_searcher.count(ast.TermQuery("world", field="label")) == 1
    assert fallback_searcher.count(ast.TermQuery("nope", field="label")) == 0


def test_fallback_ip_fast_only(fallback_searcher):
    # mod.rs:377-425 — ip terms are u128-hex keys in this engine
    from tantivy_spark.functions.ip import ip_key

    assert fallback_searcher.count(
        ast.TermQuery(ip_key("127.0.0.1"), field="ip")) == 2
    assert fallback_searcher.count(
        ast.TermQuery(ip_key("127.0.0.2"), field="ip")) == 1
    assert fallback_searcher.count(
        ast.TermQuery(ip_key("127.0.0.3"), field="ip")) == 0


def test_fallback_with_scores_errors(fallback_searcher):
    # mod.rs:418-446 — scoring a FAST-only term is a SchemaError
    with pytest.raises(ValueError, match="SchemaError"):
        fallback_searcher.search(ast.TermQuery("10", field="num"), k=1).collect()


def test_fallback_allowed_in_nonscoring_collectors(fallback_searcher):
    """The reference permits the fast-field fallback for ANY
    EnableScoring::Disabled collector, not just Count — order-by-fast-
    field and histogram pass scoring=False through matching() and must
    not raise the SchemaError (mod.rs:220-266 + collector semantics)."""
    from tantivy_spark.query.searcher import Searcher

    s = Searcher(fallback_searcher.reader)
    q = ast.TermQuery("hello", field="label")
    got = s.search_order_by(q, field="num", order="desc", k=5).collect()
    assert [r["key"] for r in got] == ["0000000000", "0000000002"]
    hist = {r["bucket"]: r["cnt"]
            for r in s.histogram_df(q, "num", 0, 10, 3).collect()}
    assert hist == {0: 0, 1: 2, 2: 0}


def test_fallback_scoring_flag_is_reentrant(fallback_searcher):
    """scoring is a matching() parameter, not searcher state: a failed
    scoring search must not leak a disabled flag into the next call
    (and vice versa)."""
    with pytest.raises(ValueError, match="SchemaError"):
        fallback_searcher.search(ast.TermQuery("10", field="num"), k=1)
    assert fallback_searcher.count(ast.TermQuery("10", field="num")) == 2
    with pytest.raises(ValueError, match="SchemaError"):
        fallback_searcher.search(ast.TermQuery("10", field="num"), k=1)


def test_fallback_in_boolean_filter_context(fallback_searcher):
    # count()-style (scoring-disabled) boolean composition works
    from tantivy_spark.query import BooleanQuery, Occur

    q = BooleanQuery([(Occur.MUST, ast.TermQuery("10", field="num")),
                      (Occur.MUST, ast.TermQuery("hello", field="label"))])
    assert fallback_searcher.count(q) == 2
