"""Verbatim ports of the reference's per-query-module unit tests:

- set_query.rs (test_term_set_query, test_term_set_query_parser):
  const score 1.0, no field crosstalk, parser ``IN [..]`` syntax
- fuzzy_query.rs (test_fuzzy_term, test_fuzzy_term_transposition_cost_one,
  test_fuzzy_json_path_term): CONST score 1.0 (AutomatonWeight lowers to
  ConstScorer, automaton_weight.rs:109-110), the distance<3 guard
  (:114-127), and json-path fuzzy where the path is exact and only the
  VALUE is fuzzy-matched (:137-151 + automaton_weight.rs:55-66)
- regex_query.rs (test_regex_query, test_pattern_error): const score 1.0
  matches, zero-match patterns, loud invalid-pattern error at plan time
- automaton_weight.rs (test_automaton_weight_boost): boosted automaton
  queries score exactly the boost
- all_query.rs (test_all_query, test_all_query_with_boost): every doc of
  every segment matches once; score == boost
- exist_query.rs (test_exists_query_simple, test_exists_query_json,
  test_exists_query_json_union_no_single_full_subpath,
  test_exists_query_unsupported_types): per-field existence counts,
  json-path existence with/without subpaths, root-vs-leaf split, and
  the "The field does not exist" error parity

Intentional divergence kept visible: the reference's ExistsQuery demands
a FAST field ("Schema error: 'Field X is not a fast field.'"); this repo
answers existence from fieldnorms for indexed text fields too (a strict
superset), so that error has no counterpart here.
"""

import json

import pytest

from tantivy_spark.query import ast
from tantivy_spark.query.exact import ExactSearcher


def _build(spark, tmp, name, rows, schema, **cfg_kw):
    from tantivy_spark.index.build import IndexConfig, build_index
    from tantivy_spark.index.reader import IndexReader

    df = spark.createDataFrame(rows, schema)
    out = str(tmp / name)
    build_index(spark, df, out, IndexConfig(key_col="key", **cfg_kw),
                resume=False)
    return ExactSearcher(IndexReader(spark, out))


# ------------------------------------------------------------ set_query.rs

@pytest.fixture(scope="module")
def set_searcher(spark, tmp_path_factory):
    # set_query.rs:18-46 — four docs over two text fields
    rows = [("0", "doc1", "val1"), ("1", "doc2", "val2"),
            ("2", "doc3", "val3"), ("3", "val3", "doc3")]
    return _build(spark, tmp_path_factory.mktemp("setq"), "idx", rows,
                  "key STRING, field1 STRING, field2 STRING",
                  n_segments=1,
                  field_cols={"field1": "field1", "field2": "field2"})


def _set_hits(s, terms, field_of=None, k=3):
    q = ast.TermSetQuery([f"{field_of[i]}\x1f{t}" if field_of else t
                          for i, t in enumerate(terms)])
    return s.search(q, k=k).collect()


def test_term_set_query(set_searcher):
    s = set_searcher
    sep = "\x1f"

    # single element (set_query.rs:50-59): 1 doc, score exactly 1.0
    hits = s.search(ast.TermSetQuery([f"field1{sep}doc1"]), k=2).collect()
    assert [r["key"] for r in hits] == ["0"]
    assert hits[0]["score"] == 1.0

    # single element, absent (:61-68)
    assert s.search(ast.TermSetQuery([f"field1{sep}doc4"]), k=1).count() == 0

    # multiple elements (:70-83): 2 docs, each score 1.0
    hits = s.search(ast.TermSetQuery(
        [f"field1{sep}doc1", f"field1{sep}doc2"]), k=2).collect()
    assert sorted(r["key"] for r in hits) == ["0", "1"]
    assert all(r["score"] == 1.0 for r in hits)

    # multiple elements, mixed fields, duplicate term (:85-99)
    hits = s.search(ast.TermSetQuery(
        [f"field1{sep}doc1", f"field1{sep}doc1", f"field2{sep}val2"]),
        k=3).collect()
    assert sorted(r["key"] for r in hits) == ["0", "1"]
    assert all(r["score"] == 1.0 for r in hits)

    # no field crosstalk (:101-126): doc3 appears in field1 of doc "2"
    # and field2 of doc "3" — each side matches exactly its own field
    assert {r["key"] for r in s.search(
        ast.TermSetQuery([f"field1{sep}doc3"]), k=3).collect()} == {"2"}
    assert {r["key"] for r in s.search(
        ast.TermSetQuery([f"field2{sep}doc3"]), k=3).collect()} == {"3"}
    assert {r["key"] for r in s.search(
        ast.TermSetQuery([f"field1{sep}doc3", f"field2{sep}doc3"]),
        k=3).collect()} == {"2", "3"}


def test_term_set_query_parser(spark, tmp_path):
    # set_query.rs:131-157 — "field: IN [val1 val2]" matches 2 of 3 docs
    from tantivy_spark.query.parser import QueryParser

    s = _build(spark, tmp_path, "setp",
               [("0", "val1"), ("1", "val2"), ("2", "val3")],
               "key STRING, field STRING",
               n_segments=1, field_cols={"field": "field"})
    q = QueryParser().parse("field: IN [val1 val2]")
    hits = s.search(q, k=3).collect()
    assert sorted(r["key"] for r in hits) == ["0", "1"]


# ---------------------------------------------------------- fuzzy_query.rs

@pytest.fixture(scope="module")
def country_searcher(spark, tmp_path_factory):
    # fuzzy_query.rs:278-291 — one "japan" doc, one "korea" doc
    return _build(spark, tmp_path_factory.mktemp("fuzzy"), "idx",
                  [("0", "japan"), ("1", "korea")],
                  "key STRING, text STRING",
                  n_segments=1, text_col="text", segment_expr="0")


def test_fuzzy_term_const_score(country_searcher):
    s = country_searcher
    # 'japon'~1 matches japan with score EXACTLY 1.0 (fuzzy_query.rs:
    # 295-305 assert_nearly_equals!(1.0, score) — ConstScorer, not BM25)
    hits = s.search(ast.FuzzyTermQuery("japon", distance=1,
                                       transposition_cost_one=True),
                    k=2).collect()
    assert [r["key"] for r in hits] == ["0"]
    assert hits[0]["score"] == 1.0

    # 'jap'~1 matches nothing (:307-316, non-prefix distance is 2)
    assert s.search(ast.FuzzyTermQuery("jap", distance=1,
                                       transposition_cost_one=True),
                    k=2).count() == 0

    # 'jap'~1 PREFIX matches japan at score 1.0 (:318-328)
    hits = s.search(ast.FuzzyTermQuery("jap", distance=1, prefix=True,
                                       transposition_cost_one=True),
                    k=2).collect()
    assert [r["key"] for r in hits] == ["0"]
    assert hits[0]["score"] == 1.0


def test_fuzzy_term_transposition_cost_one(spark, tmp_path):
    # fuzzy_query.rs:332-352 — 'jaapn' vs 'japan': one adjacent swap,
    # count 1 with transposition_cost_one, 0 without
    s = _build(spark, tmp_path, "tco", [("0", "japan")],
               "key STRING, text STRING",
               n_segments=1, text_col="text", segment_expr="0")
    assert s.count(ast.FuzzyTermQuery(
        "jaapn", distance=1, transposition_cost_one=True)) == 1
    assert s.count(ast.FuzzyTermQuery(
        "jaapn", distance=1, transposition_cost_one=False)) == 0


def test_fuzzy_distance_cap(country_searcher):
    # fuzzy_query.rs:114-127 — the automaton builder table stops at
    # distance 2; 3 is InvalidArgument
    with pytest.raises(ValueError, match="less than 3"):
        country_searcher.count(ast.FuzzyTermQuery("japan", distance=3))


def test_fuzzy_json_path_term(spark, tmp_path):
    """fuzzy_query.rs:190-274 (test_fuzzy_json_path_term): the json PATH
    is exact — only the VALUE is fuzzy-matched — so 'attributes.aa:japan'
    must not reach the doc holding {"a": "japan"} even though the full
    terms are within edit distance."""
    rows = [("0", json.dumps({"a": "japan"})),
            ("1", json.dumps({"aa": "japan"}))]
    s = _build(spark, tmp_path, "fjson", rows,
               "key STRING, attributes STRING",
               n_segments=1,
               field_cols={"attributes": "attributes"},
               field_analyzers={"attributes": "json_typed"})

    # path mismatch: attributes.aa:japan ~2 matches ONLY doc 1 (:240-248)
    hits = s.search(ast.FuzzyTermQuery("aa=japan", distance=2,
                                       transposition_cost_one=True,
                                       field="attributes"), k=2).collect()
    assert [r["key"] for r in hits] == ["1"]

    # value within distance 1: attributes.a:japon matches doc 0 (:250-260)
    hits = s.search(ast.FuzzyTermQuery("a=japon", distance=1,
                                       transposition_cost_one=True,
                                       field="attributes"), k=2).collect()
    assert [r["key"] for r in hits] == ["0"]
    assert hits[0]["score"] == 1.0

    # value at distance 2: attributes.a:jap matches nothing (:262-271)
    assert s.search(ast.FuzzyTermQuery("a=jap", distance=1,
                                       transposition_cost_one=True,
                                       field="attributes"),
                    k=2).count() == 0


# ---------------------------------------------------------- regex_query.rs

def test_regex_query_const_score(country_searcher):
    # regex_query.rs:146-154 via verify_regex_query (:120-144):
    # jap[ao]n matches exactly one doc at score 1.0; jap[A-Z]n none
    hits = country_searcher.search(ast.RegexQuery("jap[ao]n"),
                                   k=2).collect()
    assert [r["key"] for r in hits] == ["0"]
    assert hits[0]["score"] == 1.0
    assert country_searcher.search(ast.RegexQuery("jap[A-Z]n"),
                                   k=2).count() == 0


def test_automaton_weight_boost(country_searcher):
    # automaton_weight.rs:200-208 — a boosted automaton query scores
    # exactly the boost (1.32), nothing BM25-shaped
    hits = country_searcher.search(
        ast.BoostQuery(ast.RegexQuery("jap[ao]n"), 1.32), k=2).collect()
    assert [r["key"] for r in hits] == ["0"]
    assert hits[0]["score"] == pytest.approx(1.32, rel=1e-9)


def test_regex_pattern_error(country_searcher):
    # regex_query.rs:186-195 — "(foo" fails loudly at plan time with the
    # pattern in the message, not as an executor stack trace
    with pytest.raises(ValueError, match="invalid regex pattern"):
        country_searcher.count(ast.RegexQuery("(foo"))


# ------------------------------------------------------------ all_query.rs

@pytest.fixture(scope="module")
def all_searcher(spark, tmp_path_factory):
    # all_query.rs:122-137 — segment 0 holds docs {aaa, bbb}, a second
    # commit puts {ccc} in segment 1
    return _build(spark, tmp_path_factory.mktemp("allq"), "idx",
                  [("0", 0, "aaa"), ("1", 0, "bbb"), ("2", 1, "ccc")],
                  "key STRING, seg INT, text STRING",
                  n_segments=2, text_col="text", segment_expr="seg")


def test_all_query(all_searcher):
    # all_query.rs:139-160 — AllQuery enumerates every doc of every
    # segment exactly once
    rows = all_searcher.matching(ast.AllQuery()).collect()
    by_seg = {}
    for r in rows:
        by_seg.setdefault(r["segment_ord"], []).append(r["doc_id"])
    assert sorted(by_seg[0]) == [0, 1]
    assert sorted(by_seg[1]) == [0]
    assert all(r["score"] == 1.0 for r in rows)


def test_all_query_with_boost(all_searcher):
    # all_query.rs:162-181 — scorer(boost).score() == boost
    for boost in (2.0, 1.5):
        rows = all_searcher.matching(
            ast.BoostQuery(ast.AllQuery(), boost)).collect()
        assert len(rows) == 3
        assert all(r["score"] == boost for r in rows)


# ---------------------------------------------------------- exist_query.rs

@pytest.fixture(scope="module")
def exists_searcher(spark, tmp_path_factory):
    # exist_query.rs:244-271 adapted to this engine's field model:
    # `all` on every doc, `even`/`odd` on alternating docs, `multi` a
    # two-token field on every 10th doc, `never` always empty; `num` is
    # an indexed numeric fast field standing in for the u64 all_field
    rows = []
    for i in range(100):
        rows.append((
            str(i), i, f"all{i}",
            f"even{i}" if i % 2 == 0 else None,
            f"odd{i}" if i % 2 == 1 else None,
            f"m{i} m{i + 1}" if i % 10 == 0 else None,
            None))
    return _build(
        spark, tmp_path_factory.mktemp("exists"), "idx", rows,
        "key STRING, num LONG, all STRING, even STRING, odd STRING, "
        "multi STRING, never STRING",
        n_segments=2, segment_expr="pmod(num, 2)",
        field_cols={"all": "all", "even": "even", "odd": "odd",
                    "multi": "multi", "never": "never"},
        fast_field_cols=["num"])


def test_exists_query_simple(exists_searcher):
    s = exists_searcher
    # exist_query.rs:273-278 — per-field existence counts
    assert s.count(ast.ExistsQuery(field="all")) == 100
    assert s.count(ast.ExistsQuery(field="odd")) == 50
    assert s.count(ast.ExistsQuery(field="even")) == 50
    assert s.count(ast.ExistsQuery(field="multi")) == 10
    assert s.count(ast.ExistsQuery(field="never")) == 0
    # fast-field existence: non-null columnar values
    assert s.count(ast.ExistsQuery(field="num")) == 100

    # exercise seek (:280-297): range ∧ exists intersections
    assert s.count(ast.BooleanQuery([
        (ast.Occur.MUST, ast.FastFieldRangeQuery("num", lower=50)),
        (ast.Occur.MUST, ast.ExistsQuery(field="even")),
    ])) == 25
    assert s.count(ast.BooleanQuery([
        (ast.Occur.MUST, ast.FastFieldRangeQuery("num", lower=0, upper=50)),
        (ast.Occur.MUST, ast.ExistsQuery(field="odd")),
    ])) == 25


def test_exists_query_unknown_field(exists_searcher):
    # exist_query.rs:461-469 — unknown fields fail loudly, never count 0
    with pytest.raises(ValueError,
                       match="The field does not exist: 'does_not_exists'"):
        exists_searcher.count(ast.ExistsQuery(field="does_not_exists"))


@pytest.fixture(scope="module")
def exists_json_searcher(spark, tmp_path_factory):
    # exist_query.rs:303-322 — evens carry {"all": i, "even": true},
    # odds {"all": str(i), "odd": true}
    rows = [(str(i), i,
             json.dumps({"all": i, "even": True}) if i % 2 == 0
             else json.dumps({"all": str(i), "odd": True}))
            for i in range(100)]
    return _build(spark, tmp_path_factory.mktemp("existsj"), "idx", rows,
                  "key STRING, i LONG, json STRING",
                  n_segments=2, segment_expr="pmod(i, 2)",
                  field_cols={"json": "json"},
                  field_analyzers={"json": "json_typed"})


def test_exists_query_json(exists_json_searcher):
    s = exists_json_searcher

    def count(path, subpaths):
        return s.count(ast.ExistsQuery(field="json", json_path=path,
                                       json_subpaths=subpaths))

    # exist_query.rs:324-329 — numbers AND strings under the same path
    # both count; bool leaves count; the json ROOT matches nothing
    # without subpaths and everything with them
    assert count("all", False) == 100
    assert count("even", False) == 50
    assert count("even", True) == 50
    assert count("odd", False) == 50
    assert count("", False) == 0
    assert count("", True) == 100

    # non-existing paths under an existing field count zero (:331-333)
    assert count("absent", False) == 0
    assert count("absent", True) == 0

    # non-existing FIELD errors (:334-335)
    with pytest.raises(ValueError, match="does not exist"):
        s.count(ast.ExistsQuery(field="does_not_exists",
                                json_path="absent", json_subpaths=True))


def test_exists_query_json_union_no_single_full_subpath(spark, tmp_path):
    # exist_query.rs:341-376 — evens only have subpath `a`, odds only
    # `b`: no single subpath is full, but the root-with-subpaths union is
    rows = [(str(i), i,
             json.dumps({"a": i} if i % 2 == 0 else {"b": i}))
            for i in range(100)]
    s = _build(spark, tmp_path, "uj", rows,
               "key STRING, i LONG, json STRING",
               n_segments=2, segment_expr="pmod(i, 2)",
               field_cols={"json": "json"},
               field_analyzers={"json": "json_typed"})

    def count(path, subpaths):
        return s.count(ast.ExistsQuery(field="json", json_path=path,
                                       json_subpaths=subpaths))

    assert count("a", False) == 50
    assert count("b", False) == 50
    assert count("", False) == 0
    assert count("", True) == 100


def test_exists_query_json_nested_subpaths(spark, tmp_path):
    # exist_query.rs:19-27 doc semantics: subpaths=True walks DEEPER
    # paths too — "a" with {"a": {"b": 5}} matches only via subpaths
    rows = [("0", 0, json.dumps({"a": {"b": 5}})),
            ("1", 1, json.dumps({"a": "leaf"})),
            ("2", 0, json.dumps({"c": 1}))]
    s = _build(spark, tmp_path, "nj", rows,
               "key STRING, i LONG, json STRING",
               n_segments=1, segment_expr="0",
               field_cols={"json": "json"},
               field_analyzers={"json": "json_typed"})

    def count(path, subpaths):
        return s.count(ast.ExistsQuery(field="json", json_path=path,
                                       json_subpaths=subpaths))

    assert count("a", False) == 1        # only the direct "a" leaf
    assert count("a", True) == 2         # nested a.b counts too
    assert count("a.b", False) == 1
    assert count("c", True) == 1
