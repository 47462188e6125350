"""Verbatim ports of the reference's BooleanQuery unit tests
(/root/reference/src/query/boolean_query/mod.rs), pinning the same
doc-id sets and the same f32 scores, plus a property test modeled on
its proptest_boolean_query (mod.rs:683-843) — arbitrary Union/
Intersection ASTs over a bit-permutation corpus checked against
closed-form membership.

Golden-engine asserts run on every vector; the Spark engine re-runs
the ones that exercise distinct distributed paths (score parity,
exclusion invariance, minimum_should_match with all-match clauses,
the AllScorer-preservation regressions over an indexed fast field).
"""

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tantivy_spark.query import ast
from tantivy_spark.query.golden import GoldenIndex

# aux_test_helper corpus (boolean_query/mod.rs:27-43)
CORPUS_AUX = ["a b c", "a c", "b c", "a b c d", "d"]
CORPUS_WEIGHT = ["a b c", "a c", "b c"]

MUST, SHOULD, NOT = ast.Occur.MUST, ast.Occur.SHOULD, ast.Occur.MUST_NOT


def golden(texts):
    return GoldenIndex([f"{i:010d}" for i in range(len(texts))], texts,
                       n_segments=1)


def doc_ids(engine, q):
    return sorted(d for _r, _s, d, _sc in engine.top_k(q, k=20))


def scores_by_docid(engine, q):
    return {d: s for _r, _s, d, s in engine.top_k(q, k=20)}


def B(clauses, msm=1):
    return ast.BooleanQuery(clauses, minimum_should_match=msm)


def T(t):
    return ast.TermQuery(t)


# ------------------------------------------------------------- golden engine

def test_boolean_query_docsets():
    # mod.rs:108-169 test_boolean_query
    g = golden(CORPUS_AUX)
    assert doc_ids(g, B([(MUST, T("a"))])) == [0, 1, 3]
    assert doc_ids(g, B([(SHOULD, T("a"))])) == [0, 1, 3]
    assert doc_ids(g, B([(SHOULD, T("a")), (SHOULD, T("b"))])) == [0, 1, 2, 3]
    assert doc_ids(g, B([(MUST, T("a")), (SHOULD, T("b"))])) == [0, 1, 3]
    assert doc_ids(g, B([(MUST, T("a")), (SHOULD, T("b")),
                         (NOT, T("d"))])) == [0, 1]
    assert doc_ids(g, B([(NOT, T("d"))])) == []


def test_boolean_query_two_excluded():
    # mod.rs:171-218 — exclusion must not influence the surviving score
    g = golden(CORPUS_AUX)
    no_excl = scores_by_docid(g, B([(MUST, T("d"))]))
    assert sorted(no_excl) == [3, 4]
    excl = scores_by_docid(g, B([(MUST, T("d")), (NOT, T("a")), (NOT, T("b"))]))
    assert sorted(excl) == [4]
    assert excl[4] == no_excl[4]


def test_boolean_query_with_weight():
    # mod.rs:220-259 — pinned f32 score and 2x boost
    g = golden(CORPUS_WEIGHT)
    q = B([(SHOULD, T("a")), (SHOULD, T("b"))])
    assert scores_by_docid(g, q)[0] == pytest.approx(0.84163445, rel=1e-5)
    boosted = scores_by_docid(g, ast.BoostQuery(q, 2.0))
    assert boosted[0] == pytest.approx(1.6832689, rel=1e-5)


def test_intersection_score():
    # mod.rs:261-291 — pinned f32 scores for MUST a + MUST b
    g = golden(CORPUS_AUX)
    s = scores_by_docid(g, B([(MUST, T("a")), (MUST, T("b"))]))
    assert s[0] == pytest.approx(0.977973, rel=1e-5)
    assert s[3] == pytest.approx(0.84699446, rel=1e-5)


def test_explain_ln2():
    # mod.rs:294-316 test_explain — two single-token docs, SHOULD(a, b):
    # doc 0 scores exactly ln(2)
    g = golden(["a", "b"])
    s = scores_by_docid(g, B([(SHOULD, T("a")), (SHOULD, T("b"))]))
    assert s[0] == pytest.approx(math.log(2.0), rel=1e-5)


def test_min_should_match_with_all_query_golden():
    # mod.rs:382-410 — duplicate all-match SHOULD clauses must count
    # toward msm per CLAUSE (a past bug deduped them but kept msm=4)
    g = golden(["apple", "banana"])
    all_match = ast.TermRangeQuery(None, None)
    q = B([(SHOULD, all_match), (SHOULD, all_match),
           (SHOULD, T("apple")), (SHOULD, T("apple")), (SHOULD, T("apple"))],
          msm=4)
    assert doc_ids(g, q) == [0]


# ------------------------------------------------- proptest (mod.rs:683-843)

N_FIELDS = 4
N_DOCS = 1 << N_FIELDS


def _perm_texts():
    # doc i holds token f{j} iff bit j of i is set, plus a "base" token in
    # every doc so an unbounded term-range is a true all-match clause
    return [" ".join(["base"] + [f"f{j}" for j in range(N_FIELDS)
                                 if (i >> j) & 1]) for i in range(N_DOCS)]


def _ast_matches(node, doc_id):
    kind = node[0]
    if kind == "all":
        return True
    if kind == "rangeall":
        return True
    if kind == "leaf":
        return (doc_id >> node[1]) & 1 == 1
    children = node[1]
    if kind == "union":
        return any(_ast_matches(c, doc_id) for c in children)
    return all(_ast_matches(c, doc_id) for c in children)


def _ast_to_query(node):
    kind = node[0]
    if kind == "all":
        return ast.AllQuery()
    if kind == "rangeall":
        return ast.TermRangeQuery(None, None)
    if kind == "leaf":
        return T(f"f{node[1]}")
    occur = SHOULD if kind == "union" else MUST
    return B([(occur, _ast_to_query(c)) for c in node[1]])


_leaf = st.one_of(
    st.tuples(st.just("leaf"), st.integers(0, N_FIELDS - 1)),
    st.just(("all",)),
    st.just(("rangeall",)),
)
_ast_strategy = st.recursive(
    _leaf,
    lambda inner: st.one_of(
        st.tuples(st.just("union"), st.lists(inner, min_size=1, max_size=5)),
        st.tuples(st.just("intersection"), st.lists(inner, min_size=1, max_size=5)),
    ),
    max_leaves=12,
)


@settings(max_examples=60, deadline=None)
@given(_ast_strategy)
def test_proptest_boolean_ast_golden(node):
    g = golden(_perm_texts())
    want = sorted(i for i in range(N_DOCS) if _ast_matches(node, i))
    got = sorted(d for (_s, d) in g.scores(_ast_to_query(node)))
    assert got == want, node


# ------------------------------------------------------------- Spark engine

@pytest.fixture(scope="module")
def aux_searcher(spark, tmp_path_factory):
    from tantivy_spark.index.build import IndexConfig, build_index
    from tantivy_spark.index.reader import IndexReader
    from tantivy_spark.query.exact import ExactSearcher

    df = spark.createDataFrame(
        [(f"{i:010d}", t) for i, t in enumerate(CORPUS_AUX)],
        "url STRING, text STRING")
    out = str(tmp_path_factory.mktemp("boolref") / "aux")
    build_index(spark, df, out,
                IndexConfig(key_col="url", text_col="text", n_segments=1))
    return ExactSearcher(IndexReader(spark, out))


@pytest.fixture(scope="module")
def ff_num_searcher(spark, tmp_path_factory):
    """The AllScorer-regression shape: text + an indexed i64 fast field
    where the range clause matches every doc (mod.rs:444-505)."""
    from pyspark.sql import functions as F
    from tantivy_spark.index.build import IndexConfig, build_index
    from tantivy_spark.index.reader import IndexReader
    from tantivy_spark.query.exact import ExactSearcher

    rows = [("hello", 10), ("world", 20), ("hello world", 30),
            ("foo", 40), ("bar", 50), ("baz", 60)]
    df = spark.createDataFrame(
        [(f"{i:010d}", t, n) for i, (t, n) in enumerate(rows)],
        "url STRING, text STRING, num LONG").withColumn("num", F.col("num"))
    out = str(tmp_path_factory.mktemp("boolref") / "ffnum")
    build_index(spark, df, out,
                IndexConfig(key_col="url", text_col="text", n_segments=1,
                            fast_field_cols=["num"]))
    return ExactSearcher(IndexReader(spark, out))


def spark_hits(searcher, q):
    return {r["doc_id"]: r["score"] for r in searcher.search(q, k=20).collect()}


def test_spark_boolean_query_docsets(aux_searcher):
    s = aux_searcher
    assert sorted(spark_hits(s, B([(MUST, T("a"))]))) == [0, 1, 3]
    assert sorted(spark_hits(s, B([(SHOULD, T("a")), (SHOULD, T("b"))]))) \
        == [0, 1, 2, 3]
    assert sorted(spark_hits(s, B([(MUST, T("a")), (SHOULD, T("b")),
                                   (NOT, T("d"))]))) == [0, 1]
    assert spark_hits(s, B([(NOT, T("d"))])) == {}


def test_spark_two_excluded_score_invariance(aux_searcher):
    no_excl = spark_hits(aux_searcher, B([(MUST, T("d"))]))
    excl = spark_hits(aux_searcher,
                      B([(MUST, T("d")), (NOT, T("a")), (NOT, T("b"))]))
    assert sorted(no_excl) == [3, 4] and sorted(excl) == [4]
    assert excl[4] == pytest.approx(no_excl[4], rel=1e-7)


def test_spark_intersection_score(aux_searcher):
    s = spark_hits(aux_searcher, B([(MUST, T("a")), (MUST, T("b"))]))
    assert s[0] == pytest.approx(0.977973, rel=1e-5)
    assert s[3] == pytest.approx(0.84699446, rel=1e-5)


def test_spark_boolean_query_with_weight(spark, tmp_path_factory):
    from tantivy_spark.index.build import IndexConfig, build_index
    from tantivy_spark.index.reader import IndexReader
    from tantivy_spark.query.exact import ExactSearcher

    df = spark.createDataFrame(
        [(f"{i:010d}", t) for i, t in enumerate(CORPUS_WEIGHT)],
        "url STRING, text STRING")
    out = str(tmp_path_factory.mktemp("boolref") / "weight")
    build_index(spark, df, out,
                IndexConfig(key_col="url", text_col="text", n_segments=1))
    s = ExactSearcher(IndexReader(spark, out))
    q = B([(SHOULD, T("a")), (SHOULD, T("b"))])
    assert spark_hits(s, q)[0] == pytest.approx(0.84163445, rel=1e-5)
    assert spark_hits(s, ast.BoostQuery(q, 2.0))[0] == \
        pytest.approx(1.6832689, rel=1e-5)


def test_spark_should_with_all_scorer_regression(ff_num_searcher):
    # mod.rs:444-505: SHOULD(all-match range) OR SHOULD(term) = all docs;
    # order must not matter
    rng = ast.FastFieldRangeQuery("num", 0, None, lower_inclusive=False)
    term = T("hello")
    assert ff_num_searcher.count(rng) == 6
    assert ff_num_searcher.count(B([(SHOULD, rng), (SHOULD, term)])) == 6
    assert ff_num_searcher.count(B([(SHOULD, term), (SHOULD, rng)])) == 6


def test_spark_must_all_with_should_regression(ff_num_searcher):
    # mod.rs:507-550: MUST(all-match) + SHOULD(term) = all docs
    rng = ast.FastFieldRangeQuery("num", 0, None, lower_inclusive=False)
    assert ff_num_searcher.count(B([(MUST, rng), (SHOULD, T("hello"))])) == 6


def test_spark_multiple_all_scorers(ff_num_searcher):
    # mod.rs:619-681
    rng1 = ast.FastFieldRangeQuery("num", 0, None, lower_inclusive=False)
    rng2 = ast.FastFieldRangeQuery("num", 5, None, lower_inclusive=False)
    q = B([(SHOULD, rng1), (SHOULD, rng2), (SHOULD, T("hello"))])
    assert ff_num_searcher.count(q) == 6
    assert ff_num_searcher.count(B([(MUST, rng1), (SHOULD, rng2)])) == 6


def test_spark_min_should_match_with_all_query(ff_num_searcher):
    # mod.rs:382-410 — 2 all-match SHOULDs + 3 identical term SHOULDs,
    # msm=4: only the doc carrying the term reaches 4 satisfied clauses
    rng = ast.FastFieldRangeQuery("num", 0, None, lower_inclusive=False)
    term = T("hello")
    q = B([(SHOULD, rng), (SHOULD, rng), (SHOULD, term), (SHOULD, term),
           (SHOULD, term)], msm=4)
    # docs 0 and 2 contain "hello" -> 5 clauses; others only 2
    assert ff_num_searcher.count(q) == 2


def test_spark_parsed_non_all_term_disjunction(aux_searcher):
    # mod.rs:45-53: "(+a +b) d" over the aux corpus counts 3
    from tantivy_spark.query.parser import QueryParser

    q = QueryParser().parse("(+a +b) d")
    assert aux_searcher.count(q) == 3
