"""QueryParser tests: syntax -> AST, and parsed-query end-to-end results.

Syntax cases follow the reference parser's documented behaviours
(src/query/query_parser/query_parser.rs:131-212)."""

import pytest

from tantivy_spark.query import ast
from tantivy_spark.query.parser import QueryParser, QueryParserError
from tantivy_spark.query.searcher import Searcher


@pytest.fixture(scope="module")
def p():
    return QueryParser()


def test_single_term(p):
    assert p.parse("Hello") == ast.TermQuery("hello")


def test_default_or(p):
    q = p.parse("fast slow")
    assert isinstance(q, ast.BooleanQuery)
    assert q.clauses == [(ast.Occur.SHOULD, ast.TermQuery("fast")),
                         (ast.Occur.SHOULD, ast.TermQuery("slow"))]


def test_must_mustnot(p):
    q = p.parse("+table -slow join")
    assert q.clauses == [
        (ast.Occur.MUST, ast.TermQuery("table")),
        (ast.Occur.MUST_NOT, ast.TermQuery("slow")),
        (ast.Occur.SHOULD, ast.TermQuery("join")),
    ]


def test_explicit_and_or_precedence(p):
    q = p.parse("a AND b OR c")
    assert isinstance(q, ast.BooleanQuery)
    assert q.clauses[0][0] == ast.Occur.SHOULD
    inner = q.clauses[0][1]
    assert inner == ast.BooleanQuery([(ast.Occur.MUST, ast.TermQuery("a")),
                                      (ast.Occur.MUST, ast.TermQuery("b"))])
    assert q.clauses[1] == (ast.Occur.SHOULD, ast.TermQuery("c"))


def test_phrase_with_slop(p):
    assert p.parse('"order sort"') == ast.PhraseQuery(["order", "sort"], slop=0)
    assert p.parse('"order sort"~2') == ast.PhraseQuery(["order", "sort"], slop=2)


def test_multiword_literal_becomes_phrase(p):
    # analyzer splits on punctuation -> phrase, like the reference
    assert p.parse("foo-bar") == ast.PhraseQuery(["foo", "bar"], slop=0)


def test_boost(p):
    assert p.parse("data^2.5") == ast.BoostQuery(ast.TermQuery("data"), 2.5)


def test_all_and_parens(p):
    assert p.parse("*") == ast.AllQuery()
    q = p.parse("(fast OR slow) AND scan")
    assert q.clauses[0][0] == ast.Occur.MUST
    assert q.clauses[1] == (ast.Occur.MUST, ast.TermQuery("scan"))


def test_in_set(p):
    assert p.parse("IN [fast slow]") == ast.TermSetQuery(["fast", "slow"])


def test_range(p):
    q = p.parse("[aa TO ab]")
    assert q == ast.TermRangeQuery("aa", "ab", True, True)
    q = p.parse("{aa TO ab}")
    assert q == ast.TermRangeQuery("aa", "ab", False, False)
    assert p.parse("[a TO *]") == ast.TermRangeQuery("a", None, True, True)


def test_field_prefix_ignored(p):
    assert p.parse("text:data") == ast.TermQuery("data")
    assert p.parse("text:*") == ast.ExistsQuery()


def test_lex_error(p):
    with pytest.raises(QueryParserError):
        p.parse("(unclosed")


def test_uppercase_lowered(p):
    assert p.parse("DATA") == ast.TermQuery("data")


# ---------------------------------------------------------------- e2e


def test_parsed_query_end_to_end(tiny_index, tiny_golden):
    s = Searcher(tiny_index)
    from tantivy_spark.query import BooleanQuery, Occur, TermQuery

    got = s.search("+fast +scan", k=10).collect()
    want = tiny_golden.top_k(BooleanQuery(
        [(Occur.MUST, TermQuery("fast")), (Occur.MUST, TermQuery("scan"))]), k=10)
    assert [(r["segment_ord"], r["doc_id"]) for r in got] == \
        [(sg, d) for _r, sg, d, _ in want]


def test_wand_dispatch_matches_exact(tiny_index):
    s = Searcher(tiny_index)
    w = s.search("fast slow", k=10, method="wand").collect()
    e = s.search("fast slow", k=10, method="exact").collect()
    assert [(r["rank"], r["key"]) for r in w] == [(r["rank"], r["key"]) for r in e]


def test_regex_phrase_query(tiny_index, tiny_golden):
    from tantivy_spark.query.ast import PhraseQuery, RegexPhraseQuery
    from tantivy_spark.query.exact import ExactSearcher

    s = ExactSearcher(tiny_index)
    literal = s.search(PhraseQuery(["order", "sort"]), k=8).collect()
    as_regex = s.search(RegexPhraseQuery(["order", "sort"]), k=8).collect()
    assert [(r["segment_ord"], r["doc_id"]) for r in literal] == \
        [(r["segment_ord"], r["doc_id"]) for r in as_regex]
    # widening the last slot can only grow the matched doc set
    widened = s.matching(RegexPhraseQuery(["order", "so.*"])).count()
    assert widened >= s.matching(PhraseQuery(["order", "sort"])).count()


def test_range_and_exists_queries(tiny_index, tiny_golden):
    from tantivy_spark.query import ast as A
    s = Searcher(tiny_index)
    q = A.TermRangeQuery("da", "dz", True, True)
    assert s.count(q) == tiny_golden.count(q)
    assert s.count(A.ExistsQuery()) == tiny_golden.count(A.ExistsQuery())
