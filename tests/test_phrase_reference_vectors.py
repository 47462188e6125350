"""Verbatim ports of the reference's PhraseQuery end-to-end unit tests
(/root/reference/src/query/phrase_query/mod.rs), asserting the SAME
doc-id sets and the SAME pinned f32 BM25 scores — the north rule's
"rank-identical top-k docIDs and scores versus Tantivy's own BM25 unit
tests" — against BOTH engines:

- the numpy golden engine (independent of Spark), for every corpus;
- the distributed Spark engine (build_index + ExactSearcher), for the
  corpora that exercise a distinct code path (exact, sloppy 2-term,
  sloppy carrying >2-term, repeated terms, explicit offsets).

Score tolerance mirrors the reference's assert_nearly_equals
(macros.rs: relative 0.0005); we assert tighter (rel 1e-5).
"""

import pytest

from tantivy_spark.query import ast
from tantivy_spark.query.golden import GoldenIndex

# corpora from phrase_query/mod.rs tests
CORPUS_MAIN = [
    "b b b d c g c",
    "a b b d c g c",
    "a b a b c",
    "c a b a d ga a",
    "a b c",
]
CORPUS_SCORE = ["a b c", "a b c a b"]
CORPUS_SLOP_SIZE = ["a b e c", "a e e e c", "a e e e e c"]
CORPUS_SLOP_ORDERING = [
    "a e b e c",
    "a e e e e e b e e e e c",
    "a c b",
    "a c e b e",
    "a e c b",
    "a e b c",
]
CORPUS_DOCFREQ = ["b", "a b", "b a"]
CORPUS_OFFSETS = ["a b c d e f g h"]


def golden(texts):
    keys = [f"{i:010d}" for i in range(len(texts))]
    return GoldenIndex(keys, texts, n_segments=1)


def doc_ids(engine, q):
    return sorted(doc for _rank, _seg, doc, _s in engine.top_k(q, k=20))


def scores_by_docid(engine, q):
    return {doc: s for _rank, _seg, doc, s in engine.top_k(q, k=20)}


# ------------------------------------------------------------- golden engine

def test_phrase_query_docsets():
    # mod.rs:40-73 test_phrase_query + :94-127 test_phrase_query_no_score
    g = golden(CORPUS_MAIN)
    assert doc_ids(g, ast.PhraseQuery(["a", "b"])) == [1, 2, 3, 4]
    assert doc_ids(g, ast.PhraseQuery(["a", "b", "c"])) == [2, 4]
    assert doc_ids(g, ast.PhraseQuery(["b", "b"])) == [0, 1]
    assert doc_ids(g, ast.PhraseQuery(["g", "ewrwer"])) == []
    assert doc_ids(g, ast.PhraseQuery(["g", "a"])) == []


def test_phrase_score():
    # mod.rs:163-171 test_phrase_score — pinned f32 scores
    g = golden(CORPUS_SCORE)
    s = scores_by_docid(g, ast.PhraseQuery(["a", "b"]))
    assert s[0] == pytest.approx(0.40618482, rel=1e-5)
    assert s[1] == pytest.approx(0.46844664, rel=1e-5)


def test_phrase_score_with_slop_bug():
    # mod.rs:182-188
    g = golden(["asdf asdf Captain Subject Wendy", "Captain"])
    s = scores_by_docid(g, ast.PhraseQuery(["captain", "wendy"], slop=1))
    assert len(s) == 1


def test_phrase_score_with_slop_bug_2():
    # mod.rs:190-201
    g = golden(["a x b x c", "a a c"])
    assert len(scores_by_docid(g, ast.PhraseQuery(["a", "b", "c"], slop=2))) == 1
    g = golden(["a x b x c", "b c c"])
    assert len(scores_by_docid(g, ast.PhraseQuery(["a", "b", "c"], slop=2))) == 1


def test_phrase_score_with_slop_repeating():
    # mod.rs:220-226
    g = golden(["wendy subject subject captain", "Captain"])
    s = scores_by_docid(g, ast.PhraseQuery(["wendy", "subject", "captain"], slop=1))
    assert len(s) == 1


def test_phrase_score_with_slop_size():
    # mod.rs:228-237 — pinned f32 scores at slop 3
    g = golden(CORPUS_SLOP_SIZE)
    s = scores_by_docid(g, ast.PhraseQuery(["a", "c"], slop=3))
    assert sorted(s) == [0, 1]
    assert s[0] == pytest.approx(0.29086056, rel=1e-5)
    assert s[1] == pytest.approx(0.26706287, rel=1e-5)


def test_phrase_slop():
    # mod.rs:239-257 — transposition costs 2
    assert len(scores_by_docid(golden(["a x b c"]),
                               ast.PhraseQuery(["a", "b", "c"], slop=1))) == 1
    assert len(scores_by_docid(golden(["a x b x c"]),
                               ast.PhraseQuery(["a", "b", "c"], slop=1))) == 0
    assert len(scores_by_docid(golden(["a b"]),
                               ast.PhraseQuery(["b", "a"], slop=1))) == 0
    assert len(scores_by_docid(golden(["a b"]),
                               ast.PhraseQuery(["b", "a"], slop=2))) == 1


def test_phrase_score_with_slop_ordering():
    # mod.rs:259-270 — pinned f32 scores; docs 0,2,3,4,5 match (the Rust
    # comment "first and last" is stale — the pinned scores themselves
    # identify docs 2 and 4 via their fieldnorms)
    g = golden(CORPUS_SLOP_ORDERING)
    s = scores_by_docid(g, ast.PhraseQuery(["a", "b", "c"], slop=3))
    assert sorted(s) == [0, 2, 3, 4, 5]
    assert s[0] == pytest.approx(0.23091172, rel=1e-5)
    assert s[2] == pytest.approx(0.27310878, rel=1e-5)
    assert s[4] == pytest.approx(0.25024384, rel=1e-5)


def test_phrase_query_docfreq_order():
    # mod.rs:273-300 — motivated by reference issue #234
    g = golden(CORPUS_DOCFREQ)
    assert doc_ids(g, ast.PhraseQuery(["a", "b"])) == [1]
    assert doc_ids(g, ast.PhraseQuery(["b", "a"])) == [2]


def test_phrase_query_non_trivial_offsets():
    # mod.rs:302-345 — PhraseQuery::new_with_offset vectors
    g = golden(CORPUS_OFFSETS)

    def match(pairs):
        offsets = [o for o, _ in pairs]
        terms = [t for _, t in pairs]
        return doc_ids(g, ast.PhraseQuery(terms, offsets=offsets)) == [0]

    assert match([(0, "a"), (1, "b")])
    assert match([(1, "b"), (0, "a")])
    assert not match([(0, "a"), (2, "b")])
    assert match([(0, "a"), (2, "c")])
    assert match([(0, "a"), (2, "c"), (3, "d")])
    assert match([(0, "a"), (2, "c"), (4, "e")])
    assert match([(4, "e"), (0, "a"), (2, "c")])
    assert not match([(0, "a"), (2, "d")])
    assert match([(1, "a"), (3, "c")])


# ------------------------------------------------------------- Spark engine

@pytest.fixture(scope="module")
def sindex(spark, tmp_path_factory):
    """One Spark index per corpus, built on demand and cached."""
    from tantivy_spark.index.build import IndexConfig, build_index
    from tantivy_spark.index.reader import IndexReader
    from tantivy_spark.query.exact import ExactSearcher

    cache = {}
    base = tmp_path_factory.mktemp("phraseref")

    def get(texts):
        key = tuple(texts)
        if key not in cache:
            df = spark.createDataFrame(
                [(f"{i:010d}", t) for i, t in enumerate(texts)],
                "url STRING, text STRING")
            out = str(base / f"idx{len(cache)}")
            build_index(spark, df, out,
                        IndexConfig(key_col="url", text_col="text", n_segments=1))
            cache[key] = ExactSearcher(IndexReader(spark, out))
        return cache[key]

    return get


def spark_hits(searcher, q):
    rows = searcher.search(q, k=20).collect()
    return {r["doc_id"]: r["score"] for r in rows}


def test_spark_phrase_query_docsets(sindex):
    s = sindex(CORPUS_MAIN)
    assert sorted(spark_hits(s, ast.PhraseQuery(["a", "b"]))) == [1, 2, 3, 4]
    assert sorted(spark_hits(s, ast.PhraseQuery(["a", "b", "c"]))) == [2, 4]
    assert sorted(spark_hits(s, ast.PhraseQuery(["b", "b"]))) == [0, 1]
    assert spark_hits(s, ast.PhraseQuery(["g", "ewrwer"])) == {}
    assert spark_hits(s, ast.PhraseQuery(["g", "a"])) == {}


def test_spark_phrase_score(sindex):
    s = spark_hits(sindex(CORPUS_SCORE), ast.PhraseQuery(["a", "b"]))
    assert s[0] == pytest.approx(0.40618482, rel=1e-5)
    assert s[1] == pytest.approx(0.46844664, rel=1e-5)


def test_spark_phrase_score_with_slop_size(sindex):
    s = spark_hits(sindex(CORPUS_SLOP_SIZE), ast.PhraseQuery(["a", "c"], slop=3))
    assert sorted(s) == [0, 1]
    assert s[0] == pytest.approx(0.29086056, rel=1e-5)
    assert s[1] == pytest.approx(0.26706287, rel=1e-5)


def test_spark_phrase_score_with_slop_ordering(sindex):
    s = spark_hits(sindex(CORPUS_SLOP_ORDERING),
                   ast.PhraseQuery(["a", "b", "c"], slop=3))
    assert sorted(s) == [0, 2, 3, 4, 5]
    assert s[0] == pytest.approx(0.23091172, rel=1e-5)
    assert s[2] == pytest.approx(0.27310878, rel=1e-5)
    assert s[4] == pytest.approx(0.25024384, rel=1e-5)


def test_spark_phrase_slop_transposition(sindex):
    s = sindex(["a b"])
    assert spark_hits(s, ast.PhraseQuery(["b", "a"], slop=1)) == {}
    assert sorted(spark_hits(s, ast.PhraseQuery(["b", "a"], slop=2))) == [0]


def test_spark_phrase_offsets(sindex):
    s = sindex(CORPUS_OFFSETS)
    assert sorted(spark_hits(
        s, ast.PhraseQuery(["a", "c"], offsets=[0, 2]))) == [0]
    assert sorted(spark_hits(
        s, ast.PhraseQuery(["e", "a", "c"], offsets=[4, 0, 2]))) == [0]
    assert spark_hits(
        s, ast.PhraseQuery(["a", "d"], offsets=[0, 2])) == {}
