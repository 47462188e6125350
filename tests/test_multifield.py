"""Multi-field schema: field-qualified terms ({field}\\x1f{term} — the
analogue of the reference's field-qualified Term encoding,
src/schema/term.rs:22-58), per-field fieldnorm sentinels, and per-field
BM25 statistics.

The equivalence oracle: a field of a multi-field index must score
EXACTLY like a single-field index built over that field's column alone —
same doc_freqs, same per-field fieldnorms, same per-field average, same
DocAddress space (segmenting is keyed by doc key only).
"""

import pytest
from pyspark.sql import functions as F

from tantivy_spark.index.build import FIELD_SEP, IndexConfig, build_index
from tantivy_spark.index.reader import IndexReader
from tantivy_spark.query import BooleanQuery, Occur, PhraseQuery, TermQuery
from tantivy_spark.query.ast import ExistsQuery
from tantivy_spark.query.exact import ExactSearcher

SF = "/root/testdata/sf0.001"
SEG_EXPR = "pmod(cast(substring(key, -10, 10) as bigint), 4)"


def _docs(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return docs.select(
        F.format_string("%010d", F.col("doc_id")).alias("key"),
        F.substring(F.coalesce(F.col("text"), F.lit("")), 1, 80).alias("title"),
        F.col("text").alias("body"),
    )


@pytest.fixture(scope="module")
def mf_searcher(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("mf") / "idx")
    cfg = IndexConfig(key_col="key",
                      field_cols={"title": "title", "body": "body"},
                      n_segments=4, segment_expr=SEG_EXPR)
    build_index(spark, _docs(spark), out, cfg)
    return ExactSearcher(IndexReader(spark, out))


def _single_field_searcher(spark, tmp_path, col):
    out = str(tmp_path / f"sf_{col}")
    cfg = IndexConfig(key_col="key", text_col=col, n_segments=4,
                      segment_expr=SEG_EXPR)
    build_index(spark, _docs(spark), out, cfg)
    return ExactSearcher(IndexReader(spark, out))


def _hits(res):
    return [(r["rank"], r["key"], r["score"]) for r in res.collect()]


@pytest.mark.parametrize("field,term", [("title", "data"), ("body", "data"),
                                        ("title", "the"), ("body", "fast")])
def test_field_scores_equal_single_field_index(spark, tmp_path_factory,
                                               mf_searcher, field, term):
    single = _single_field_searcher(
        spark, tmp_path_factory.mktemp(f"sf_{field}_{term}"), field)
    got = _hits(mf_searcher.search(TermQuery(term, field=field), k=10))
    want = _hits(single.search(TermQuery(term), k=10))
    assert got == want
    assert got, (field, term)  # non-vacuous


def test_title_and_body_resolve_to_distinct_postings(mf_searcher):
    r = mf_searcher.reader
    q = f"title{FIELD_SEP}data", f"body{FIELD_SEP}data"
    dfs = r.doc_freqs(list(q))
    assert 0 < dfs[q[0]] < dfs[q[1]]  # title is a prefix of body
    assert mf_searcher.count(TermQuery("data", field="title")) == dfs[q[0]]
    assert mf_searcher.count(TermQuery("data", field="body")) == dfs[q[1]]
    # default field (first declared) is title
    assert mf_searcher.count(TermQuery("data")) == dfs[q[0]]


def test_field_totals_and_exists(mf_searcher):
    r = mf_searcher.reader
    ft = r.field_totals
    assert set(ft) == {"title", "body"}
    assert ft["title"]["total_num_tokens"] < ft["body"]["total_num_tokens"]
    assert ft["title"]["num_docs"] == ft["body"]["num_docs"] == r.num_docs
    n_title = mf_searcher.count(ExistsQuery(field="title"))
    n_body = mf_searcher.count(ExistsQuery(field="body"))
    assert 0 < n_title <= n_body <= r.num_docs


def test_cross_field_boolean(mf_searcher):
    """title:X AND body:Y joins in the shared DocAddress space."""
    q = BooleanQuery([(Occur.MUST, TermQuery("data", field="title")),
                      (Occur.MUST, TermQuery("fast", field="body"))])
    got = {r["key"] for r in mf_searcher.search(q, k=10_000).collect()}
    t = {r["key"] for r in
         mf_searcher.search(TermQuery("data", field="title"), k=1000).collect()}
    b = {r["key"] for r in
         mf_searcher.search(TermQuery("fast", field="body"), k=1000).collect()}
    assert got == (t & b) and got


def test_parser_attaches_fields(mf_searcher):
    from tantivy_spark.query.parser import QueryParser

    p = QueryParser(fields=["title", "body"])
    q = p.parse("title:data")
    assert q == TermQuery("data", field="title")
    assert _hits(mf_searcher.search(q, k=10)) == \
        _hits(mf_searcher.search(TermQuery("data", field="title"), k=10))
    assert p.parse('body:"order sort"') == \
        PhraseQuery(["order", "sort"], field="body")


def test_facade_parses_and_dispatches_fields(mf_searcher):
    """Searcher('title:data') must qualify before WAND shape dispatch —
    the kernel needs field-qualified dictionary keys."""
    from tantivy_spark.query.searcher import Searcher

    s = Searcher(mf_searcher.reader)
    got = [(r["key"], float(r["score"])) for r in
           s.search("title:data", k=5).collect()]        # WAND fast path
    want = [(r["key"], float(r["score"])) for r in
            mf_searcher.search(TermQuery("data", field="title"),
                               k=5).collect()]           # exact path
    assert [k for k, _ in got] == [k for k, _ in want] and got
    for (_, g), (_, w) in zip(got, want):
        assert g == pytest.approx(w, rel=1e-6)


def test_wand_matches_exact_on_multifield(mf_searcher):
    """Per-field block-max caches: WAND over field-qualified terms must
    equal the exhaustive scorer (pruning exactness needs the per-field
    average both at build and at query time)."""
    from tantivy_spark.query.wand import wand_topk

    terms = [f"title{FIELD_SEP}data", f"body{FIELD_SEP}fast"]
    got = wand_topk(mf_searcher.reader, terms, k=10, mode="or").collect()
    want = mf_searcher.search(BooleanQuery([
        (Occur.SHOULD, TermQuery("data", field="title")),
        (Occur.SHOULD, TermQuery("fast", field="body"))]), k=10).collect()
    assert [r["key"] for r in got] == [w["key"] for w in want] and got
    for g, w in zip(got, want):
        assert float(g["score"]) == pytest.approx(float(w["score"]), rel=1e-6)


def test_multifield_merge_preserves_results(spark, tmp_path_factory,
                                            mf_searcher):
    from tantivy_spark.index.merge import merge_segments

    src = mf_searcher.reader.index_dir
    out = str(tmp_path_factory.mktemp("mf_merged") / "idx")
    merge_segments(spark, src, out, n_target_segments=2)
    merged = ExactSearcher(IndexReader(spark, out))
    for field, term in [("title", "data"), ("body", "fast")]:
        got = [(r["rank"], r["key"], r["score"]) for r in
               merged.search(TermQuery(term, field=field), k=10).collect()]
        want = [(r["rank"], r["key"], r["score"]) for r in
                mf_searcher.search(TermQuery(term, field=field), k=10).collect()]
        assert got == want
    assert merged.reader.field_totals == mf_searcher.reader.field_totals


def test_per_field_analyzer_selection(spark, tmp_path):
    """field_analyzers: a field indexed with en_stem matches stemmed
    query literals; the default-chain field does not (ref: per-field
    tokenizer resolution, query_parser.rs:336-412)."""
    from tantivy_spark.query.parser import QueryParser
    from tantivy_spark.query.searcher import Searcher

    docs = spark.createDataFrame(
        [("k1", "motoring relations", "motoring relations"),
         ("k2", "motor relation", "motor relation")],
        "key STRING, title STRING, body STRING")
    out = str(tmp_path / "mf_anlz")
    cfg = IndexConfig(key_col="key",
                      field_cols={"title": "title", "body": "body"},
                      field_analyzers={"body": "en_stem"},
                      n_segments=1)
    build_index(spark, docs, out, cfg)
    r = IndexReader(spark, out)
    # the stemmed field's dictionary holds stems; title holds raw forms
    dfs = r.doc_freqs([f"body{FIELD_SEP}motor", f"body{FIELD_SEP}motoring",
                       f"title{FIELD_SEP}motoring"])
    assert dfs[f"body{FIELD_SEP}motor"] == 2      # both docs stem to motor
    assert dfs[f"body{FIELD_SEP}motoring"] == 0   # raw form never indexed
    assert dfs[f"title{FIELD_SEP}motoring"] == 1  # default chain keeps it

    # parsed literals re-analyze with the field's chain
    p = QueryParser(field_analyzers={"body": "en_stem"})
    q = p.parse("body:motoring")
    assert q == TermQuery("motor", field="body")
    s = Searcher(r)
    assert {row["key"] for row in s.search(q, k=10).collect()} == {"k1", "k2"}
    # phrase literals re-analyze per slot
    q2 = p.parse('body:"motoring relations"')
    assert {row["key"] for row in s.search(q2, k=10).collect()} == {"k1", "k2"}


def test_multi_default_fields_and_boosts(mf_searcher):
    """Unqualified terms search ALL configured default fields
    (SHOULD-disjunction, query_parser.rs:253-262); field boosts multiply
    the resolved field's scores (set_field_boost, :299)."""
    from tantivy_spark.query.searcher import Searcher

    r = mf_searcher.reader
    s_multi = Searcher(r, default_fields=["title", "body"])
    got = _hits(s_multi.search("data", k=10))       # WAND path (f32)
    want = _hits(mf_searcher.search(BooleanQuery([
        (Occur.SHOULD, TermQuery("data", field="title")),
        (Occur.SHOULD, TermQuery("data", field="body"))]), k=10))  # f64
    assert [(r_, k) for r_, k, _ in got] == [(r_, k) for r_, k, _ in want]
    assert got
    for (_, _, g), (_, _, w) in zip(got, want):
        assert g == pytest.approx(w, rel=1e-6)

    # boost: title terms score exactly 2x the unboosted run
    s_boost = Searcher(r, field_boosts={"title": 2.0})
    boosted = _hits(s_boost.search("title:data", k=10))
    plain = _hits(mf_searcher.search(TermQuery("data", field="title"), k=10))
    assert [k for _r, k, _s in boosted] == [k for _r, k, _s in plain]
    for (_, _, b), (_, _, p) in zip(boosted, plain):
        # boosted run dispatches to WAND (f32); 2x the f64 plain score
        assert b == pytest.approx(2.0 * p, rel=1e-6)


def test_multifield_term_pushdown_plan(mf_searcher):
    """Field-qualified terms still reach the postings parquet scan as an
    In() pushed filter — qualification must not break row-group pruning."""
    plan = mf_searcher.flat_postings(
        [f"title{FIELD_SEP}data", f"body{FIELD_SEP}data"]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [In(term" in plan


def test_multifield_with_index_sorting(spark, tmp_path):
    """sort_col composes with field_cols: doc ids follow the sort key,
    per-field postings stay consistent."""
    docs = spark.createDataFrame(
        [("k1", 3, "alpha one", "alpha body one"),
         ("k2", 1, "beta two", "beta body two"),
         ("k3", 2, "gamma three", "gamma body three")],
        "key STRING, pri INT, title STRING, body STRING")
    out = str(tmp_path / "mf_sorted")
    cfg = IndexConfig(key_col="key", n_segments=1, sort_col="pri",
                      field_cols={"title": "title", "body": "body"})
    build_index(spark, docs, out, cfg)
    s = ExactSearcher(IndexReader(spark, out))
    dm = {r["key"]: r["doc_id"]
          for r in s.reader.docmap.collect()}
    assert dm == {"k2": 0, "k3": 1, "k1": 2}   # ascending pri order
    hits = s.search(TermQuery("beta", field="title"), k=5).collect()
    assert [r["key"] for r in hits] == ["k2"]
    hits = s.search(TermQuery("beta", field="body"), k=5).collect()
    assert [r["key"] for r in hits] == ["k2"]


def test_multifield_phrase_equals_single_field(spark, tmp_path_factory,
                                               mf_searcher):
    """Positional queries are per-field too: a phrase against `body`
    scores exactly like the same phrase on a single-field index over the
    body column (positions are stored per qualified term)."""
    single = _single_field_searcher(
        spark, tmp_path_factory.mktemp("sf_phrase"), "body")
    q_mf = PhraseQuery(["order", "sort"], field="body")
    got = _hits(mf_searcher.search(q_mf, k=10))
    want = _hits(single.search(PhraseQuery(["order", "sort"]), k=10))
    assert got == want and got


def test_arabic_greek_field_analyzers_end_to_end(spark, tmp_path):
    """r05 chains as field analyzers: an ar_stem field matches the
    stemmed Arabic query literal (article stripped), an el_stem field
    matches inflected Greek — the parser re-analyzes literals with the
    field's chain, same as the en_stem path."""
    from tantivy_spark.query.parser import QueryParser
    from tantivy_spark.query.searcher import Searcher

    docs = spark.createDataFrame(
        [("k1", "الكتاب كبير", "υπολογιστές γρήγοροι"),
         ("k2", "كتابهم جديد", "παιδιά παίζουν")],
        "key STRING, ar STRING, el STRING")
    out = str(tmp_path / "mf_ar_el")
    cfg = IndexConfig(key_col="key",
                      field_cols={"ar": "ar", "el": "el"},
                      field_analyzers={"ar": "ar_stem", "el": "el_stem"},
                      n_segments=1)
    build_index(spark, docs, out, cfg)
    r = IndexReader(spark, out)
    dfs = r.doc_freqs([f"ar{FIELD_SEP}كتاب", f"el{FIELD_SEP}υπολογιστ"])
    assert dfs[f"ar{FIELD_SEP}كتاب"] == 2     # both stem to كتاب
    assert dfs[f"el{FIELD_SEP}υπολογιστ"] == 1

    p = QueryParser(field_analyzers={"ar": "ar_stem", "el": "el_stem"})
    s = Searcher(r)
    q = p.parse("ar:الكتاب")                   # literal re-stems to كتاب
    assert {row["key"] for row in s.search(q, k=10).collect()} == \
        {"k1", "k2"}
    q2 = p.parse("el:υπολογιστές")
    assert {row["key"] for row in s.search(q2, k=10).collect()} == {"k1"}
