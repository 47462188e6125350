"""Snippet generation tests.

The fragment-construction vectors are ported from the reference's unit
tests (src/snippet/mod.rs tests: test_snippet, test_snippet_scored_
fragment, test_snippet_in_second_fragment, test_snippet_with_term_at_
the_end_of_fragment, test_snippet_with_second_fragment_has_the_highest_
score, test_snippet_with_term_not_in_text) — pinned goldens so fragment
selection and <b> boundaries cannot drift silently.
"""

from tantivy_spark.query.snippet import (
    _best_fragment,
    search_fragments,
    select_best_fragment,
)

# the reference's TEST_TEXT (snippet/mod.rs:491)
TEST_TEXT = """Rust is a systems programming language sponsored by
Mozilla which describes it as a "safe, concurrent, practical language", supporting functional and
imperative-procedural paradigms. Rust is syntactically similar to C++[according to whom?],
but its designers intend it to provide better memory safety while still maintaining
performance.

Rust is free and open-source software, released under an MIT License, or Apache License
2.0. Its designers have refined the language through the experiences of writing the Servo
web browser layout engine[14] and the Rust compiler. A large proportion of current commits
to the project are from community members.[15]

Rust won first place for "most loved programming language" in the Stack Overflow Developer
Survey in 2016, 2017, and 2018."""


def test_snippet_reference_vector():
    """ref test_snippet / test_snippet_generator_custom_highlighted_elements"""
    terms = {"rust": 1.0, "language": 0.9}
    frags = search_fragments(TEST_TEXT, terms, 100)
    assert len(frags) == 7
    assert frags[0][0] == 1.9          # first fragment score
    assert frags[0][2] == 89           # first fragment stop_offset
    html, _n = _best_fragment(TEST_TEXT, terms, 100)
    assert html == (
        '<b>Rust</b> is a systems programming <b>language</b> sponsored '
        'by\nMozilla which describes it as a &quot;safe')


def test_snippet_scored_fragment():
    """ref test_snippet_scored_fragment: relative term scores flip which
    fragment wins."""
    html, _ = _best_fragment(TEST_TEXT, {"rust": 1.0, "language": 0.9}, 20)
    assert html == "<b>Rust</b> is a systems"
    html, _ = _best_fragment(TEST_TEXT, {"rust": 0.9, "language": 1.0}, 20)
    assert html == "programming <b>language</b>"


def test_snippet_in_second_fragment():
    frags = search_fragments("a b c d e f g", {"c": 1.0}, 3)
    assert len(frags) == 1
    assert frags[0][:3] == (1.0, 4, 7)
    html, _ = _best_fragment("a b c d e f g", {"c": 1.0}, 3)
    assert html == "<b>c</b> d"


def test_snippet_with_term_at_the_end_of_fragment():
    frags = search_fragments("a b c d e f f g", {"f": 1.0}, 3)
    assert len(frags) == 2
    assert frags[0][:3] == (1.0, 8, 11)
    html, _ = _best_fragment("a b c d e f f g", {"f": 1.0}, 3)
    assert html == "e <b>f</b>"


def test_snippet_with_second_fragment_has_the_highest_score():
    frags = search_fragments("a b c d e f g", {"f": 1.0, "a": 0.9}, 7)
    assert len(frags) == 2
    assert frags[0][:3] == (0.9, 0, 7)
    html, _ = _best_fragment("a b c d e f g", {"f": 1.0, "a": 0.9}, 7)
    assert html == "e <b>f</b> g"


def test_snippet_with_term_not_in_text():
    assert search_fragments("a b c d", {"z": 1.0}, 3) == []
    assert _best_fragment("a b c d", {"z": 1.0}, 3) == ("", 0)
    assert _best_fragment("a b c d", {}, 3) == ("", 0)


def test_tie_breaks_to_earliest_fragment():
    frags = search_fragments("a x a", {"a": 1.0}, 1)
    assert len(frags) == 2
    assert select_best_fragment(frags)[:3] == (1.0, 0, 1)


def test_html_escaping_minimal():
    html, _ = _best_fragment('x < "y" & z', {"z": 1.0}, 50)
    assert html == 'x &lt; &quot;y&quot; &amp; <b>z</b>'


def test_case_insensitive_against_analyzer_terms():
    frag, _ = _best_fragment("The QUICK fox", {"quick": 1.0, "the": 1.0}, 150)
    assert frag == "<b>The</b> <b>QUICK</b> fox"


def test_max_chars_respected():
    text = "x " * 200 + "needle " + "y " * 200
    frag, _ = _best_fragment(text, {"needle": 1.0}, 50)
    assert len(frag) <= 50 + len("<b></b>")
    assert frag.startswith("<b>needle</b>")


def test_snippets_for_topk_end_to_end(spark, tiny_index):
    from pyspark.sql import functions as F

    from tantivy_spark.query import TermQuery
    from tantivy_spark.query.exact import ExactSearcher
    from tantivy_spark.query.snippet import snippets_for_topk

    s = ExactSearcher(tiny_index)
    top = s.search(TermQuery("data"), k=5)
    # docstore = a frame keyed like the index (tiny fixture: url keys)
    source = tiny_index.docmap.select(F.col("key").alias("url"),
                                      F.lit("data pipelines move data").alias("text"))
    out = snippets_for_topk(top, source, ["data"]).collect()
    assert len(out) == 5
    assert all("<b>data</b>" in r["snippet"] for r in out)
    assert [r["rank"] for r in out] == [1, 2, 3, 4, 5]


def test_snippet_oracle_matches_kernel():
    """The DuckDB snippet oracle (oracle.snippet_sql) replays the greedy
    fragment walk + highlight assembly byte-for-byte against the Arrow
    kernel, including escaping and overflow boundaries."""
    import duckdb

    from tantivy_spark.oracle import snippet_sql

    rows = [
        (0, "data moves fast " * 20),                  # overflow fragments
        (1, "no match here at all"),                   # empty snippet
        (2, "x " * 80 + "data data end"),              # match in 2nd frag
        (3, "a <tag> & \"data\" 'q' data"),            # escaping
    ]
    con = duckdb.connect()
    con.sql("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    top = ("SELECT CAST(row_number() OVER (ORDER BY doc_id) AS BIGINT) "
           "AS rank, doc_id FROM documents")
    got = con.sql(snippet_sql(top, "data")).df()
    want = {doc_id: _best_fragment(text, {"data": 1.0}, 150)[0]
            for doc_id, text in rows}
    assert len(got) == len(rows)
    for _, r in got.iterrows():
        assert r["snippet"] == want[r["doc_id"]], r["doc_id"]


# ------------------------------------------------------------------
# collapse_overlapped_ranges ports (snippet/mod.rs tests at :828-908)

def test_collapse_overlapped_ranges():
    from tantivy_spark.query.snippet import collapse_overlapped_ranges as c
    assert c([(0, 1), (2, 3)]) == [(0, 1), (2, 3)]
    assert c([(0, 1), (1, 2)]) == [(0, 1), (1, 2)]   # adjacent NOT merged
    assert c([(0, 2), (1, 2)]) == [(0, 2)]
    assert c([(0, 2), (1, 3)]) == [(0, 3)]
    assert c([(0, 3), (1, 2)]) == [(0, 3)]


def test_collapse_families():
    """ref test_no_overlap / _adjacent / _overlapping / _contained /
    _duplicate / _unsorted / _complex / _empty / _single / _zero_length"""
    from tantivy_spark.query.snippet import collapse_overlapped_ranges as c
    assert c([(0, 1), (2, 3), (4, 5)]) == [(0, 1), (2, 3), (4, 5)]
    assert c([(0, 1), (1, 2), (2, 3)]) == [(0, 1), (1, 2), (2, 3)]
    assert c([(0, 2), (1, 3), (2, 4)]) == [(0, 4)]
    assert c([(0, 5), (1, 2), (3, 4)]) == [(0, 5)]
    assert c([(0, 2), (2, 4), (0, 2), (2, 4)]) == [(0, 2), (2, 4)]
    assert c([(2, 4), (0, 2), (1, 3)]) == [(0, 4)]
    assert c([(0, 2), (5, 7), (1, 3), (8, 9), (2, 4), (3, 6), (8, 10)]) \
        == [(0, 7), (8, 10)]
    assert c([]) == []
    assert c([(0, 5)]) == [(0, 5)]
    assert c([(0, 0), (1, 1), (2, 2), (3, 3)]) == \
        [(0, 0), (1, 1), (2, 2), (3, 3)]


def test_snippet_with_no_terms():
    """ref test_snippet_with_no_terms: empty Snippet surface."""
    from tantivy_spark.query.snippet import (
        Snippet, search_fragments, select_best_fragment_combination)
    frags = search_fragments("a b c d", {}, 3)
    assert frags == []
    snip = select_best_fragment_combination(frags, "a b c d")
    assert snip.fragment == ""
    assert snip.to_html() == ""
    assert snip.is_empty()
    assert isinstance(snip, Snippet)


def test_snippet_with_overlapped_highlighted_ranges():
    """ref test_snippet_with_overlapped_highlighted_ranges: 2-gram
    tokens over "abc" highlight the overlap as ONE <b> span."""
    from tantivy_spark.query.snippet import (
        ngram_tokens, search_fragments, select_best_fragment_combination)
    text = "abc"
    terms = {"ab": 0.9, "bc": 1.0}
    frags = search_fragments(text, terms, 3,
                             tokens=ngram_tokens(text, 2, 2))
    assert len(frags) == 1
    score, start, stop, _hl = frags[0]
    assert abs(score - 1.9) < 1e-9
    assert (start, stop) == (0, 3)
    snip = select_best_fragment_combination(frags, text)
    assert snip.fragment == "abc"
    assert snip.to_html() == "<b>abc</b>"


def test_snippet_custom_highlighted_elements():
    """ref test_snippet_generator_custom_highlighted_elements."""
    from tantivy_spark.query.snippet import (
        search_fragments, select_best_fragment_combination)
    terms = {"rust": 1.0, "language": 0.9}
    frags = search_fragments(TEST_TEXT, terms, 100)
    snip = select_best_fragment_combination(frags, TEST_TEXT)
    assert snip.to_html() == (
        '<b>Rust</b> is a systems programming <b>language</b> sponsored '
        'by\nMozilla which describes it as a &quot;safe')
    snip.set_snippet_prefix_postfix('<q class="super">', "</q>")
    assert snip.to_html() == (
        '<q class="super">Rust</q> is a systems programming '
        '<q class="super">language</q> sponsored by\nMozilla which '
        'describes it as a &quot;safe')


def test_snippet_generator_term_score(spark, tmp_path):
    """ref test_snippet_generator_term_score: scores are 1/(1+df) and
    df=0 terms drop."""
    from tantivy_spark.index.build import IndexConfig, build_index
    from tantivy_spark.index.reader import IndexReader
    from tantivy_spark.query import BooleanQuery, Occur, TermQuery
    from tantivy_spark.query.exact import ExactSearcher
    from tantivy_spark.query.snippet import SnippetGenerator

    df = spark.createDataFrame(
        [("0", "a"), ("1", "a"), ("2", "a b")], "key STRING, text STRING")
    out = str(tmp_path / "sg")
    build_index(spark, df, out, IndexConfig(
        key_col="key", text_col="text", n_segments=1, segment_expr="0"),
        resume=False)
    s = ExactSearcher(IndexReader(spark, out))

    def bool_of(*terms):
        return BooleanQuery([(Occur.SHOULD, TermQuery(t)) for t in terms])

    gen = SnippetGenerator.create(s, TermQuery("e"))
    assert gen.terms_text == {}
    gen = SnippetGenerator.create(s, TermQuery("a"))
    assert gen.terms_text == {"a": 0.25}
    gen = SnippetGenerator.create(s, bool_of("a", "b"))
    assert gen.terms_text == {"a": 0.25, "b": 0.5}
    gen = SnippetGenerator.create(s, bool_of("a", "b", "c"))
    assert gen.terms_text == {"a": 0.25, "b": 0.5}
    assert gen.max_num_chars == 150          # reference default


def test_snippet_generator_stemmed():
    """ref test_snippet_generator (en_stem): stemmed query terms
    highlight surface forms at original offsets."""
    from tantivy_spark.query.snippet import SnippetGenerator

    gen = SnippetGenerator(
        {"rust": 1.0 / 2.0, "design": 1.0 / 2.0}, chain="en_stem")
    snip = gen.snippet(TEST_TEXT)
    assert snip.to_html() == (
        "imperative-procedural paradigms. <b>Rust</b> is syntactically "
        "similar to C++[according to whom?],\nbut its <b>designers</b> "
        "intend it to provide better memory safety")
    gen.set_max_num_chars(90)
    snip = gen.snippet(TEST_TEXT)
    assert snip.to_html() == (
        "<b>Rust</b> is syntactically similar to C++[according to "
        "whom?],\nbut its <b>designers</b> intend it to")


def test_snippet_from_doc():
    """snippet_from_doc concatenates the field's string values."""
    from tantivy_spark.query.snippet import SnippetGenerator
    gen = SnippetGenerator({"needle": 1.0})
    snip = gen.snippet_from_doc({"text": ["pre", "a needle here"]},
                                field="text")
    assert snip.to_html() == "pre a <b>needle</b> here"
