"""Snippet generation tests (ref: src/snippet/mod.rs semantics: best
fragment by unique-term score within max_num_chars, <b> highlighting)."""

from tantivy_spark.query.snippet import _best_fragment


def test_basic_highlight():
    frag, n = _best_fragment("the quick brown fox", {"quick", "fox"}, {}, 150)
    assert frag == "<b>quick</b> brown <b>fox</b>"
    assert n == 2


def test_fragment_prefers_more_unique_terms():
    text = ("alpha alpha alpha alpha filler filler filler filler filler "
            "filler filler beta gamma end")
    frag, _ = _best_fragment(text, {"alpha", "beta", "gamma"}, {}, 12)
    # the (beta, gamma) window scores 2 unique terms; any alpha-only
    # window scores 1
    assert "<b>beta</b>" in frag and "<b>gamma</b>" in frag


def test_term_scores_weight_fragments():
    text = "rare filler filler filler filler filler common common common"
    frag, _ = _best_fragment(text, {"rare", "common"},
                             {"rare": 5.0, "common": 1.0}, 10)
    assert "<b>rare</b>" in frag


def test_no_match_empty():
    assert _best_fragment("nothing here", {"zzz"}, {}, 100) == ("", 0)


def test_max_chars_respected():
    text = "x " * 200 + "needle " + "y " * 200
    frag, _ = _best_fragment(text, {"needle"}, {}, 50)
    assert len(frag) <= 50 + len("<b></b>")
    assert frag.startswith("<b>needle</b>")


def test_case_insensitive_against_analyzer_terms():
    frag, _ = _best_fragment("The QUICK fox", {"quick", "the"}, {}, 150)
    assert frag == "<b>The</b> <b>QUICK</b> fox"


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
