"""Pinned golden top-k results (FIXTURES.md §3): generated once from the
scoring spec by the numpy golden engine and checked in.  Both execution
paths must reproduce them — the exact DataFrame scorer (f64, rank + f32-
tolerance scores) and the WAND kernel (f32 bit-equal) — so any regression
in analyzer, quantization, BM25, tie-break, codec, or pruning trips here.
"""

import json
import os

import numpy as np
import pytest

from tantivy_spark.query import (
    BooleanQuery,
    BoostQuery,
    DisjunctionMaxQuery,
    Occur,
    PhraseQuery,
    TermQuery,
)
from tantivy_spark.query.exact import ExactSearcher
from tantivy_spark.query.wand import wand_topk

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "goldens", "topk_sf0001.json")

QUERIES = {
    "term_hot": TermQuery("the"),
    "term_mid": TermQuery("data"),
    "bool_and": BooleanQuery([(Occur.MUST, TermQuery("fast")),
                              (Occur.MUST, TermQuery("scan"))]),
    "bool_or": BooleanQuery([(Occur.SHOULD, TermQuery("fast")),
                             (Occur.SHOULD, TermQuery("slow"))]),
    "bool_not": BooleanQuery([(Occur.MUST, TermQuery("table")),
                              (Occur.MUST_NOT, TermQuery("slow"))]),
    "phrase": PhraseQuery(["order", "sort"]),
    "dismax": DisjunctionMaxQuery([TermQuery("fast"), TermQuery("slow")],
                                  tie_breaker=0.3),
    "boost": BoostQuery(TermQuery("data"), 2.5),
}

WAND_SHAPES = {
    "term_hot": ("or", ["the"]),
    "term_mid": ("or", ["data"]),
    "bool_and": ("and", ["fast", "scan"]),
    "bool_or": ("or", ["fast", "slow"]),
}


@pytest.fixture(scope="module")
def goldens():
    with open(GOLDEN_PATH) as f:
        return json.load(f)


@pytest.mark.parametrize("name", list(QUERIES))
def test_exact_reproduces_pinned_goldens(tiny_index, goldens, name):
    got = ExactSearcher(tiny_index).search(QUERIES[name], k=10).collect()
    want = goldens[name]
    assert [(r["rank"], r["segment_ord"], r["doc_id"]) for r in got] == \
        [(w["rank"], w["segment_ord"], w["doc_id"]) for w in want]
    for r, w in zip(got, want):
        assert r["score"] == pytest.approx(w["score_f32"], rel=1e-5)


@pytest.mark.parametrize("name", list(WAND_SHAPES))
def test_wand_reproduces_pinned_goldens_bitexact(tiny_index, goldens, name):
    mode, terms = WAND_SHAPES[name]
    got = wand_topk(tiny_index, terms, k=10, mode=mode).collect()
    want = goldens[name]
    assert [(r["rank"], r["segment_ord"], r["doc_id"]) for r in got] == \
        [(w["rank"], w["segment_ord"], w["doc_id"]) for w in want]
    for r, w in zip(got, want):
        assert np.float32(r["score"]) == np.float32(w["score_f32"])


def test_text_byte_identity_invariant(tiny_pages):
    """Per-row invariant (input_hint): extracted text is byte-identical
    per url — html wraps text, and text itself is never mutated."""
    from pyspark.sql import functions as F

    bad = tiny_pages.filter(
        F.encode(F.coalesce(F.col("text"), F.lit("")), "UTF-8")
        != F.expr("substring(html, 13, octet_length(html) - 26)")
    ).count()
    assert bad == 0
