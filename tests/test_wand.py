"""WAND kernel == exhaustive scoring (pruning must never change results).

Mirrors the reference's property test (block_wand_union.rs:293-320:
random corpora, WAND top-k equals exhaustive heap top-k), using the tiny
corpus + the golden engine as the exhaustive oracle, with f32 score
bit-equality."""

import numpy as np
import pytest

from tantivy_spark.query import BooleanQuery, Occur, TermQuery
from tantivy_spark.query.golden import GoldenIndex
from tantivy_spark.query.wand import wand_topk

UNION_CASES = [
    (["the"], 10),
    (["data"], 5),
    (["fast", "slow"], 10),
    (["the", "data", "join"], 10),
    (["fast", "slow", "scan", "merge"], 7),
    (["zzz_nope"], 10),
    (["zzz_nope", "data"], 10),
    (["the"], 1),
    (["the", "of"], 100),
]

AND_CASES = [
    (["fast", "scan"], 10),
    (["the", "data"], 10),
    (["fast", "slow", "scan"], 10),
    (["data", "zzz_nope"], 10),
    (["table"], 10),
]


def _golden_topk(golden: GoldenIndex, terms, k, mode):
    occ = Occur.MUST if mode == "and" else Occur.SHOULD
    q = BooleanQuery([(occ, TermQuery(t)) for t in terms])
    return golden.top_k(q, k=k)


@pytest.mark.parametrize("terms,k", UNION_CASES, ids=lambda x: str(x))
def test_wand_union_matches_golden(tiny_index, tiny_golden, terms, k):
    if not isinstance(terms, list):
        pytest.skip("param order")
    got = wand_topk(tiny_index, terms, k=k, mode="or").collect()
    want = _golden_topk(tiny_golden, terms, k, "or")
    assert [(r["segment_ord"], r["doc_id"]) for r in got] == \
        [(s, d) for _r, s, d, _ in want]
    for r, (_rank, _s, _d, ws) in zip(got, want):
        assert np.float32(r["score"]) == np.float32(ws), (r, ws)


@pytest.mark.parametrize("terms,k", AND_CASES, ids=lambda x: str(x))
def test_wand_intersection_matches_golden(tiny_index, tiny_golden, terms, k):
    if not isinstance(terms, list):
        pytest.skip("param order")
    got = wand_topk(tiny_index, terms, k=k, mode="and").collect()
    occ_q = BooleanQuery([(Occur.MUST, TermQuery(t)) for t in terms])
    want = tiny_golden.top_k(occ_q, k=k)
    assert [(r["segment_ord"], r["doc_id"]) for r in got] == \
        [(s, d) for _r, s, d, _ in want]
    for r, (_rank, _s, _d, ws) in zip(got, want):
        assert np.float32(r["score"]) == np.float32(ws)


@pytest.mark.parametrize("terms,k", UNION_CASES[:5], ids=lambda x: str(x))
def test_seeded_wand_identical(tiny_index, tiny_golden, terms, k):
    """Threshold seeding (global kth lower bound shipped to kernels) must
    never change results — byte-identical ranks, addresses, f32 scores."""
    base = wand_topk(tiny_index, terms, k=k, mode="or").collect()
    seeded = wand_topk(tiny_index, terms, k=k, mode="or",
                       seed_threshold=True, min_seed_blocks=0).collect()
    assert [(r["rank"], r["segment_ord"], r["doc_id"], r["score"])
            for r in base] == \
        [(r["rank"], r["segment_ord"], r["doc_id"], r["score"])
         for r in seeded]


def test_seed_threshold_is_valid_lower_bound(tiny_index, tiny_golden):
    from tantivy_spark.bm25 import Bm25Params
    from tantivy_spark.query.wand import global_seed_threshold

    terms = ["the", "data"]
    dfs = tiny_index.doc_freqs(terms)
    params = {t: Bm25Params.for_one_term(dfs[t], tiny_index.num_docs,
                                         tiny_index.avg_fieldnorm)
              for t in terms}
    for k in (1, 5, 10):
        seed = global_seed_threshold(tiny_index, terms, params, k,
                                     min_blocks=0)
        want = _golden_topk(tiny_golden, terms, k, "or")
        kth = want[-1][3]  # golden kth total score
        assert seed <= kth + 1e-6, (k, seed, kth)
        assert seed > float("-inf")
    # the auto-skip: on this tiny corpus every list is far under the
    # default block floor, so the default call declines to seed
    assert global_seed_threshold(tiny_index, terms, params, 5) == \
        float("-inf")


def test_seeding_prunes_decode_work(tiny_index):
    """Direct kernel instrumentation: with a strong seed the kernel
    decodes no more (and typically fewer) blocks than unseeded."""
    import numpy as np

    from tantivy_spark.bm25 import Bm25Params
    from tantivy_spark.query.wand import (
        _TermBlocks, _segment_wand, global_seed_threshold)

    terms = ["the", "of"]
    dfs = tiny_index.doc_freqs(terms)
    params = {t: Bm25Params.for_one_term(dfs[t], tiny_index.num_docs,
                                         tiny_index.avg_fieldnorm)
              for t in terms}
    rows = (tiny_index.postings_for_terms(terms).drop("pos")
            .filter("segment_ord = 0").collect())
    by_term = {}
    for r in rows:
        by_term.setdefault(r["term"], []).append(r)
    tbs = [_TermBlocks(by_term[t], params[t]) for t in terms if t in by_term]
    prms = [params[t] for t in terms if t in by_term]
    seed = global_seed_threshold(tiny_index, terms, params, 3, min_blocks=0)

    s0: dict = {}
    d0, sc0 = _segment_wand(tbs, prms, 3, "or", stats=s0)
    s1: dict = {}
    d1, sc1 = _segment_wand(tbs, prms, 3, "or", seed=seed, stats=s1)
    assert list(d0) == list(d1)
    assert list(sc0) == list(sc1)
    assert s1["decoded_blocks"] <= s0["decoded_blocks"]
    assert s1["processed_strips"] <= s0["processed_strips"]


def test_wand_stats_distributed(tiny_index):
    """The instrumentation surface (wand_stats): distributed counters sum
    across segments; seeding never increases decoded blocks; results stay
    covered by the seeded-identity test above."""
    from tantivy_spark.query.wand import wand_stats

    base = wand_stats(tiny_index, ["the", "of"], k=3, mode="or")
    assert base["total_blocks"] > 0
    assert 0 < base["decoded_blocks"] <= base["total_blocks"]
    assert not base["seeded"]
    seeded = wand_stats(tiny_index, ["the", "of"], k=3, mode="or",
                        seed_threshold=True, min_seed_blocks=0)
    assert seeded["seeded"]
    assert seeded["decoded_blocks"] <= base["decoded_blocks"]


def test_wand_randomized_merged(spark, tmp_path_factory):
    """Random Zipf corpus, single + merged-index variants: WAND == golden."""
    from tantivy_spark.corpus import synthetic_pages
    from tantivy_spark.index.build import IndexConfig, build_index
    from tantivy_spark.index.reader import IndexReader

    pages = synthetic_pages(spark, 400, seed=99).select("url", "text")
    rows = pages.collect()
    golden = GoldenIndex([r["url"] for r in rows], [r["text"] or "" for r in rows],
                         segment_of=lambda i, key: int(key[-12:]) % 3)
    out = str(tmp_path_factory.mktemp("widx") / "rand")
    build_index(spark, pages, out, IndexConfig(
        key_col="url", text_col="text", n_segments=3,
        segment_expr="pmod(cast(substring(url, -12, 12) as bigint), 3)"))
    reader = IndexReader(spark, out)
    for terms, mode in [(["the", "of", "and"], "or"), (["the", "of"], "and"),
                        (["zeta001", "the"], "or"), (["naïve"], "or")]:
        got = wand_topk(reader, terms, k=10, mode=mode).collect()
        occ = Occur.MUST if mode == "and" else Occur.SHOULD
        want = golden.top_k(BooleanQuery([(occ, TermQuery(t)) for t in terms]), k=10)
        assert [(r["segment_ord"], r["doc_id"]) for r in got] == \
            [(s, d) for _r, s, d, _ in want], (terms, mode)
        for r, (_rank, _s, _d, ws) in zip(got, want):
            assert np.float32(r["score"]) == np.float32(ws)


def test_boosted_terms_dispatch_to_wand(tiny_index, tiny_golden):
    """Boosted term unions take the WAND path with per-term baked boosts;
    results equal both the exact scorer and the f32 golden engine."""
    from tantivy_spark.query.ast import BoostQuery
    from tantivy_spark.query.searcher import Searcher, _pure_term_shape

    q = BooleanQuery([
        (Occur.SHOULD, BoostQuery(TermQuery("data"), 2.5)),
        (Occur.SHOULD, TermQuery("join")),
    ])
    shape = _pure_term_shape(q)
    assert shape == ("or", ["data", "join"], [2.5, 1.0])
    s = Searcher(tiny_index)
    w = s.search(q, k=10, method="wand").collect()
    e = s.search(q, k=10, method="exact").collect()
    assert [(r["rank"], r["key"]) for r in w] == [(r["rank"], r["key"]) for r in e]
    want = tiny_golden.top_k(q, k=10)
    assert [(r["segment_ord"], r["doc_id"]) for r in w] == \
        [(sg, d) for _r, sg, d, _ in want]
    for r, (_rank, _s, _d, ws) in zip(w, want):
        assert np.float32(r["score"]) == np.float32(ws)
