"""Verbatim ports of the reference's phrase-intersection unit vectors
(/root/reference/src/query/phrase_query/phrase_scorer.rs:588-705:
test_intersection, test_slop, test_merge_slop,
test_carry_slop_intersection) against the Python kernel mirrors.

No Spark involved — these pin the per-document matching semantics the
distributed phrase path delegates to.
"""

import pytest

from tantivy_spark.query.sloppy import (
    intersection,
    intersection_count,
    intersection_count_with_carrying_slop,
    intersection_count_with_slop,
    phrase_count,
    sloppy_phrase_count,
)


def check_intersection_aux(left, right, expected, slop):
    if slop == 0:
        assert intersection_count(left, right) == len(expected)
        assert intersection(left, right) == list(expected)
    else:
        count, new_left = intersection_count_with_slop(left, right, slop, True)
        assert new_left == list(expected)


def check_intersection_sym(left, right, expected):
    check_intersection_aux(left, right, expected, 0)
    check_intersection_aux(right, left, expected, 0)


def test_intersection():
    # phrase_scorer.rs:612-619
    check_intersection_sym([1], [1], [1])
    check_intersection_sym([1], [2], [])
    check_intersection_sym([], [2], [])
    check_intersection_sym([5, 7], [1, 5, 10, 12], [5])
    check_intersection_sym([1, 5, 6, 9, 10, 12], [6, 8, 9, 12], [6, 9, 12])


def test_slop():
    # phrase_scorer.rs:620-632 — "slop is not symmetric" vectors
    check_intersection_aux([1], [2], [2], 1)
    check_intersection_aux([1], [3], [], 1)
    check_intersection_aux([1], [3], [3], 2)
    check_intersection_aux([], [2], [], 100000)
    check_intersection_aux([5, 7, 11], [1, 5, 10, 12], [5, 10], 1)
    check_intersection_aux([1, 5, 6, 9, 10, 12], [6, 8, 9, 12], [6, 8, 9, 12], 1)
    check_intersection_aux([1, 5, 6, 9, 10, 12], [6, 8, 9, 12], [6, 8, 9, 12], 10)
    check_intersection_aux([1, 3, 5], [2, 4, 6], [2, 4, 6], 1)
    check_intersection_aux([1, 3, 5], [2, 4, 6], [], 0)


def test_merge_slop():
    # phrase_scorer.rs:634-649
    for left, right, expected_left, slop in [
        ([1, 2], [1], [1], 1),
        ([3], [4], [4], 2),
        ([3], [4], [4], 2),
        ([1, 5, 6, 9, 10, 12], [6, 8, 9, 12], [6, 8, 9, 12], 10),
    ]:
        _, new_left = intersection_count_with_slop(left, right, slop, True)
        assert new_left == expected_left


def carry_aux(rights, expected, slop, expected_count):
    # mirrors test_carry_slop_intersection_aux (phrase_scorer.rs:651-676):
    # left seeded from rights[0] with explicit zero slops
    left = list(rights[0])
    slops = [0] * len(left)
    count = 0
    for right in rights[1:]:
        count, left, slops = intersection_count_with_carrying_slop(
            left, slops, right, slop, True)
    assert list(zip(slops, left)) == expected
    assert count == expected_count


def test_carry_slop_intersection():
    # phrase_scorer.rs:678-705 — verbatim
    carry_aux([[1], []], [], 1, 0)
    carry_aux([[1], [2]], [(1, 1), (1, 2)], 1, 1)
    carry_aux([[1], [3]], [], 1, 0)
    carry_aux([[1], [2]], [(1, 1), (1, 2)], 1, 1)

    # The order may still matter
    carry_aux([[1], [2], [2]], [(1, 2)], 1, 1)
    carry_aux([[2], [1], [2]], [(1, 2)], 1, 1)
    carry_aux([[2], [2], [1]], [(1, 1), (1, 2)], 1, 1)

    carry_aux([[2], [2], [1], [2]], [(1, 2)], 1, 1)
    carry_aux([[1], [2], [2], [2]], [(1, 2)], 1, 1)

    carry_aux([[1], [2], [1]], [(1, 1)], 1, 1)

    carry_aux([[11], [10, 12]], [(1, 10), (1, 11), (1, 12)], 1, 1)
    carry_aux([[10, 12], [11]], [(1, 10), (1, 11), (1, 12)], 1, 1)

    carry_aux([[5, 7, 11], [1, 5, 10, 12]],
              [(0, 5), (1, 10), (1, 11), (1, 12)], 1, 2)


# --- end-to-end count semantics pinned by phrase_query/mod.rs tests ---

def positions_of(text, terms):
    toks = text.lower().split()
    return [[i for i, t in enumerate(toks) if t == term] for term in terms]


@pytest.mark.parametrize("text,terms,slop,want", [
    # test_phrase_slop (phrase_query/mod.rs:239-257)
    ("a x b c", ["a", "b", "c"], 1, True),
    ("a x b x c", ["a", "b", "c"], 1, False),
    ("a b", ["b", "a"], 1, False),          # transposition costs 2
    ("a b", ["b", "a"], 2, True),
    # test_phrase_score_with_slop_bug (mod.rs:182-188)
    ("asdf asdf captain subject wendy", ["captain", "wendy"], 1, True),
    ("captain", ["captain", "wendy"], 1, False),
    # test_phrase_score_with_slop_bug_2 (mod.rs:190-201)
    ("a x b x c", ["a", "b", "c"], 2, True),
    ("a a c", ["a", "b", "c"], 2, False),
    ("b c c", ["a", "b", "c"], 2, False),
    # test_phrase_score_with_slop_repeating (mod.rs:220-226)
    ("wendy subject subject captain", ["wendy", "subject", "captain"], 1, True),
    ("captain", ["wendy", "subject", "captain"], 1, False),
    # test_phrase_score_with_slop_ordering (mod.rs:254-270)
    ("a e b e c", ["a", "b", "c"], 3, True),
    ("a e e e e e b e e e e c", ["a", "b", "c"], 3, False),
    # NOTE: the Rust comment says "the first and last matches" but five
    # docs match; the test's own pinned scores prove it (scores[1] =
    # 0.27310878 is the 3-token doc "a c b", scores[3] = 0.25024384 the
    # 4-token "a e c b" — both only consistent with those docs matching).
    ("a c b", ["a", "b", "c"], 3, True),
    ("a e c b", ["a", "b", "c"], 3, True),
    ("a e b c", ["a", "b", "c"], 3, True),
])
def test_phrase_match_reference_semantics(text, terms, slop, want):
    got = phrase_count(positions_of(text, terms), slop) > 0
    assert got == want, (text, terms, slop)


def test_slop_size_counts():
    # test_phrase_score_with_slop_size (mod.rs:228-237): ["a","c"] slop 3
    assert phrase_count(positions_of("a b e c", ["a", "c"]), 3) == 1
    assert phrase_count(positions_of("a e e e c", ["a", "c"]), 3) == 1
    assert phrase_count(positions_of("a e e e e c", ["a", "c"]), 3) == 0


def test_offsets_reference_vectors():
    # test_phrase_query_non_trivial_offsets (mod.rs:302-345) over
    # "a b c d e f g h" with explicit (offset, term) pairs
    text = "a b c d e f g h"

    def match(pairs):
        offsets = [o for o, _ in pairs]
        terms = [t for _, t in pairs]
        return phrase_count(positions_of(text, terms), 0, offsets) > 0

    assert match([(0, "a"), (1, "b")])
    assert match([(1, "b"), (0, "a")])
    assert not match([(0, "a"), (2, "b")])
    assert match([(0, "a"), (2, "c")])
    assert match([(0, "a"), (2, "c"), (3, "d")])
    assert match([(0, "a"), (2, "c"), (4, "e")])
    assert match([(4, "e"), (0, "a"), (2, "c")])
    assert not match([(0, "a"), (2, "d")])
    assert match([(1, "a"), (3, "c")])


def test_exact_phrase_counts_repeated_terms():
    # test_phrase_query (mod.rs:41-73): ["b","b"] matches docs 0 and 1
    assert phrase_count(positions_of("b b b d c g c", ["b", "b"]), 0) == 2
    assert phrase_count(positions_of("a b b d c g c", ["b", "b"]), 0) == 1
    assert phrase_count(positions_of("a b a b c", ["b", "b"]), 0) == 0


def test_empty_and_single():
    assert sloppy_phrase_count([], 0) == 0
    assert sloppy_phrase_count([[1, 2]], 0) == 2
    assert sloppy_phrase_count([[1], []], 3) == 0


# ------------------------------------------------- doc-parallel numpy kernel

def test_two_term_batch_equals_per_doc_kernel():
    """sloppy_count_two_batch is a SIMD interpretation of
    intersection_count_with_slop(update_left=False) — property-test the
    equivalence over randomized sorted-unique position lists (including
    empties, duplicates across lists, tight/loose slops)."""
    import random

    from tantivy_spark.query.sloppy import (
        intersection_count_with_slop,
        sloppy_count_two_batch,
    )

    rng = random.Random(1234)
    lefts, rights, slops_per_case = [], [], []
    for _ in range(600):
        nl = rng.randrange(0, 12)
        nr = rng.randrange(0, 12)
        lefts.append(sorted(rng.sample(range(40), nl)))
        rights.append(sorted(rng.sample(range(40), nr)))
        slops_per_case.append(rng.choice([0, 1, 2, 3, 5, 10, 255]))
    for slop in sorted(set(slops_per_case)):
        idx = [i for i, s in enumerate(slops_per_case) if s == slop]
        got = sloppy_count_two_batch([lefts[i] for i in idx],
                                     [rights[i] for i in idx], slop)
        want = [intersection_count_with_slop(lefts[i], rights[i],
                                             slop, False)[0]
                for i in idx]
        assert list(got) == want, (slop, [
            (lefts[i], rights[i], g, w)
            for i, g, w in zip(idx, got, want) if g != w][:3])


def test_two_term_batch_reference_shapes():
    """The mod.rs slop vectors, replayed through the batched kernel."""
    from tantivy_spark.query.sloppy import (
        shifted_positions,
        sloppy_count_two_batch,
    )

    cases = [  # (text, terms, slop, want) from the phrase slop vectors
        ("a b e c", ["a", "c"], 3, 1),
        ("a e e e c", ["a", "c"], 3, 1),
        ("a e e e e c", ["a", "c"], 3, 0),
        ("a b c", ["a", "b"], 0, 1),
        ("b a", ["a", "b"], 1, 0),
        ("b a", ["a", "b"], 2, 1),
    ]
    lefts, rights = [], []
    for text, terms, _, _ in cases:
        toks = text.split()
        pls = [[i for i, t in enumerate(toks) if t == term]
               for term in terms]
        sh = shifted_positions(pls)
        lefts.append(sh[0])
        rights.append(sh[1])
    for (_, _, slop, want), left, right in zip(cases, lefts, rights):
        got = sloppy_count_two_batch([left], [right], slop)
        assert got[0] == want


def test_carrying_batch_single_stage_equivalence():
    """sloppy_carrying_batch == intersection_count_with_carrying_slop
    per doc, BOTH modes: counts, and the (new_left, new_slops) pair in
    update mode — randomized sorted-unique lists with random carried
    slops (including wrap-range values) and empties."""
    import random

    import numpy as np

    from tantivy_spark.query.sloppy import (
        _flatten_lists,
        intersection_count_with_carrying_slop,
        sloppy_carrying_batch,
    )

    rng = random.Random(4321)
    cases = []
    for _ in range(500):
        nl = rng.randrange(0, 10)
        nr = rng.randrange(0, 10)
        left = sorted(rng.sample(range(30), nl))
        right = sorted(rng.sample(range(30), nr))
        # slops may be SHORTER than left (missing -> 0) like the ref
        slops = [rng.choice([0, 0, 1, 2, 3, 250])
                 for _ in range(rng.randrange(0, nl + 1))]
        cases.append((left, slops, right, rng.choice([1, 2, 3, 5, 254])))
    for slop in sorted({c[3] for c in cases}):
        sub = [c for c in cases if c[3] == slop]
        lv, lo, ll = _flatten_lists([c[0] for c in sub])
        sv = np.zeros_like(lv)
        for di, c in enumerate(sub):       # align slops, zero-padded
            for i, s in enumerate(c[1][:len(c[0])]):
                sv[lo[di] + i] = s
        rv, ro, rl = _flatten_lists([c[2] for c in sub])
        slen = np.array([min(len(c[1]), len(c[0])) for c in sub],
                        dtype=np.int64)
        for mode_update in (False, True):
            cnt, (ed, ep, es) = sloppy_carrying_batch(
                lv, lo, ll, sv, rv, ro, rl, slop, mode_update,
                slen=slen)
            lens = np.bincount(ed, minlength=len(sub)) if len(ed) \
                else np.zeros(len(sub), np.int64)
            offs = np.concatenate(([0], np.cumsum(lens)[:-1])) \
                if len(sub) else []
            for di, (left, slops, right, _) in enumerate(sub):
                want_c, want_l, want_s = \
                    intersection_count_with_carrying_slop(
                        list(left), list(slops), list(right), slop,
                        mode_update)
                assert cnt[di] == want_c, (slop, mode_update, left,
                                           slops, right)
                if mode_update:
                    got_l = list(ep[offs[di]:offs[di] + lens[di]])
                    got_s = list(es[offs[di]:offs[di] + lens[di]])
                    assert got_l == want_l, (slop, left, slops, right,
                                             got_l, want_l)
                    assert got_s == want_s, (slop, left, slops, right,
                                             got_s, want_s)


def test_carrying_batch_pipeline_equivalence():
    """sloppy_phrase_count_batch == sloppy_phrase_count doc-by-doc over
    randomized 3-5-term shifted position sets."""
    import random

    from tantivy_spark.query.sloppy import (
        sloppy_phrase_count,
        sloppy_phrase_count_batch,
    )

    rng = random.Random(99)
    for n_terms in (3, 4, 5):
        for slop in (1, 2, 4):
            docs = []
            for _ in range(150):
                docs.append([sorted(rng.sample(range(40),
                                               rng.randrange(0, 9)))
                             for _ in range(n_terms)])
            got = sloppy_phrase_count_batch(
                [[d[t] for d in docs] for t in range(n_terms)], slop)
            for di, pls in enumerate(docs):
                want = sloppy_phrase_count([list(p) for p in pls], slop)
                assert got[di] == want, (n_terms, slop, pls,
                                         got[di], want)


def test_carrying_batch_reference_pipeline_vectors():
    """The multi-term slop shapes from the reference's phrase tests,
    through the batched pipeline."""
    from tantivy_spark.query.sloppy import (
        shifted_positions,
        sloppy_phrase_count,
        sloppy_phrase_count_batch,
    )

    texts = ["a b e c d", "a e b e c x d", "d c b a", "a x x b x x c q d"]
    terms = ["a", "b", "c", "d"]
    cols = []
    for text in texts:
        toks = text.split()
        pls = [[i for i, t in enumerate(toks) if t == term]
               for term in terms]
        cols.append(shifted_positions(pls))
    for slop in (1, 2, 3, 6):
        got = sloppy_phrase_count_batch(
            [[cols[d][t] for d in range(len(texts))]
             for t in range(len(terms))], slop)
        for d in range(len(texts)):
            assert got[d] == sloppy_phrase_count(
                [list(p) for p in cols[d]], slop), (slop, texts[d])
