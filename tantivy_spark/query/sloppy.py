"""Sloppy-phrase position kernels — faithful Python mirrors of the
reference's phrase intersection algorithms
(/root/reference/src/query/phrase_query/phrase_scorer.rs:100-345).

Semantics worth naming (all ported, all pinned by the reference's own
unit-test vectors in tests/test_sloppy_vectors.py):

- Positions are SHIFTED before matching: term i with phrase offset
  ``off_i`` contributes ``pos + (max_offset - off_i)``, so an exact
  phrase occurrence puts every term at the SAME shifted position
  (phrase_scorer.rs:364-383, PostingsWithOffset).
- Slop matching uses ``abs_diff`` on shifted positions — a transposed
  pair ("b a" vs query "a b") is distance 2, so it matches at slop>=2
  but not slop=1 (phrase_query/mod.rs test_phrase_slop).
- For >2 terms the slop is a BUDGET carried across pairwise
  intersections (intersection_count_with_carrying_slop,
  phrase_scorer.rs:217-345): each surviving position remembers the
  minimum slop spent reaching it, and both sides of a match survive
  (which one is "best" depends on later terms).
- Stored slops are u8 in the reference (``new_slop as u8`` wraps);
  mirrored with ``& 0xFF`` so behavior is identical even for the
  degenerate slop>255 case.

These run per candidate document (documents already known to contain
ALL phrase terms — the Spark side joins postings per term first), over
that document's position arrays: exactly the unit of work the
reference's PhraseScorer does per doc.
"""

from __future__ import annotations


def intersection(left: list[int], right: list[int]) -> list[int]:
    """Two-pointer sorted intersection (phrase_scorer.rs:100-136)."""
    out = []
    li = ri = 0
    while li < len(left) and ri < len(right):
        lv, rv = left[li], right[ri]
        if lv < rv:
            li += 1
        elif lv > rv:
            ri += 1
        else:
            out.append(lv)
            li += 1
            ri += 1
    return out


def intersection_count(left: list[int], right: list[int]) -> int:
    return len(intersection(left, right))


def intersection_count_with_slop(left: list[int], right: list[int],
                                 slop: int, update_left: bool):
    """Greedy slop-tolerant match of two shifted position lists
    (phrase_scorer.rs:145-190).  Returns ``(count, new_left)``; when
    ``update_left`` the surviving positions are the matched RIGHT
    values (the reference stores ``right_val`` into left)."""
    out = list(left)
    li = ri = count = 0
    ll, rl = len(out), len(right)
    while li < ll and ri < rl:
        lv, rv = out[li], right[ri]
        distance = abs(lv - rv)
        if distance <= slop:
            while li + 1 < ll:
                # there could be a better (closer, still <= rv) left
                if out[li + 1] > rv:
                    break
                li += 1
            if update_left:
                out[count] = rv
            count += 1
            li += 1
            ri += 1
        elif lv < rv:
            li += 1
        else:
            ri += 1
    return count, (out[:count] if update_left else list(left))


def intersection_count_with_carrying_slop(left: list[int], slops: list[int],
                                          right: list[int], max_slop: int,
                                          update_left: bool):
    """Multi-term variant that carries the slop budget spent so far
    (phrase_scorer.rs:217-345).  ``slops`` may be shorter than ``left``
    (missing entries read as 0, mirroring ``.get(i).unwrap_or(0)``).

    Returns ``(count, new_left, new_slops)``.
    """
    if not left or not right:
        return 0, ([] if update_left else list(left)), ([] if update_left else list(slops))

    new_left: list[int] = []
    new_slops: list[int] = []

    def add_val(slop_v: int, pos_v: int) -> None:
        if update_left:
            if new_left and new_left[-1] == pos_v:
                new_slops[-1] = min(new_slops[-1], slop_v)
            else:
                new_left.append(pos_v)
                new_slops.append(slop_v)

    li = ri = count = 0
    while True:
        lv = left[li]
        slop_so_far = slops[li] if li < len(slops) else 0
        rv = right[ri]
        distance = slop_so_far + abs(lv - rv)
        if distance <= max_slop:
            if lv < rv:
                smaller, larger, sidx, spos = lv, rv, li, left
            else:
                smaller, larger, sidx, spos = rv, lv, ri, right
            new_slop = distance
            add_val(new_slop & 0xFF, smaller)
            while sidx + 1 < len(spos):
                nv = spos[sidx + 1]
                if nv > larger:
                    # next value is outside the range; current is best
                    break
                sidx += 1
                new_slop = slop_so_far + abs(nv - larger)
                add_val(new_slop & 0xFF, nv)
            add_val(new_slop & 0xFF, larger)
            count += 1
            li += 1
            ri += 1
        elif lv < rv:
            li += 1
        else:
            ri += 1

        if li >= len(left) or ri >= len(right):
            # finish rest (phrase_scorer.rs:305-333)
            if li >= len(left):
                lv_last = left[-1]
                ssf = slops[-1] if slops else 0
                for rv2 in right[ri:]:
                    ns = abs(lv_last - rv2) + ssf
                    if ns <= max_slop:
                        add_val(ns & 0xFF, rv2)
            else:
                rv_last = right[-1]
                for li2 in range(li, len(left)):
                    lv2 = left[li2]
                    ssf = slops[li2] if li2 < len(slops) else 0
                    ns = abs(lv2 - rv_last) + ssf
                    if ns <= max_slop:
                        add_val(ns & 0xFF, lv2)
            break

    if update_left:
        return count, new_left, new_slops
    return count, list(left), list(slops)


def shifted_positions(pos_lists: list[list[int]],
                      offsets: list[int] | None = None) -> list[list[int]]:
    """Apply the reference's per-term shift ``max_offset - off_i``
    (phrase_scorer.rs:364-383) so exact occurrences align."""
    n = len(pos_lists)
    offs = list(offsets) if offsets is not None else list(range(n))
    max_off = max(offs)
    return [[p + (max_off - o) for p in pl] for pl, o in zip(pos_lists, offs)]


def sloppy_phrase_count(pos_lists: list[list[int]], slop: int) -> int:
    """Phrase frequency for one document — the reference's
    compute_phrase_match + compute_phrase_count pipeline
    (phrase_scorer.rs:437-507) over ALREADY-SHIFTED sorted position
    lists (one per phrase term, in phrase order).  Returns 0 if any
    list is empty."""
    n = len(pos_lists)
    if n == 0 or any(not pl for pl in pos_lists):
        return 0
    if n == 1:
        return len(pos_lists[0])
    left = list(pos_lists[0])
    slops: list[int] = []
    for i in range(1, n - 1):
        right = pos_lists[i]
        if slop > 0:
            # n > 2 is implied: this loop only runs when n >= 3
            _, left, slops = intersection_count_with_carrying_slop(
                left, slops, right, slop, True)
        else:
            left = intersection(left, right)
        if not left:
            return 0
    right = pos_lists[n - 1]
    if slop > 0:
        if n > 2:
            c, _, _ = intersection_count_with_carrying_slop(
                left, slops, right, slop, False)
            return c
        return intersection_count_with_slop(left, right, slop, False)[0]
    return intersection_count(left, right)


def phrase_count(pos_lists: list[list[int]], slop: int = 0,
                 offsets: list[int] | None = None) -> int:
    """Convenience: shift then count."""
    return sloppy_phrase_count(shifted_positions(pos_lists, offsets), slop)


# ---------------------------------------------------------------------------
# doc-parallel numpy variant of the TWO-TERM slop kernel
# ---------------------------------------------------------------------------

def sloppy_count_two_batch(left_lists, right_lists, slop: int):
    """Batched ``intersection_count_with_slop(update_left=False)``
    (phrase_scorer.rs:145-190) over MANY documents at once: instead of
    running the two-pointer loop per doc in Python, every active doc's
    (li, ri) state advances by ONE vectorized numpy step per iteration
    — a SIMD interpreter of the reference's automaton.  A step costs
    O(active docs) in C; total python-level iterations = the longest
    single doc's pointer walk, not the sum over docs, so a hot-term
    slop query over thousands of candidate docs stops paying
    per-(doc, position) interpreter overhead.

    The advance sub-loop ("there could be a better left <= rv",
    phrase_scorer.rs:160-168) is folded into the main automaton as
    extra li-advance steps: advancing toward rv only DECREASES the
    distance when left <= rv, so deferring the match until the best
    left is reached counts exactly the same matches (equivalence with
    the per-doc kernel is property-tested in test_sloppy_vectors.py).

    ``left_lists`` / ``right_lists``: iterables (one entry per doc) of
    sorted shifted position arrays.  Returns int64 counts per doc.
    """
    import numpy as np

    def flatten(lists):
        arrs = [np.asarray(x, dtype=np.int64) for x in lists]
        lens = np.fromiter((len(a) for a in arrs), dtype=np.int64,
                           count=len(arrs))
        vals = (np.concatenate(arrs) if len(arrs) and lens.sum()
                else np.zeros(0, np.int64))
        offs = np.concatenate(([0], np.cumsum(lens)[:-1])) \
            if len(arrs) else np.zeros(0, np.int64)
        return vals, offs, lens

    lvals, loff, llen = flatten(left_lists)
    rvals, roff, rlen = flatten(right_lists)
    n = len(llen)
    li = np.zeros(n, np.int64)
    ri = np.zeros(n, np.int64)
    cnt = np.zeros(n, np.int64)
    act = np.flatnonzero((llen > 0) & (rlen > 0))
    big = np.int64(2) ** 62
    lim = max(len(lvals) - 1, 0)
    while len(act):
        lptr = loff[act] + li[act]
        rptr = roff[act] + ri[act]
        lv = lvals[lptr]
        rv = rvals[rptr]
        within = np.abs(lv - rv) <= slop
        has_next = li[act] + 1 < llen[act]
        nxt = np.where(has_next, lvals[np.minimum(lptr + 1, lim)], big)
        adv = within & (nxt <= rv)          # folded best-left advance
        match = within & ~adv
        lt = ~within & (lv < rv)
        cnt[act[match]] += 1
        li[act] += (adv | match | lt)
        ri[act] += (match | (~within & ~lt))
        act = act[(li[act] < llen[act]) & (ri[act] < rlen[act])]
    return cnt
