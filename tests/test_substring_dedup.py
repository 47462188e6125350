"""Exact duplicated-substring removal (pipeline/dedup.dedup_substrings)
— the Lee et al. 2022 suffix-array dedup re-expressed as token-window
fingerprinting.  Verified against an independent brute-force Python
reference on hand-built and randomized corpora."""

import numpy as np
import pytest

from tantivy_spark.pipeline.dedup import dedup_substrings


def brute_substring_dedup(texts: dict[int, str], min_len: int):
    """Independent O(n^2) reference: enumerate every token window as a
    tuple, group occurrences, drop all but the (id, pos)-min occurrence,
    mask covered tokens, rebuild."""
    toks = {i: t.split() for i, t in texts.items()}
    occ: dict[tuple, list] = {}
    for i in sorted(toks):
        tk = toks[i]
        for p in range(len(tk) - min_len + 1):
            occ.setdefault(tuple(tk[p:p + min_len]), []).append((i, p))
    removed = {i: set() for i in toks}
    for w, lst in occ.items():
        if len(lst) < 2:
            continue
        for (i, p) in sorted(lst)[1:]:
            removed[i].update(range(p, p + min_len))
    out = {}
    for i, tk in toks.items():
        kept = [t for j, t in enumerate(tk) if j not in removed[i]]
        out[i] = (" ".join(kept), len(tk), len(removed[i]))
    return out


def run(spark, texts: dict[int, str], min_len: int):
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string")
    rows = dedup_substrings(df, min_len=min_len).collect()
    return {r["doc_id"]: (r["text"], r["n_tokens"], r["n_tokens_removed"])
            for r in rows}


def test_cross_doc_span_removed(spark):
    texts = {
        0: "a b c d e f x0 x1",
        1: "q r a b c d e f y",
        2: "z z z",
    }
    got = run(spark, texts, min_len=4)
    assert got == brute_substring_dedup(texts, 4)
    # the shared 6-token span survives only in doc 0 (globally first)
    assert got[0][0] == "a b c d e f x0 x1"
    assert got[1][0] == "q r y"
    assert got[1][2] == 6
    # shorter than min_len: untouched
    assert got[2] == ("z z z", 3, 0)


def test_within_doc_repeat(spark):
    texts = {7: "m n o p m n o p"}
    got = run(spark, texts, min_len=4)
    assert got == brute_substring_dedup(texts, 4)
    assert got[7][0] == "m n o p"
    assert got[7][2] == 4


def test_whitespace_normalized(spark):
    texts = {1: "  a   b\tc  ", 2: "a b c"}
    got = run(spark, texts, min_len=3)
    # both docs ARE the same 3-token window; doc 1 (min id) keeps it
    assert got[1] == ("a b c", 3, 0)
    assert got[2] == ("", 3, 3)
    assert got == brute_substring_dedup({1: "a b c", 2: "a b c"}, 3)


def test_min_len_validation(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        dedup_substrings(df, min_len=1)


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_randomized_vs_brute(spark, seed):
    rng = np.random.default_rng(seed)
    vocab = [f"t{j}" for j in range(6)]
    texts = {}
    for i in range(24):
        n = int(rng.integers(2, 28))
        texts[i] = " ".join(rng.choice(vocab, size=n))
    min_len = int(rng.integers(3, 6))
    assert run(spark, texts, min_len) == brute_substring_dedup(texts, min_len)
