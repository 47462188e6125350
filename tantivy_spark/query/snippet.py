"""Snippet generation: best highlighted fragment per document.

Reference semantics (/root/reference/src/snippet/mod.rs): given the
query's terms, score candidate fragments of at most ``max_num_chars`` by
the sum of scores of the UNIQUE terms they contain (so a fragment
mentioning two distinct query terms beats one repeating a single term),
pick the best, and emit the fragment with ``<b>..</b>`` around matches.
Term score defaults to 1.0 per unique term (the reference uses the
term's idf when built from a searcher; pass ``term_scores`` for that).

Spark shape: one Arrow-batched kernel over (id, text); token spans come
from the same alphanumeric-run regex as the analyzer, so highlight
boundaries agree with what was indexed.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tantivy_spark.analyzer import PY_TOKEN_RE


def _best_fragment(text: str, terms: set[str],
                   term_scores: dict[str, float],
                   max_num_chars: int) -> tuple[str, int]:
    """(highlighted fragment, n_highlights) for one document."""
    matches = [(m.start(), m.end(), m.group(0).lower())
               for m in PY_TOKEN_RE.finditer(text)
               if m.group(0).lower() in terms]
    if not matches:
        return "", 0
    # two-pointer window over match ordinals: fragment = [start of match i,
    # bounded end]; score = sum over unique terms present (ref: fragment
    # scoring in snippet/mod.rs)
    best = (-1.0, 0, 0)  # (score, i, j_exclusive)
    j = 0
    for i in range(len(matches)):
        if j < i:
            j = i
        while j < len(matches) and \
                matches[j][1] - matches[i][0] <= max_num_chars:
            j += 1
        uniq = {t for _s, _e, t in matches[i:j]}
        score = sum(term_scores.get(t, 1.0) for t in uniq)
        # tie-break: more matches, then earliest fragment
        key = (score + 1e-6 * (j - i), i, j)
        if key[0] > best[0]:
            best = (key[0], i, j)
    _score, i, j = best
    frag_start = matches[i][0]
    frag_end = min(len(text), frag_start + max_num_chars)
    spans = [(s, e) for s, e, _t in matches[i:j] if e <= frag_end]
    out = []
    cur = frag_start
    for s, e in spans:
        out.append(text[cur:s])
        out.append("<b>")
        out.append(text[s:e])
        out.append("</b>")
        cur = e
    out.append(text[cur:frag_end])
    return "".join(out), len(spans)


def snippet_col(text_col, terms: list[str],
                term_scores: dict[str, float] | None = None,
                max_num_chars: int = 150):
    """Column expression: best highlighted fragment of ``text_col`` for
    the given (analyzed) query terms."""
    from pyspark.sql.functions import pandas_udf

    term_set = {t.lower() for t in terms}
    scores = dict(term_scores or {})
    mc = int(max_num_chars)

    @pandas_udf("string")
    def _snip(texts: pd.Series) -> pd.Series:
        from tantivy_spark.query.snippet import _best_fragment
        return texts.map(
            lambda t: _best_fragment(t or "", term_set, scores, mc)[0])

    return _snip(text_col)


def snippets_for_topk(topk: DataFrame, source: DataFrame, terms: list[str],
                      key_col: str = "url", text_col: str = "text",
                      term_scores: dict[str, float] | None = None,
                      max_num_chars: int = 150) -> DataFrame:
    """Attach a ``snippet`` column to a top-k result frame: broadcast the
    tiny top-k into the docstore (source) join, then run the fragment
    kernel on just those k documents — never on the corpus."""
    docs = (F.broadcast(topk)
            .join(source, topk["key"] == source[key_col], "inner"))
    return docs.select(
        "rank", "key", "score",
        snippet_col(F.col(text_col), terms, term_scores,
                    max_num_chars).alias("snippet"),
    ).orderBy("rank")
