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


def search_fragments(text: str, term_scores: dict[str, float],
                     max_num_chars: int) -> list[tuple]:
    """Candidate fragments, built by streaming the token spans exactly
    like the reference (snippet/mod.rs search_fragments): a candidate
    starts at offset 0 (or at the token that overflowed the previous
    one); every token extends stop_offset; a token whose text is a query
    term adds its score and a highlight range; candidates with score 0
    are dropped.  Returns [(score, start, stop, [(hl_start, hl_end)...])].
    """
    frags: list[tuple] = []
    score, start, stop = 0.0, 0, 0
    hl: list[tuple[int, int]] = []
    for m in PY_TOKEN_RE.finditer(text):
        if m.end() - start > max_num_chars:
            if score > 0:
                frags.append((score, start, stop, hl))
            score, start, stop, hl = 0.0, m.start(), m.start(), []
        stop = m.end()
        t = m.group(0).lower()
        if t in term_scores:
            score += term_scores[t]
            hl.append((m.start(), m.end()))
    if score > 0:
        frags.append((score, start, stop, hl))
    return frags


def select_best_fragment(frags: list[tuple]) -> tuple | None:
    """Highest score; ties go to the EARLIEST fragment (the reference's
    select_best_fragment_combination ordering)."""
    best = None
    for f in frags:
        if best is None or f[0] > best[0] or \
                (f[0] == best[0] and (f[1], f[2]) < (best[1], best[2])):
            best = f
    return best


def _escape(s: str) -> str:
    """Minimal HTML escaping, like the reference's to_html."""
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;").replace('"', "&quot;")
            .replace("'", "&#x27;"))


def _best_fragment(text: str, term_scores: dict[str, float],
                   max_num_chars: int) -> tuple[str, int]:
    """(highlighted html fragment, n_highlights) for one document."""
    best = select_best_fragment(
        search_fragments(text, term_scores, max_num_chars))
    if best is None:
        return "", 0
    _score, start, stop, hl = best
    out = []
    cur = start
    for s, e in hl:
        out.append(_escape(text[cur:s]))
        out.append("<b>")
        out.append(_escape(text[s:e]))
        out.append("</b>")
        cur = e
    out.append(_escape(text[cur:stop]))
    return "".join(out), len(hl)


def snippet_col(text_col, terms: list[str],
                term_scores: dict[str, float] | None = None,
                max_num_chars: int = 150):
    """Column expression: best highlighted fragment of ``text_col`` for
    the given (analyzed) query terms."""
    from pyspark.sql.functions import pandas_udf

    scores = {t.lower(): float((term_scores or {}).get(t, 1.0))
              for t in terms}
    mc = int(max_num_chars)

    @pandas_udf("string")
    def _snip(texts: pd.Series) -> pd.Series:
        from tantivy_spark.query.snippet import _best_fragment
        return texts.map(
            lambda t: _best_fragment(t or "", scores, mc)[0])

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
