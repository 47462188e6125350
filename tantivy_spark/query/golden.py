"""Pure-numpy single-process reference engine (test oracle only).

Implements the scoring spec end-to-end — analyzer, quantized fieldnorms,
f32 BM25, tie-break (score desc, segment_ord asc, doc_id asc) — with no
Spark, so Spark results can be asserted against an independent
implementation.  Mirrors how the reference's unit tests pin exact scores
(e.g. /root/reference/src/query/bm25.rs:229-240).
"""

from __future__ import annotations

import numpy as np

from tantivy_spark import K1
from tantivy_spark.analyzer import tokenize_with_positions_series
from tantivy_spark.bm25 import Bm25Params, idf_f32
from tantivy_spark.fieldnorm import fieldnorm_to_id
from tantivy_spark.query import ast


class GoldenIndex:
    """In-memory inverted index over (key, text) pairs."""

    def __init__(self, keys: list[str], texts: list[str], n_segments: int = 1,
                 segment_of=None):
        import pandas as pd

        segment_of = segment_of or (lambda i, key: 0)
        rows = sorted(
            ((segment_of(i, k), k, t) for i, (k, t) in enumerate(zip(keys, texts))),
            key=lambda r: (r[0], r[1]),
        )
        self.doc_key: list[tuple[int, int, str]] = []
        self.postings: dict[str, list[tuple[int, int, int, list[int]]]] = {}
        self.fieldnorm_id: dict[tuple[int, int], int] = {}
        self._num_tokens: dict[tuple[int, int], int] = {}
        self.num_docs = 0
        self.total_tokens = 0
        seg_counter: dict[int, int] = {}
        tok_lists = tokenize_with_positions_series(pd.Series([t for _, _, t in rows]))
        for (seg, key, _), toks in zip(rows, tok_lists):
            doc = seg_counter.get(seg, 0)
            seg_counter[seg] = doc + 1
            self.doc_key.append((seg, doc, key))
            self.num_docs += 1
            self.total_tokens += len(toks)
            self.fieldnorm_id[(seg, doc)] = int(fieldnorm_to_id(np.array([len(toks)]))[0])
            self._num_tokens[(seg, doc)] = len(toks)
            per_term: dict[str, list[int]] = {}
            for tok, pos in toks:
                per_term.setdefault(tok, []).append(pos)
            for tok, positions in per_term.items():
                self.postings.setdefault(tok, []).append((seg, doc, len(positions), positions))
        for plist in self.postings.values():
            plist.sort(key=lambda p: (p[0], p[1]))
        self.avg_fieldnorm = self.total_tokens / self.num_docs if self.num_docs else 1.0

    def doc_freq(self, term: str) -> int:
        return len(self.postings.get(term, []))

    # -------------------------------------------------------------- scoring
    def scores(self, q: ast.Query, boost: float = 1.0) -> dict[tuple[int, int], np.float32]:
        """(segment_ord, doc_id) -> f32 score for all matching docs."""
        if isinstance(q, ast.TermQuery):
            params = Bm25Params.for_one_term(self.doc_freq(q.term), self.num_docs,
                                             self.avg_fieldnorm, boost)
            out = {}
            for seg, doc, tf, _pos in self.postings.get(q.term, []):
                fn = self.fieldnorm_id[(seg, doc)]
                out[(seg, doc)] = params.score(np.array([fn]), np.array([tf]))[0]
            return out
        if isinstance(q, ast.BoostQuery):
            return self.scores(q.child, boost * q.boost)
        if isinstance(q, ast.ConstScoreQuery):
            return {k: np.float32(q.score * boost) for k in self.scores(q.child, 1.0)}
        if isinstance(q, ast.AllQuery):
            return {(s, d): np.float32(boost) for s, d, _ in self.doc_key}
        if isinstance(q, ast.EmptyQuery):
            return {}
        if isinstance(q, ast.TermSetQuery):
            out = {}
            for t in q.set_terms:
                for seg, doc, _tf, _pos in self.postings.get(t, []):
                    out[(seg, doc)] = np.float32(boost)
            return out
        if isinstance(q, ast.PhraseQuery):
            return self._phrase_scores(q, boost)
        if isinstance(q, ast.TermRangeQuery):
            out = {}
            for t, plist in self.postings.items():
                if q.lower is not None and (t < q.lower or (t == q.lower and not q.lower_inclusive)):
                    continue
                if q.upper is not None and (t > q.upper or (t == q.upper and not q.upper_inclusive)):
                    continue
                for seg, doc, _tf, _pos in plist:
                    out[(seg, doc)] = np.float32(boost)
            return out
        if isinstance(q, ast.ExistsQuery):
            return {(s, d): np.float32(boost) for s, d, _ in self.doc_key
                    if self._num_tokens.get((s, d), 0) > 0}
        if isinstance(q, ast.DisjunctionMaxQuery):
            subs = [self.scores(c, 1.0) for c in q.disjuncts]
            keys = set().union(*[set(s) for s in subs]) if subs else set()
            out = {}
            for k in keys:
                vals = [s[k] for s in subs if k in s]
                mx = max(vals)
                out[k] = np.float32((mx + np.float32(q.tie_breaker)
                                     * (np.float32(sum(vals, np.float32(0.0))) - mx))
                                    * np.float32(boost))
            return out
        if isinstance(q, ast.BooleanQuery):
            musts = [self.scores(c, 1.0) for occ, c in q.clauses if occ == ast.Occur.MUST]
            shoulds = [self.scores(c, 1.0) for occ, c in q.clauses if occ == ast.Occur.SHOULD]
            nots = [self.scores(c, 1.0) for occ, c in q.clauses if occ == ast.Occur.MUST_NOT]
            if musts:
                keys = set(musts[0])
                for m in musts[1:]:
                    keys &= set(m)
            else:
                from collections import Counter
                cnt = Counter(k for s in shoulds for k in s)
                keys = {k for k, c in cnt.items() if c >= q.minimum_should_match}
            for n in nots:
                keys -= set(n)
            out = {}
            for k in keys:
                acc = np.float32(0.0)
                for s in musts + shoulds:
                    if k in s:
                        acc = np.float32(acc + s[k])
                out[k] = np.float32(acc * np.float32(boost))
            return out
        raise NotImplementedError(type(q).__name__)

    def _phrase_scores(self, q: ast.PhraseQuery, boost: float):
        from tantivy_spark.query.sloppy import sloppy_phrase_count

        terms = q.phrase_terms
        offsets = list(q.offsets) if q.offsets is not None else list(range(len(terms)))
        max_off = max(offsets)
        doc_pos: dict[tuple[int, int], list[list[int]]] = {}
        for i, (t, off) in enumerate(zip(terms, offsets)):
            for seg, doc, _tf, positions in self.postings.get(t, []):
                slot = doc_pos.setdefault((seg, doc), [[] for _ in terms])
                slot[i] = sorted(p + (max_off - off) for p in positions)
        params = Bm25Params.for_terms([self.doc_freq(t) for t in terms],
                                      self.num_docs, self.avg_fieldnorm, boost)
        out = {}
        for key, lists in doc_pos.items():
            tf = sloppy_phrase_count(lists, q.slop) if all(lists) else 0
            if tf:
                fn = self.fieldnorm_id[key]
                out[key] = params.score(np.array([fn]), np.array([tf]))[0]
        return out

    def top_k(self, q: ast.Query, k: int = 10, offset: int = 0):
        """[(rank, segment_ord, doc_id, score_f32)] with the reference
        tie-break (score desc, DocAddress asc)."""
        scored = self.scores(q)
        items = sorted(scored.items(), key=lambda kv: (-float(kv[1]), kv[0][0], kv[0][1]))
        return [
            (r + 1, seg, doc, float(s))
            for r, ((seg, doc), s) in enumerate(items)
        ][offset: offset + k]

    def count(self, q: ast.Query) -> int:
        return len(self.scores(q))
