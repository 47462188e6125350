"""Query tree dataclasses.

The analogue of the reference's `Query` trait object tree
(/root/reference/src/query/): each node declares *what* matches and how
scores combine; the planners in ``exact.py`` / ``wand.py`` lower a tree to
a DataFrame program.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum


class Occur(str, Enum):
    MUST = "must"
    SHOULD = "should"
    MUST_NOT = "must_not"


class Query:
    """Base class.  ``terms()`` returns every positive text term used,
    for statistics lookup and posting-scan planning."""

    def terms(self) -> list[str]:
        return []


@dataclass
class TermQuery(Query):
    """All docs containing `term`, BM25-scored
    (ref: src/query/term_query/).  ``field`` targets a specific field of
    a multi-field index (None = the index's default field)."""
    term: str
    field: str | None = None

    def terms(self) -> list[str]:
        return [self.term]


@dataclass
class BooleanQuery(Query):
    """MUST / SHOULD / MUST_NOT with tantivy scoring: score = sum of
    matching positive subclause scores (ref: src/query/boolean_query/).
    ``minimum_should_match`` applies when there is at least one SHOULD."""
    clauses: list[tuple[Occur, Query]]
    minimum_should_match: int = 1

    def terms(self) -> list[str]:
        out: list[str] = []
        for occur, q in self.clauses:
            if occur != Occur.MUST_NOT:
                out.extend(q.terms())
        return out

    def negative_terms(self) -> list[str]:
        out: list[str] = []
        for occur, q in self.clauses:
            if occur == Occur.MUST_NOT:
                out.extend(q.terms())
        return out


@dataclass
class PhraseQuery(Query):
    """Adjacent terms (slop=0) or within-slop match with the reference's
    abs-diff budget semantics — transpositions cost 2, slop carries
    across terms (ref: src/query/phrase_query/phrase_scorer.rs:141-345).
    Scored with the summed-idf multi-term BM25 weight and phrase
    frequency as tf.

    ``offsets`` are the reference's ``PhraseQuery::new_with_offset``
    per-term phrase positions (phrase_query.rs:42-58) — e.g.
    ``[(0,"a"),(2,"c")]`` matches "a ? c".  None means 0..len-1.
    """
    phrase_terms: list[str]
    slop: int = 0
    field: str | None = None
    offsets: list[int] | None = None

    def terms(self) -> list[str]:
        return list(self.phrase_terms)


@dataclass
class PhrasePrefixQuery(Query):
    """Phrase whose last term is a prefix, expanded against the term
    dictionary (ref: src/query/phrase_prefix_query/)."""
    phrase_terms: list[str]   # all but the prefix
    prefix: str
    max_expansions: int = 50
    field: str | None = None

    def terms(self) -> list[str]:
        return list(self.phrase_terms)


@dataclass
class RegexPhraseQuery(Query):
    """Phrase where each slot is a regex over the term dictionary
    (ref: src/query/phrase_query/regex_phrase_query.rs).  A doc matches at
    position p if for every slot i some term matching regex_i occurs at
    p + i; scored like a phrase with per-slot doc freqs."""
    patterns: list[str]
    max_expansions: int = 128

    def terms(self) -> list[str]:  # resolved at plan time
        return []


@dataclass
class MoreLikeThisQuery(Query):
    """OR-query over the top tf-idf terms of a reference document's text
    (ref: src/query/more_like_this/more_like_this.rs:50-77 — same option
    set; our defaults keep terms unless told otherwise)."""
    doc_text: str
    max_query_terms: int = 10
    min_term_freq: int = 1
    min_doc_freq: int = 1
    max_doc_freq: int | None = None
    min_word_length: int = 0
    max_word_length: int | None = None
    stop_words: list[str] = field(default_factory=list)
    boost_factor: float = 1.0

    def terms(self) -> list[str]:  # resolved at plan time
        return []


@dataclass
class TermSetQuery(Query):
    """Docs containing any term of the set, constant score 1.0
    (ref: src/query/set_query.rs — scoring disabled there too)."""
    set_terms: list[str]
    field: str | None = None

    def terms(self) -> list[str]:
        return list(self.set_terms)


@dataclass
class AllQuery(Query):
    """Every doc, score 1.0 (ref: src/query/all_query.rs)."""


@dataclass
class EmptyQuery(Query):
    """Matches nothing (ref: src/query/empty_query.rs)."""


@dataclass
class BoostQuery(Query):
    """Child scores multiplied by a constant (ref: src/query/boost_query.rs)."""
    child: Query
    boost: float

    def terms(self) -> list[str]:
        return self.child.terms()


@dataclass
class ConstScoreQuery(Query):
    """Child matches, constant score (ref: src/query/const_score_query.rs)."""
    child: Query
    score: float = 1.0

    def terms(self) -> list[str]:
        return self.child.terms()


@dataclass
class DisjunctionMaxQuery(Query):
    """score = max(children) + tie_breaker * (sum(children) - max)
    (ref: src/query/disjunction_max_query.rs:63-82)."""
    disjuncts: list[Query]
    tie_breaker: float = 0.0

    def terms(self) -> list[str]:
        out: list[str] = []
        for q in self.disjuncts:
            out.extend(q.terms())
        return out


@dataclass
class FuzzyTermQuery(Query):
    """Terms within Levenshtein distance <= d of `term`
    (ref: src/query/fuzzy_query.rs).  Expanded against the term
    dictionary at plan time; CONSTANT score — the reference lowers fuzzy
    to an AutomatonWeight whose scorer is ConstScorer(boost)
    (automaton_weight.rs:109-110, pinned at 1.0 by fuzzy_query.rs's own
    tests), same as RegexQuery."""
    term: str
    distance: int = 1
    prefix: bool = False
    #: adjacent transposition costs 1 (Damerau) instead of 2
    #: (ref: fuzzy_query.rs:85-93 ``transposition_cost_one``)
    transposition_cost_one: bool = False
    field: str | None = None

    def terms(self) -> list[str]:  # expansion happens at plan time
        return []


@dataclass
class TermRangeQuery(Query):
    """Docs containing any term within [lower, upper] bounds over the
    term dictionary, constant score 1.0 (ref: src/query/range_query/
    range_query.rs — term-range variant collects docs into a bitset)."""
    lower: str | None = None
    upper: str | None = None
    lower_inclusive: bool = True
    upper_inclusive: bool = True
    field: str | None = None


@dataclass
class FastFieldRangeQuery(Query):
    """Docs whose FAST-FIELD (columnar) value lies in [lower, upper] —
    the reference's lazy fast-field range variant
    (src/query/range_query/range_query_fastfield.rs), as opposed to
    TermRangeQuery's dictionary walk.  Constant score 1.0.  The searcher
    must have fast fields attached (`ExactSearcher.set_fast_fields`)."""
    field: str
    lower: object = None
    upper: object = None
    lower_inclusive: bool = True
    upper_inclusive: bool = True


@dataclass
class ExistsQuery(Query):
    """Docs where the field has at least one indexed value
    (ref: src/query/exist_query.rs — field-has-value semantics).

    ``json_path`` addresses a path INSIDE a json field, mirroring the
    reference's ``ExistsQuery::new("json.path", json_subpaths)``
    (exist_query.rs:19-27): with ``json_subpaths=False`` only a leaf
    value exactly at the path matches; with ``True`` any value at or
    below the path does.  ``json_path=""`` is the field root — matches
    nothing without subpaths (an object root holds no direct leaf) and
    every doc carrying any value under the field with them."""
    field: str | None = None
    json_path: str | None = None
    json_subpaths: bool = False


@dataclass
class RegexQuery(Query):
    """Terms matching a regex (ref: src/query/regex_query.rs), expanded
    against the term dictionary at plan time; constant score 1.0."""
    pattern: str
    field: str | None = None

    def terms(self) -> list[str]:
        return []


@dataclass
class CustomQuery(Query):
    """User-defined query — the analogue of implementing the reference's
    Query/Weight/Scorer traits (ARCHITECTURE.md:283-291 lists custom
    queries as the extension surface).  ``lower_fn(searcher, boost)``
    must return a DataFrame of (segment_ord, doc_id, score) for matching
    docs; it may use the searcher's reader tables and helpers.  Deletes
    are applied by the caller like any other node."""
    lower_fn: object
    name: str = "custom"

    def terms(self) -> list[str]:
        return []


#: node kinds whose terms live in the dictionary (field-qualifiable)
_TERM_NODES = None  # populated below, after all classes exist


def _is_qualified(q: Query, sep: str) -> bool:
    if isinstance(q, (TermQuery, FuzzyTermQuery)):
        return sep in q.term
    if isinstance(q, PhraseQuery):
        return any(sep in t for t in q.phrase_terms)
    if isinstance(q, PhrasePrefixQuery):
        return sep in q.prefix or any(sep in t for t in q.phrase_terms)
    if isinstance(q, TermSetQuery):
        return any(sep in t for t in q.set_terms)
    if isinstance(q, RegexQuery):
        return sep in q.pattern
    if isinstance(q, TermRangeQuery):
        return any(b is not None and sep in b for b in (q.lower, q.upper))
    return False


def qualify(q: Query, default_field, sep: str = "\x1f",
            field_boosts: dict[str, float] | None = None) -> Query:
    """Rewrite a query tree for a MULTI-FIELD index: every term-bearing
    node's terms become field-qualified dictionary keys
    (``{field}{sep}{term}``), using each node's ``field`` or the index's
    default(s).  The lowered plan then runs unchanged — qualified terms
    are just strings — while per-field statistics are resolved by prefix.
    Mirrors the reference's QueryParser field resolution
    (query_parser.rs:336-412) over field-qualified Terms (term.rs:22-58).

    ``default_field`` may be a LIST: an unqualified term then expands to
    a SHOULD-disjunction over every default field, like the reference's
    multi-default-field resolution (query_parser.rs:253-262).
    ``field_boosts`` multiplies a resolved field's nodes by its boost
    (the reference's set_field_boost, query_parser.rs:299).

    Idempotent: already-qualified terms (containing the separator, which
    the analyzer can never emit) pass through unchanged, so facade and
    planner may both call it.
    """
    import re as _re
    from dataclasses import replace

    defaults = [default_field] if isinstance(default_field, str) \
        else list(default_field)
    boosts = field_boosts or {}

    def fq(f):
        return f if f is not None else defaults[0]

    def qt(t, f):
        return t if sep in t else f"{fq(f)}{sep}{t}"

    def wrap(node, f):
        b = float(boosts.get(f, 1.0)) if f is not None else 1.0
        return BoostQuery(node, b) if b != 1.0 else node

    # already-qualified nodes pass through UNCHANGED, as the idempotency
    # docstring promises — re-resolving them would misapply the first
    # default field's boost to terms a caller pre-qualified elsewhere
    if isinstance(q, _TERM_NODES) and _is_qualified(q, sep):
        return q

    # an UNQUALIFIED term-bearing node with several default fields:
    # one copy per default field, OR-combined
    if isinstance(q, _TERM_NODES) and getattr(q, "field", None) is None \
            and len(defaults) > 1 and not _is_qualified(q, sep):
        return BooleanQuery([
            (Occur.SHOULD, qualify(replace(q, field=f), defaults, sep,
                                   field_boosts))
            for f in defaults])

    if isinstance(q, TermQuery):
        return wrap(replace(q, term=qt(q.term, q.field), field=None),
                    fq(q.field))
    if isinstance(q, PhraseQuery):
        return wrap(replace(q, phrase_terms=[qt(t, q.field)
                                             for t in q.phrase_terms],
                            field=None), fq(q.field))
    if isinstance(q, PhrasePrefixQuery):
        return wrap(replace(q, phrase_terms=[qt(t, q.field)
                                             for t in q.phrase_terms],
                            prefix=qt(q.prefix, q.field), field=None),
                    fq(q.field))
    if isinstance(q, TermSetQuery):
        return replace(q, set_terms=[qt(t, q.field)
                                     for t in q.set_terms], field=None)
    if isinstance(q, FuzzyTermQuery):
        return wrap(replace(q, term=qt(q.term, q.field), field=None),
                    fq(q.field))
    if isinstance(q, RegexQuery):
        if sep in q.pattern:
            return q
        return replace(q, pattern=_re.escape(f"{fq(q.field)}{sep}")
                       + f"(?:{q.pattern})", field=None)
    if isinstance(q, TermRangeQuery):
        if _is_qualified(q, sep):
            return q
        f = fq(q.field)
        # unbounded sides pin to the field's key range: every term of the
        # field sorts inside (f+sep, f+"\x20") — sep is below any token
        # byte, "\x20" above sep but below all alnum
        lower = qt(q.lower, q.field) if q.lower is not None else f + sep
        if q.upper is not None:
            upper, upper_incl = qt(q.upper, q.field), q.upper_inclusive
        else:
            upper, upper_incl = f + "\x20", False
        return TermRangeQuery(lower, upper, q.lower_inclusive, upper_incl)
    if isinstance(q, BooleanQuery):
        return replace(q, clauses=[(o, qualify(c, defaults, sep,
                                               field_boosts))
                                   for o, c in q.clauses])
    if isinstance(q, (BoostQuery, ConstScoreQuery)):
        return replace(q, child=qualify(q.child, defaults, sep,
                                        field_boosts))
    if isinstance(q, DisjunctionMaxQuery):
        return replace(q, disjuncts=[qualify(c, defaults, sep, field_boosts)
                                     for c in q.disjuncts])
    if isinstance(q, RegexPhraseQuery):
        if any(sep in p for p in q.patterns):
            return q
        pfx = _re.escape(f"{defaults[0]}{sep}")
        return replace(q, patterns=[f"{pfx}(?:{p})" for p in q.patterns])
    # AllQuery / EmptyQuery / FastFieldRangeQuery / ExistsQuery /
    # MoreLikeThisQuery carry no dictionary terms to qualify (Exists and
    # MLT resolve their field at plan time)
    return q


_TERM_NODES = (TermQuery, PhraseQuery, PhrasePrefixQuery, TermSetQuery,
               FuzzyTermQuery, RegexQuery, TermRangeQuery)
