"""Query-string parser for the tantivy QueryParser syntax subset.

Grammar (ref: /root/reference/src/query/query_parser/query_parser.rs:131-212
and query-grammar/):

  query    := or_expr
  or_expr  := and_expr ("OR" and_expr)*
  and_expr := clause ("AND" clause)*
  clause   := ("+" | "-")? atom ("^" number)?
  atom     := "(" query ")" | quoted ("~" int)? | "*" | "IN" "[" terms "]"
            | "[" t "TO" t "]" | "{" t "TO" t "}" | (field ":")? word

Like the reference, bare clauses combine as SHOULD, "+x" is MUST, "-x"
MUST_NOT; explicit AND/OR build boolean trees (AND binds tighter); term
literals are run through the field analyzer — multi-token literals become
phrases, like the reference's behaviour for text fields.  This engine has
a single text field, so `field:` prefixes are accepted and ignored.
"""

from __future__ import annotations

import re

import pandas as pd

from tantivy_spark.analyzer import tokenize_series
from tantivy_spark.query import ast

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<lparen>\()
      | (?P<rparen>\))
      | (?P<lbrack>\[)
      | (?P<rbrack>\])
      | (?P<lbrace>\{)
      | (?P<rbrace>\})
      | (?P<quoted>"(?P<qbody>[^"]*)"(?:~(?P<slop>\d+))?)
      | (?P<plus>\+)
      | (?P<minus>-)
      | (?P<boost>\^(?P<bval>\d+(?:\.\d+)?))
      | (?P<star>\*)
      | (?P<word>[^\s()\[\]{}^"]+)
    )""",
    re.VERBOSE,
)


class QueryParserError(ValueError):
    pass


def _lex(q: str) -> list[tuple[str, str]]:
    out = []
    pos = 0
    while pos < len(q):
        m = _TOKEN_RE.match(q, pos)
        if not m or m.end() == pos:
            rest = q[pos:].strip()
            if not rest:
                break
            raise QueryParserError(f"cannot lex at: {rest[:20]!r}")
        pos = m.end()
        kind = m.lastgroup if m.lastgroup not in (
            "qbody", "slop", "bval") else None
        for k in ("lparen", "rparen", "lbrack", "rbrack", "lbrace", "rbrace",
                  "plus", "minus", "star"):
            if m.group(k):
                out.append((k, m.group(k)))
                break
        else:
            if m.group("quoted") is not None:
                out.append(("quoted", m.group("qbody")))
                if m.group("slop"):
                    out.append(("slop", m.group("slop")))
            elif m.group("boost"):
                out.append(("boost", m.group("bval")))
            elif m.group("word"):
                out.append(("word", m.group("word")))
    return out


def analyze_literal(text: str) -> list[str]:
    """Run the default analyzer on a query literal."""
    return list(tokenize_series(pd.Series([text]))[0])


class QueryParser:
    def __init__(self, default_occur: ast.Occur = ast.Occur.SHOULD):
        self.default_occur = default_occur

    def parse(self, q: str) -> ast.Query:
        toks = _lex(q)
        if not toks:
            return ast.EmptyQuery()
        self._toks = toks
        self._i = 0
        node = self._or_expr()
        if self._i != len(self._toks):
            raise QueryParserError(f"trailing tokens: {self._toks[self._i:]}")
        return node

    # --------------------------------------------------------------- lexer
    def _peek(self):
        return self._toks[self._i] if self._i < len(self._toks) else (None, None)

    def _next(self):
        t = self._peek()
        self._i += 1
        return t

    # ------------------------------------------------------------- grammar
    def _or_expr(self) -> ast.Query:
        parts = [self._and_expr()]
        while self._peek() == ("word", "OR"):
            self._next()
            parts.append(self._and_expr())
        if len(parts) == 1:
            return parts[0]
        return ast.BooleanQuery([(ast.Occur.SHOULD, p) for p in parts])

    def _and_expr(self) -> ast.Query:
        parts = [self._clause_group()]
        while self._peek() == ("word", "AND"):
            self._next()
            parts.append(self._clause_group())
        if len(parts) == 1:
            return parts[0]
        return ast.BooleanQuery([(ast.Occur.MUST, p) for p in parts])

    def _clause_group(self) -> ast.Query:
        """A run of +/-/bare clauses combined with default occurs."""
        clauses: list[tuple[ast.Occur, ast.Query]] = []
        while True:
            kind, _val = self._peek()
            if kind in (None, "rparen") or self._peek() in (
                    ("word", "AND"), ("word", "OR")):
                break
            occur = self.default_occur
            if kind == "plus":
                self._next()
                occur = ast.Occur.MUST
            elif kind == "minus":
                self._next()
                occur = ast.Occur.MUST_NOT
            node = self._atom()
            bk, bv = self._peek()
            if bk == "boost":
                self._next()
                node = ast.BoostQuery(node, float(bv))
            if node is not None:
                clauses.append((occur, node))
        if not clauses:
            return ast.EmptyQuery()
        if len(clauses) == 1 and clauses[0][0] == self.default_occur:
            return clauses[0][1]
        # all-bare or mixed run -> boolean; if any MUST present, bare
        # clauses stay SHOULD (reference semantics)
        return ast.BooleanQuery(clauses)

    def _atom(self) -> ast.Query | None:
        kind, val = self._next()
        if kind == "lparen":
            node = self._or_expr()
            k2, _ = self._next()
            if k2 != "rparen":
                raise QueryParserError("expected )")
            return node
        if kind == "star":
            return ast.AllQuery()
        if kind == "quoted":
            slop = 0
            if self._peek()[0] == "slop":
                slop = int(self._next()[1])
            terms = analyze_literal(val)
            if not terms:
                return None
            if len(terms) == 1:
                return ast.TermQuery(terms[0])
            return ast.PhraseQuery(terms, slop=slop)
        if kind in ("lbrack", "lbrace"):
            lo_incl = kind == "lbrack"
            lo_k, lo_v = self._next()
            _to_k, to_v = self._next()
            hi_k, hi_v = self._next()
            close_k, _ = self._next()
            if to_v != "TO" or lo_k not in ("word", "star") \
                    or hi_k not in ("word", "star") \
                    or close_k not in ("rbrack", "rbrace"):
                raise QueryParserError("malformed range")
            hi_incl = close_k == "rbrack"
            return ast.TermRangeQuery(
                lower=None if lo_k == "star" else lo_v.lower(),
                upper=None if hi_k == "star" else hi_v.lower(),
                lower_inclusive=lo_incl, upper_inclusive=hi_incl)
        if kind == "word":
            if val == "IN" and self._peek()[0] == "lbrack":
                self._next()
                terms = []
                while self._peek()[0] == "word":
                    terms.extend(analyze_literal(self._next()[1]))
                if self._next()[0] != "rbrack":
                    raise QueryParserError("expected ] after IN set")
                return ast.TermSetQuery(terms)
            # field prefix: single-text-field engine, accept and strip
            if ":" in val and not val.startswith(":"):
                _field, rest = val.split(":", 1)
                if rest == "*":
                    return ast.ExistsQuery()
                val = rest
            terms = analyze_literal(val)
            if not terms:
                return None
            if len(terms) == 1:
                return ast.TermQuery(terms[0])
            return ast.PhraseQuery(terms, slop=0)
        raise QueryParserError(f"unexpected token {kind} {val!r}")
