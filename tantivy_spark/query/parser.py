"""Query-string parser for the tantivy QueryParser syntax subset.

Grammar (ref: /root/reference/src/query/query_parser/query_parser.rs:131-212
and query-grammar/):

  query    := or_expr
  or_expr  := and_expr ("OR" and_expr)*
  and_expr := clause ("AND" clause)*
  clause   := ("+" | "-" | "NOT")? atom ("^" number)?
  atom     := "(" query ")" | quoted ("~" int | "*")? | "*"
            | "IN" "[" terms "]"
            | "[" t "TO" t "]" | "{" t "TO" t "}"
            | (field ":")? word ("~" int)?

Like the reference, bare clauses combine as SHOULD, "+x" is MUST, "-x"
and "NOT x" MUST_NOT (query_grammar.rs:790, :1838); explicit AND/OR build
boolean trees (AND binds tighter); a top-level all-negative query gets a
match-all SHOULD (make_non_negative, query_parser.rs:232-237); '"a b"~N'
is phrase slop, '"a b"*' a phrase prefix (:1808), 'term~N' a fuzzy term
(:1799).  Term literals are run through the field analyzer — multi-token
literals become phrases, like the reference's behaviour for text fields.
`field:` prefixes are validated against the field registry when one is
configured; this engine indexes a single text field, so every known field
resolves to the same postings.
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
      | (?P<quoted>"(?P<qbody>[^"]*)"(?:~(?P<slop>\d+)|(?P<pprefix>\*))?)
      | (?P<squoted>'(?P<sqbody>[^']*)'(?:~(?P<sslop>\d+)|(?P<spprefix>\*))?)
      | (?P<plus>\+)
      | (?P<minus>-)
      | (?P<boost>\^(?P<bval>\d+(?:\.\d+)?))
      | (?P<star>\*)
      | (?P<word>~*[^\s()\[\]{}^"~]+)(?:~(?P<fdist>\d+))?
    )""",
    re.VERBOSE,
)


class QueryParserError(ValueError):
    pass


def parse_rfc3339(s: str):
    """RFC3339 date-time (or bare date) -> naive-UTC datetime — the
    reference's date literal handling (query_parser.rs date branch routes
    date fields through DateTime parsing).  The lexer lowercases range
    bounds; 't'/'z' are restored before parsing."""
    from datetime import datetime, timezone

    try:
        dt = datetime.fromisoformat(s.upper().replace("Z", "+00:00"))
    except ValueError as e:
        raise QueryParserError(f"invalid RFC3339 date: {s!r}") from e
    if dt.tzinfo is not None:
        dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
    return dt


def _typed_value(v: str, ftype: str):
    if ftype == "date":
        return parse_rfc3339(v)
    if ftype in ("i64", "u64"):
        try:
            return int(v)
        except ValueError as e:
            raise QueryParserError(f"invalid integer literal: {v!r}") from e
    if ftype == "f64":
        try:
            return float(v)
        except ValueError as e:
            raise QueryParserError(f"invalid float literal: {v!r}") from e
    raise QueryParserError(f"unsupported field type {ftype!r}")


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
                elif m.group("pprefix"):
                    out.append(("pprefix", "*"))
            elif m.group("squoted") is not None:
                # single-quoted phrases parse like double-quoted ones
                # (query_grammar.rs vector 'www-form-encoded' :1276)
                out.append(("quoted", m.group("sqbody")))
                if m.group("sslop"):
                    out.append(("slop", m.group("sslop")))
                elif m.group("spprefix"):
                    out.append(("pprefix", "*"))
            elif m.group("boost"):
                out.append(("boost", m.group("bval")))
            elif m.group("word"):
                out.append(("word", m.group("word")))
                if m.group("fdist"):
                    out.append(("fuzzy", m.group("fdist")))
    return out


def analyze_literal(text: str) -> list[str]:
    """Run the default analyzer on a query literal."""
    return list(tokenize_series(pd.Series([text]))[0])


def _split_field(val: str) -> tuple[str | None, str]:
    """Split ``field:rest`` on the first UNESCAPED colon; ``(None, val)``
    when there is none.  A backslash escapes the next character — the
    reference grammar's field-name escaping (query-grammar
    field_name rules: ``a\\.b:t`` names the literal field ``a.b``)."""
    i, n = 0, len(val)
    while i < n:
        c = val[i]
        if c == "\\":
            i += 2
            continue
        if c == ":":
            return val[:i], val[i + 1:]
        i += 1
    return None, val


def _unescape(s: str) -> str:
    return re.sub(r"\\(.)", r"\1", s)


def _canon_json_path(tail_ph: str) -> str:
    """Canonical json-path form for a field tail whose ESCAPED dots were
    placeholdered as ``\\x00``: segment-separator dots stay bare, dots
    that belong INSIDE a key render as ``\\.`` and literal backslashes
    as ``\\\\`` — exactly the form the index side writes for dotted keys
    when expand_dots is disabled (analyzer.json_key_segment; ref
    fastfield/mod.rs:1088)."""
    chunks = []
    for chunk in tail_ph.split("\x00"):
        segs = [_unescape(p).replace("\\", "\\\\").replace(".", "\\.")
                for p in chunk.split(".")]
        chunks.append(".".join(segs))
    return "\\.".join(chunks)


def _all_negative(q: ast.Query) -> bool:
    """True when every path of the tree is under a MUST_NOT — the
    reference's all_negative check (query_parser.rs:221-229)."""
    if isinstance(q, ast.BoostQuery):
        return _all_negative(q.child)
    if isinstance(q, ast.BooleanQuery):
        return all(occ == ast.Occur.MUST_NOT or _all_negative(c)
                   for occ, c in q.clauses) and bool(q.clauses)
    return False


class QueryParser:
    def __init__(self, default_occur: ast.Occur = ast.Occur.SHOULD,
                 fields: list[str] | None = None,
                 default_field: str = "text",
                 field_types: dict[str, str] | None = None,
                 field_analyzers: dict[str, str] | None = None,
                 expand_dots_fields: list[str] | None = None):
        """``fields``: the known field names; ``field:term`` prefixes are
        validated against it (unknown field -> error, the reference's
        FieldDoesNotExist).

        ``field_types``: per-field value types ("date", "i64", "u64",
        "f64") for NON-TEXT fields (ref: query_parser.rs:131-212 routes
        typed fields through value parsing).  A range or literal on a
        typed field lowers to a FastFieldRangeQuery over the columnar
        (fast-field) store; date literals are RFC3339.

        ``field_analyzers``: per-field analyzer chain names (from
        analyzer.ANALYZERS) for fields indexed with a non-default chain —
        literals against such fields analyze with the SAME chain
        (query_parser.rs:336-412 resolves per-field analyzers).

        ``expand_dots_fields``: json fields indexed with
        JsonObjectOptions::set_expand_dots_enabled — an ESCAPED dot in
        a path under such a field unifies with real nesting (both
        ``json.attr.age`` and ``json.attr\\.age`` address the same
        terms, fastfield/mod.rs:1139); for every other json field the
        escape stays a literal-dot key marker (the reference default,
        fastfield/mod.rs:1088)."""
        from tantivy_spark.analyzer import py_analyze_fn

        self.default_occur = default_occur
        self.default_field = default_field
        self.field_types = dict(field_types or {})
        self._field_fns = {f: py_analyze_fn(n)
                           for f, n in (field_analyzers or {}).items()}
        self.fields = set(fields) if fields is not None else None
        if self.fields is not None:
            self.fields |= set(self.field_types) | set(self._field_fns)
        self.expand_dots_fields = set(expand_dots_fields or ())

    def parse(self, q: str) -> ast.Query:
        toks = _lex(q)
        if not toks:
            return ast.EmptyQuery()
        self._toks = toks
        self._i = 0
        node = self._or_expr()
        if self._i != len(self._toks):
            raise QueryParserError(f"trailing tokens: {self._toks[self._i:]}")
        if _all_negative(node):
            # the reference's make_non_negative (query_parser.rs:232-237,
            # 422-424): a top-level all-negative query gets a match-all
            # SHOULD so "NOT a" means "every doc without a"
            if isinstance(node, ast.BooleanQuery):
                node = ast.BooleanQuery(
                    node.clauses + [(ast.Occur.SHOULD, ast.AllQuery())])
        return node

    def parse_lenient(self, q: str) -> tuple[ast.Query, list[str]]:
        """Best-effort parse (ref: query-grammar/src/lib.rs
        ``parse_query_lenient`` — never fails, returns the query plus the
        errors encountered).  Strict parse first; on failure, apply
        textual repairs (close unbalanced quotes, balance parentheses,
        drop dangling operators) and retry, accumulating error messages;
        as a last resort the bare words parse as a clause sequence."""
        errors: list[str] = []
        attempt = q
        for _ in range(3):
            try:
                return self.parse(attempt), errors
            except QueryParserError as e:
                errors.append(str(e))
            attempt = self._repair(attempt)
        words = re.findall(r"[^\W_]+", attempt, re.UNICODE)
        try:
            return self.parse(" ".join(words)), errors
        except QueryParserError as e:
            errors.append(str(e))
            return ast.EmptyQuery(), errors

    @staticmethod
    def _repair(q: str) -> str:
        s = q
        if s.count('"') % 2 == 1:
            s += '"'
        if s.count("'") % 2 == 1:
            s += "'"
        depth = 0
        out = []
        for c in s:
            if c == "(":
                depth += 1
            elif c == ")":
                if depth == 0:
                    continue            # drop unmatched closer
                depth -= 1
            out.append(c)
        s = "".join(out) + ")" * depth
        # dangling operators at either end
        s = re.sub(r"^\s*(?:AND|OR)\b", "", s)
        s = re.sub(r"\b(?:AND|OR)\s*$", "", s)
        return s.strip()

    # --------------------------------------------------------------- lexer
    def _peek(self):
        return self._toks[self._i] if self._i < len(self._toks) else (None, None)

    def _next(self):
        t = self._peek()
        self._i += 1
        return t

    # ------------------------------------------------------------- grammar
    #
    # The reference's clause-sequence semantics (query_grammar.rs vectors
    # :1310-1348): a query is a SEQUENCE of occur-prefixed elements;
    # AND/OR bind only their ADJACENT elements into chains (AND tighter
    # than OR).  A bare element keeps its prefix (default SHOULD).  An
    # AND chain coexisting with other clauses nests as one SHOULD clause
    # ("a AND b aaa" -> (?(+a +b) *aaa)); an OR chain's operands flatten
    # into the surrounding list ("a OR b +aaa" -> (?a ?b +aaa)); a chain
    # that IS the whole query flattens either way ("a AND -b" -> (+a -b),
    # "+a OR +b" -> (+a +b)).

    def _or_expr(self) -> ast.Query:
        return self._sequence()

    def _element(self):
        """(occur_token, node) — one occur-prefixed atom (+ boost)."""
        kind, _val = self._peek()
        occ = None
        if kind == "plus":
            self._next()
            occ = "+"
        elif kind == "minus":
            self._next()
            occ = "-"
        elif self._peek() == ("word", "NOT"):
            # "NOT x" == "-x" in a clause run (query_grammar.rs:790,
            # test vector "tata NOT toto" == "tata -toto" :1838)
            self._next()
            if self._peek()[0] is None:
                raise QueryParserError("NOT must be followed by a clause")
            occ = "not"
        node = self._atom()
        bk, bv = self._peek()
        if bk == "boost":
            self._next()
            if node is not None:
                node = ast.BoostQuery(node, float(bv))
        return occ, node

    def _sequence(self) -> ast.Query:
        elements: list[tuple] = []
        connectors: list[str | None] = []
        while True:
            kind, _val = self._peek()
            if kind in (None, "rparen"):
                break
            if self._peek() in (("word", "AND"), ("word", "OR")):
                raise QueryParserError(
                    f"dangling {self._peek()[1]} operator")
            elements.append(self._element())
            if self._peek() == ("word", "AND"):
                self._next()
                connectors.append("AND")
            elif self._peek() == ("word", "OR"):
                self._next()
                connectors.append("OR")
            elif self._peek()[0] in (None, "rparen"):
                break
            else:
                connectors.append(None)
        # drop atoms that analyzed to nothing, keeping connector alignment:
        # the connector joining two SURVIVING neighbours is the last
        # explicit AND/OR in the span they bridge (so 'a LONGTOKEN OR b'
        # keeps b as an OR operand instead of silently tightening to the
        # default occur)
        keep = [i for i, (_o, n) in enumerate(elements) if n is not None]
        if len(keep) != len(elements):
            new_connectors = []
            for a, b in zip(keep, keep[1:]):
                span = [c for c in connectors[a:b] if c is not None]
                new_connectors.append(span[-1] if span else None)
            elements = [elements[i] for i in keep]
            connectors = new_connectors
        if not elements:
            return ast.EmptyQuery()
        return self._seq_to_query(elements, connectors)

    def _bare_clause(self, e):
        # a bare element takes the parser's default occur — tantivy's
        # set_conjunction_by_default makes it MUST
        occ, node = e
        occur = {None: self.default_occur, "+": ast.Occur.MUST,
                 "-": ast.Occur.MUST_NOT, "not": ast.Occur.MUST_NOT}[occ]
        return occur, node

    @staticmethod
    def _and_clause(e):
        # inside a conjunction, "-x"/"NOT x" flatten to MUST_NOT (the
        # reference prints (+a +(-b)) for NOT, query_grammar.rs:1329;
        # the flattened form is the equivalent executable query)
        occ, node = e
        occur = ast.Occur.MUST_NOT if occ in ("-", "not") else ast.Occur.MUST
        return occur, node

    @staticmethod
    def _or_operand(e):
        # "+a OR b" keeps the MUST ("+a OR +b" -> (+a +b), :1325);
        # a negative operand nests as a pure-negative group
        # ("a OR NOT b" -> (?a ?(-b)), :1337)
        occ, node = e
        if occ == "+":
            return ast.Occur.MUST, node
        if occ in ("-", "not"):
            return (ast.Occur.SHOULD,
                    ast.BooleanQuery([(ast.Occur.MUST_NOT, node)]))
        return ast.Occur.SHOULD, node

    def _seq_to_query(self, elements, connectors) -> ast.Query:
        clauses: list[tuple[ast.Occur, ast.Query]] = []
        n = len(elements)
        i = 0
        while i < n:
            j = i
            while j < n - 1 and connectors[j] is not None:
                j += 1
            if j == i:  # bare element
                clauses.append(self._bare_clause(elements[i]))
            else:       # chain elements[i..j]
                whole = (i == 0 and j == n - 1)
                # split by OR into AND-groups (AND binds tighter)
                groups: list[list] = [[elements[i]]]
                for k in range(i, j):
                    if connectors[k] == "OR":
                        groups.append([])
                    groups[-1].append(elements[k + 1])
                if len(groups) == 1:  # pure AND chain
                    and_clauses = [self._and_clause(e) for e in groups[0]]
                    if whole:
                        clauses.extend(and_clauses)
                    else:
                        clauses.append((ast.Occur.SHOULD,
                                        ast.BooleanQuery(and_clauses)))
                else:                 # OR chain: operands flatten
                    for g in groups:
                        if len(g) == 1:
                            clauses.append(self._or_operand(g[0]))
                        else:
                            clauses.append((ast.Occur.SHOULD,
                                            ast.BooleanQuery(
                                                [self._and_clause(e)
                                                 for e in g])))
            i = j + 1
        if not clauses:
            return ast.EmptyQuery()
        if len(clauses) == 1 and clauses[0][0] == self.default_occur:
            return clauses[0][1]
        return ast.BooleanQuery(clauses)

    def _resolve_field(self, raw: str) -> tuple[str, str | None]:
        """Resolve a (possibly escaped, possibly dotted) field prefix to
        ``(field, json_path | None)``.  Longest registered dotted prefix
        wins, the remainder addresses a path INSIDE that json field —
        the reference's json-path field addressing (query_parser.rs
        splits ``field.path`` on the first unescaped dot of a json
        field; escaped dots stay field-name characters)."""
        ph = raw.replace("\\.", "\x00")          # escaped dots are literal
        full = _unescape(ph.replace("\x00", "."))
        if self.fields is None or full in self.fields:
            return full, None
        parts = ph.split(".")
        for cut in range(len(parts) - 1, 0, -1):
            head = _unescape(".".join(parts[:cut]).replace("\x00", "."))
            if head in self.fields:
                tail = ".".join(parts[cut:])
                if head in self.expand_dots_fields:
                    # expand_dots: escaped dots unify with real nesting
                    # (fastfield/mod.rs:1139) — strip the distinction
                    path = _unescape(tail.replace("\x00", "."))
                else:
                    # reference default: the escaped dot marks a
                    # literal-dot KEY; keep the canonical ``\\.`` form
                    # the index side writes (analyzer.json_key_segment)
                    path = _canon_json_path(tail)
                return head, path
        raise QueryParserError(f"field does not exist: {full!r}")

    def _json_pathed(self, field: str, path: str, rest: str) -> ast.Query:
        """Atom addressed INSIDE a json field: literals hit the typed
        term dictionary (path=value / path#n=hex / path#b=bool,
        functions/jsonterm.py; ref src/schema/term.rs:72-80), numeric
        ranges lower to order-preserving term ranges."""
        from tantivy_spark.functions.jsonterm import (
            json_bool_term, json_num_term)

        if rest == "*":
            # exists-inside-json: every typed tag sorts within
            # [path + '#', path + '>') — '#' < '=' < '>'
            return ast.TermRangeQuery(lower=path + "#", upper=path + ">",
                                      lower_inclusive=True,
                                      upper_inclusive=False, field=field)
        if rest == "":
            nk, nv = self._peek()
            if nk in ("lbrack", "lbrace"):
                node = self._atom()      # TermRangeQuery, string bounds
                return self._json_range(field, path, node)
            if nk == "word" and nv.startswith(self._ELASTIC_OPS):
                self._next()
                return self._json_elastic(field, path, nv)
            if nk == "quoted":
                # phrase INSIDE a json value: every term carries the
                # path prefix, so only that path's positions participate
                node = self._atom()
                if isinstance(node, ast.TermQuery):
                    return ast.TermQuery(f"{path}={node.term}", field=field)
                if isinstance(node, ast.PhraseQuery):
                    return ast.PhraseQuery(
                        [f"{path}={t}" for t in node.phrase_terms],
                        slop=node.slop, field=field)
                return ast.EmptyQuery()
            raise QueryParserError(
                f"dangling json path prefix {field}.{path}:")
        op = next((o for o in self._ELASTIC_OPS if rest.startswith(o)), None)
        if op is not None:
            return self._json_elastic(field, path, rest)
        # literal: like the reference, try EVERY value interpretation —
        # the typed (number/bool) term OR the analyzed string tokens —
        # so `k:42` matches {"k": 42} and {"k": "42"} alike
        str_terms = [f"{path}={t}" for t in analyze_literal(rest)]
        if not str_terms:
            str_node: ast.Query = ast.EmptyQuery()
        elif len(str_terms) == 1:
            str_node = ast.TermQuery(str_terms[0], field=field)
        else:
            str_node = ast.PhraseQuery(str_terms, field=field)
        typed_node = None
        if rest in ("true", "false"):
            typed_node = ast.TermQuery(json_bool_term(path, rest == "true"),
                                       field=field)
        else:
            try:
                typed_node = ast.TermQuery(json_num_term(path, float(rest)),
                                           field=field)
            except ValueError:
                pass
        if typed_node is None:
            return str_node
        if isinstance(str_node, ast.EmptyQuery):
            return typed_node
        return ast.BooleanQuery([(ast.Occur.SHOULD, typed_node),
                                 (ast.Occur.SHOULD, str_node)])

    def _json_range(self, field: str, path: str,
                    node: ast.Query) -> ast.Query:
        from tantivy_spark.functions.jsonterm import json_range_query

        assert isinstance(node, ast.TermRangeQuery)
        lo, hi = node.lower, node.upper
        try:
            return json_range_query(
                path,
                None if lo is None else float(lo),
                None if hi is None else float(hi),
                node.lower_inclusive, node.upper_inclusive, field=field)
        except ValueError:
            # string-valued range: walk the untyped path=value span
            return ast.TermRangeQuery(
                lower=f"{path}=" if lo is None else f"{path}={lo}",
                upper=f"{path}>" if hi is None else f"{path}={hi}",
                lower_inclusive=False if lo is None
                else node.lower_inclusive,
                upper_inclusive=False if hi is None
                else node.upper_inclusive, field=field)

    def _json_elastic(self, field: str, path: str, val: str) -> ast.Query:
        op = next(o for o in self._ELASTIC_OPS if val.startswith(o))
        v = val[len(op):]
        if v == "":
            nk, nv = self._next()
            if nk != "word":
                raise QueryParserError(f"range operator {op!r} without value")
            v = nv
        lower = op in (">", ">=")
        incl = op in (">=", "<=")
        bounds = dict(lower=v if lower else None,
                      upper=None if lower else v,
                      lower_inclusive=incl if lower else True,
                      upper_inclusive=True if lower else incl)
        node = ast.TermRangeQuery(**bounds)
        return self._json_range(field, path, node)

    def _attach_field(self, node: ast.Query | None,
                      field: str) -> ast.Query | None:
        from dataclasses import replace
        fn = self._field_fns.get(field)
        if fn is not None and isinstance(node, (ast.TermQuery,
                                                ast.PhraseQuery)):
            # re-analyze the literal terms with the field's chain (a
            # quoted phrase was analyzed with the default chain first;
            # custom chains map each default token to >= 0 final tokens)
            if isinstance(node, ast.TermQuery):
                toks = fn(node.term)
            else:
                toks = [t for raw in node.phrase_terms for t in fn(raw)]
            if not toks:
                return ast.EmptyQuery()
            if len(toks) == 1:
                return ast.TermQuery(toks[0], field=field)
            slop = node.slop if isinstance(node, ast.PhraseQuery) else 0
            return ast.PhraseQuery(toks, slop=slop, field=field)
        ftype = self.field_types.get(field)
        if ftype and isinstance(node, ast.TermRangeQuery):
            # typed range -> columnar fast-field range (the reference's
            # date/numeric range branch, range_query_fastfield.rs)
            return ast.FastFieldRangeQuery(
                field=field,
                lower=None if node.lower is None
                else _typed_value(node.lower, ftype),
                upper=None if node.upper is None
                else _typed_value(node.upper, ftype),
                lower_inclusive=node.lower_inclusive,
                upper_inclusive=node.upper_inclusive)
        if isinstance(node, (ast.TermQuery, ast.PhraseQuery,
                             ast.PhrasePrefixQuery, ast.FuzzyTermQuery,
                             ast.TermSetQuery, ast.TermRangeQuery)):
            return replace(node, field=field)
        return node

    _ELASTIC_OPS = (">=", "<=", ">", "<")

    def _elastic_range(self, field: str | None, val: str) -> ast.Query | None:
        """Elastic-style one-sided ranges: 'field:>=v', bare '<=42', and
        the spaced form 'field: <= 70' (ported vectors,
        query_grammar.rs test_parse_elastic_query_ranges)."""
        op = next((o for o in self._ELASTIC_OPS if val.startswith(o)), None)
        if op is None:
            return None
        v = val[len(op):]
        if v == "":
            nk, nv = self._next()
            if nk != "word":
                raise QueryParserError(f"range operator {op!r} without value")
            v = nv
        ftype = self.field_types.get(field) if field else None
        lower = op in (">", ">=")
        incl = op in (">=", "<=")
        if ftype:
            tv = _typed_value(v, ftype)
            return ast.FastFieldRangeQuery(
                field=field,
                lower=tv if lower else None, upper=None if lower else tv,
                lower_inclusive=incl if lower else True,
                upper_inclusive=True if lower else incl)
        v = v.lower()
        return ast.TermRangeQuery(
            lower=v if lower else None, upper=None if lower else v,
            lower_inclusive=incl if lower else True,
            upper_inclusive=True if lower else incl, field=field)

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
            prefix = False
            if self._peek()[0] == "slop":
                slop = int(self._next()[1])
            elif self._peek()[0] == "pprefix":
                self._next()
                prefix = True
            terms = analyze_literal(val)
            if prefix:
                # '"a b"* ' — phrase whose LAST term is a prefix
                # (query_grammar.rs test_phrase_prefix :1808-1815)
                if not terms:
                    return ast.EmptyQuery()
                return ast.PhrasePrefixQuery(terms[:-1], prefix=terms[-1])
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
            # field prefix: validated against the field registry when one
            # is configured (ref: FieldDoesNotExist, query_parser.rs:87-92).
            # The resolved field rides on the AST node — multi-field
            # searchers qualify terms per field (query_parser.rs:336-412),
            # single-field engines ignore it (every known field resolves
            # to the same postings).
            if val.startswith(self._ELASTIC_OPS):
                # bare elastic range over the default field ('>a', '<=42')
                return self._elastic_range(None, val)
            field: str | None = None
            raw_field, rest0 = _split_field(val)
            if raw_field is not None and raw_field != "":
                field, json_path = self._resolve_field(raw_field)
                rest = rest0
                if json_path is not None:
                    return self._json_pathed(field, json_path, rest)
                if rest == "*":
                    return ast.ExistsQuery(field=field)
                if rest == "":
                    # 'field:' directly before a quoted phrase, a range
                    # atom, or a spaced elastic range ('title:"a b"',
                    # 'ts:[a TO b]', 'weight: <= 70'): parse the next
                    # atom and attach the field to it
                    nk, nv = self._peek()
                    if nk == "word" and nv.startswith(self._ELASTIC_OPS):
                        self._next()
                        return self._elastic_range(field, nv)
                    if nk == "word" and nv == "IN":
                        # spaced set syntax 'field: IN [a b]'
                        # (set_query.rs:131-157 parses exactly this form)
                        return self._attach_field(self._atom(), field)
                    if nk in ("quoted", "lbrack", "lbrace"):
                        return self._attach_field(self._atom(), field)
                    raise QueryParserError(f"dangling field prefix {field!r}:")
                val = rest
                er = self._elastic_range(field, val)
                if er is not None:
                    return er
                ftype = self.field_types.get(field)
                if ftype:
                    # typed literal ('ts:2021-03-01T00:00:00Z', 'n:42'):
                    # exact-value fast-field match (degenerate range)
                    v = _typed_value(val, ftype)
                    return ast.FastFieldRangeQuery(field=field, lower=v,
                                                   upper=v)
            fdist = 0
            if self._peek()[0] == "fuzzy":
                fdist = int(self._next()[1])
            terms = analyze_literal(val)
            if not terms:
                return None
            if len(terms) == 1:
                if fdist > 0:
                    # "term~N" (query_grammar.rs vector "a~2" :1799);
                    # transposition cost 1, the ES-compatible default
                    return ast.FuzzyTermQuery(terms[0], distance=fdist,
                                              transposition_cost_one=True,
                                              field=field)
                node: ast.Query = ast.TermQuery(terms[0], field=field)
            else:
                node = ast.PhraseQuery(terms, slop=0, field=field)
            if field is not None and field in self._field_fns:
                node = self._attach_field(node, field)
            return node
        raise QueryParserError(f"unexpected token {kind} {val!r}")


def parse_query_lenient(q: str, **kwargs) -> tuple[ast.Query, list[str]]:
    """Module-level convenience mirroring the reference's
    ``parse_query_lenient`` (query-grammar/src/lib.rs): never raises."""
    return QueryParser(**kwargs).parse_lenient(q)
