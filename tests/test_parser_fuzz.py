"""Property tests for the query parser: ``parse_lenient`` NEVER raises
(the reference's parse_query_lenient contract, query-grammar/src/lib.rs)
and well-formed queries always parse."""

from hypothesis import given, settings
from hypothesis import strategies as st

from tantivy_spark.query import ast
from tantivy_spark.query.parser import QueryParser, parse_query_lenient


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=80))
def test_lenient_never_raises(q):
    node, errors = parse_query_lenient(q)
    assert isinstance(node, ast.Query)
    assert isinstance(errors, list)


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet='ab c():"~^+-*[]{}\\\'ORANDTO0123.', max_size=60))
def test_lenient_never_raises_on_grammar_soup(q):
    """Dense operator/bracket soup — the adversarial case for repairs."""
    node, _errors = parse_query_lenient(q)
    assert isinstance(node, ast.Query)


_word = st.sampled_from(["data", "fast", "scan", "order", "sort", "the"])
_atom = st.one_of(
    _word,
    _word.map(lambda w: f"+{w}"),
    _word.map(lambda w: f"-{w}"),
    _word.map(lambda w: f"{w}~1"),
    st.tuples(_word, _word).map(lambda t: f'"{t[0]} {t[1]}"'),
    st.tuples(_word, _word).map(lambda t: f"[{t[0]} TO {t[1]}]"),
)


@st.composite
def _well_formed(draw):
    parts = [draw(_atom)]
    for _ in range(draw(st.integers(0, 3))):
        conn = draw(st.sampled_from([" ", " AND ", " OR "]))
        parts.append(conn + draw(_atom))
    q = "".join(parts)
    if draw(st.booleans()):
        q = f"({q}) {draw(_atom)}"
    return q


@settings(max_examples=300, deadline=None)
@given(_well_formed())
def test_well_formed_always_parses(q):
    node = QueryParser().parse(q)
    assert isinstance(node, ast.Query)
    # and lenient agrees with strict on clean input
    lenient, errors = parse_query_lenient(q)
    assert errors == []
    assert lenient == node
