"""Typed JSON terms: numeric/bool values under JSON paths carry a type
tag in the dictionary key, enabling RANGE queries inside JSON fields.

Reference: src/schema/term.rs:72-80 — a JSON term is encoded as
``path ++ END_OF_PATH ++ value_type_tag ++ value_bytes``, with numbers
stored in an order-preserving binary form so FST range walks work.  The
Spark-native analogue keeps the term dictionary a plain sorted string
column: the type tag is a printable marker after the path and numeric
values are encoded as ORDER-PRESERVING 16-hex-digit strings (the classic
monotone f64 <-> u64 mapping, same trick the repo's IpAddr fields use
with u128-hex keys), so an ordinary :class:`TermRangeQuery` — which is
already distributed with parquet min/max pushdown — answers numeric
ranges under a JSON path with no new physical operator.

Term shapes (``#`` cannot appear in analyzer output [\\p{L}\\p{N}]+,
so no collision with text terms):

- string leaf:  ``{path}={value}``       (unchanged from the untyped scheme)
- number leaf:  ``{path}#n={hex16}``     (order-preserving encoding)
- bool leaf:    ``{path}#b=true|false``

Precision: numbers route through the f64 encoding (exact to 2^53);
INTEGER leaves additionally index an exact ``{path}#i={hex16}`` term
(offset-binary i64 — r05, mirroring the reference's separate i64 tag,
term.rs:72-80), so equality and ranges over >2^53 integers stay exact
via :func:`json_int_range_query` while float queries keep using the
``#n=`` span.
"""

from __future__ import annotations

import struct

from tantivy_spark.query.ast import TermRangeQuery

#: type-tag markers after the JSON path (term.rs:72-80 value type tags)
NUM_TAG = "#n="
BOOL_TAG = "#b="
INT_TAG = "#i="


def f64_sortable_hex(x: float) -> str:
    """Order-preserving encoding of a float64 as 16 lowercase hex chars:
    positive floats get the sign bit set, negative floats are bitwise
    complemented — the standard monotone f64->u64 mapping, so string
    comparison over the hex form == numeric comparison over the value."""
    (bits,) = struct.unpack(">Q", struct.pack(">d", float(x)))
    if bits & 0x8000_0000_0000_0000:
        bits = bits ^ 0xFFFF_FFFF_FFFF_FFFF
    else:
        bits = bits | 0x8000_0000_0000_0000
    return format(bits, "016x")


def json_num_term(path: str, value: float) -> str:
    return f"{path}{NUM_TAG}{f64_sortable_hex(value)}"


def i64_sortable_hex(v: int) -> str:
    """Order-preserving EXACT encoding of an int64 as 16 hex chars:
    offset binary (v + 2^63), so string order == numeric order with no
    precision loss anywhere in the i64 domain."""
    v = int(v)
    if not (-(1 << 63) <= v < (1 << 63)):
        raise ValueError(f"integer out of i64 range: {v}")
    return format(v + (1 << 63), "016x")


def json_int_term(path: str, value: int) -> str:
    return f"{path}{INT_TAG}{i64_sortable_hex(value)}"


def json_bool_term(path: str, value: bool) -> str:
    return f"{path}{BOOL_TAG}{'true' if value else 'false'}"


def json_str_term(path: str, value: str) -> str:
    return f"{path}={value}"


def json_range_query(path: str, lower: float | None = None,
                     upper: float | None = None,
                     lower_inclusive: bool = True,
                     upper_inclusive: bool = True,
                     field: str | None = None) -> TermRangeQuery:
    """Numeric range under a JSON path as a plain term-range over the
    typed dictionary keys (the reference expresses json ranges the same
    way: an FST range over ``path ++ type_tag ++ encoded value``,
    range_query.rs over term.rs:72-80 keys).  Unbounded sides pin to the
    ``{path}#n=`` prefix span — hex digits all sort below ``"g"``."""
    if lower is not None:
        lo, lo_incl = f"{path}{NUM_TAG}{f64_sortable_hex(lower)}", \
            lower_inclusive
    else:
        lo, lo_incl = f"{path}{NUM_TAG}", False
    if upper is not None:
        hi, hi_incl = f"{path}{NUM_TAG}{f64_sortable_hex(upper)}", \
            upper_inclusive
    else:
        hi, hi_incl = f"{path}{NUM_TAG}g", False
    return TermRangeQuery(lo, hi, lo_incl, hi_incl, field=field)


def json_int_range_query(path: str, lower: int | None = None,
                         upper: int | None = None,
                         lower_inclusive: bool = True,
                         upper_inclusive: bool = True,
                         field: str | None = None) -> TermRangeQuery:
    """EXACT integer range under a JSON path over the ``#i=`` terms —
    no f64 rounding anywhere in the i64 domain (the reference's i64
    type tag, term.rs:72-80).  Unbounded sides pin to the tag's prefix
    span like :func:`json_range_query`."""
    if lower is not None:
        lo, lo_incl = f"{path}{INT_TAG}{i64_sortable_hex(lower)}", \
            lower_inclusive
    else:
        lo, lo_incl = f"{path}{INT_TAG}", False
    if upper is not None:
        hi, hi_incl = f"{path}{INT_TAG}{i64_sortable_hex(upper)}", \
            upper_inclusive
    else:
        hi, hi_incl = f"{path}{INT_TAG}g", False
    return TermRangeQuery(lo, hi, lo_incl, hi_incl, field=field)
