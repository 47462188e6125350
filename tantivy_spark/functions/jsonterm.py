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

Precision note: all numbers route through the f64 encoding (one tag
instead of the reference's separate i64/u64/f64 tags, term.rs:72-80) —
integers are exact up to 2^53; beyond that adjacent integers may share
an encoding.  Web-page json payloads rarely carry >2^53 integers; if a
corpus does, add an ``#i=`` offset-binary i64 tag alongside.
"""

from __future__ import annotations

import struct

from tantivy_spark.query.ast import TermRangeQuery

#: type-tag markers after the JSON path (term.rs:72-80 value type tags)
NUM_TAG = "#n="
BOOL_TAG = "#b="


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
