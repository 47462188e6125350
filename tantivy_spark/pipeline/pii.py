"""PII detection and redaction — the scrubbing pass every large-scale
training-data pipeline runs before text leaves the ingest tier.

Entirely JVM-side (``regexp_extract_all`` / ``regexp_replace`` inside
whole-stage codegen): one projection per document, no shuffle, no
Python.  At 100 TB this is a pure map over the corpus — it pipelines
with whatever scan feeds it and adds no stage boundary.

Pattern dialect note: the patterns below deliberately stay inside the
common Java-regex / RE2 subset (no backreferences, no lookaround, no
possessive quantifiers) so an engine-independent oracle (DuckDB, RE2)
reproduces the exact same matches — the driver gate relies on this.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: detection patterns, applied in this order during redaction (an
#: earlier redaction can destroy a later pattern's match — definition
#: order is part of the contract, like any scrubbing DAG)
PII_PATTERNS: dict[str, str] = {
    # local-part@domain.tld — the permissive training-data form, not
    # RFC 5322 (which needs lookaround and catches too little anyway)
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    # dotted-quad IPv4; \b keeps 1.2.3.4.5 from matching twice
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    # US SSN shape
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
    # 13-16 digit runs with optional space/dash separators (card shape)
    "card": r"\b(?:[0-9][ -]?){12,15}[0-9]\b",
    # international-ish phone: leading + or digit, >= 9 total chars of
    # digits/separators, digit-terminated
    "phone": r"\+[0-9][0-9() .-]{7,}[0-9]",
}


def pii_counts(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Per-document PII match counts, one BIGINT column per pattern in
    :data:`PII_PATTERNS` plus ``pii_total`` — the triage table a
    pipeline thresholds on (drop, redact, or pass).  Single codegen'd
    projection; no shuffle."""
    cols = [F.col(id_col)]
    total = F.lit(0)
    for name, pat in PII_PATTERNS.items():
        c = F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat),
                                        F.lit(0)))
        cols.append(c.cast("bigint").alias(f"n_{name}"))
        total = total + c
    cols.append(total.cast("bigint").alias("pii_total"))
    return df.select(*cols)


def pii_redact(df: DataFrame, text_col: str = "text",
               replacement: str = "<{kind}>") -> DataFrame:
    """Replace every PII match with a typed placeholder (default
    ``<email>``, ``<ipv4>``, ...), applying :data:`PII_PATTERNS` in
    definition order.  All other columns pass through; the text column
    is rewritten in place.  Chained ``regexp_replace`` stays one
    codegen'd projection."""
    c = F.col(text_col)
    for name, pat in PII_PATTERNS.items():
        c = F.regexp_replace(c, pat, replacement.format(kind=name))
    return df.withColumn(text_col, c)
