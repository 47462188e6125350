"""URL operators for web-corpus pipelines: normalization, host /
registered-domain extraction, and per-domain document caps — the
standard Common-Crawl curation steps (canonicalize URLs before exact
dedup; cap any single domain's contribution to the training mix).

All JVM-side column expressions (regexp / lower / window) — no UDFs.
The registered-domain heuristic uses the last two host labels plus a
small built-in set of common two-part public suffixes (co.uk, com.au,
...); a full public-suffix list is a data file a deployment can swap
in, not a code change — the operator takes ``extra_suffixes``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: common two-part public suffixes (abridged, the high-traffic tail of
#: the public-suffix list; extend per deployment via ``extra_suffixes``)
TWO_PART_SUFFIXES = [
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "com.br", "com.cn", "com.mx",
    "co.in", "co.kr", "com.tw", "com.sg", "co.za", "com.ar", "com.tr",
]


def url_host(url: Column) -> Column:
    """Lowercased host of a URL (port stripped); '' for unparseable."""
    return F.lower(F.coalesce(
        F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#:]+)", 1),
        F.lit("")))


def registered_domain(url: Column,
                      extra_suffixes: list[str] | None = None) -> Column:
    """Registered (pay-level) domain of a URL: the last two host
    labels, or three when the last two form a known public suffix
    ("bbc.co.uk" -> bbc.co.uk, "a.b.example.com" -> example.com)."""
    host = url_host(url)
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    suff = list(TWO_PART_SUFFIXES) + list(extra_suffixes or ())
    three = F.concat_ws(".", F.element_at(parts, -3), last2)
    return (F.when(n <= 2, host)
            .when(last2.isin(suff), three)
            .otherwise(last2))


def url_normalize(url: Column) -> Column:
    """Canonical URL form for exact dedup: lowercase scheme+host, strip
    the fragment, default ports (:80 for http, :443 for https), and a
    trailing slash on a bare path.  Content-identical spellings
    collapse; querystrings are preserved verbatim (reordering query
    params changes semantics on many sites)."""
    u = F.regexp_replace(url, r"#.*$", "")               # fragment
    # lowercase scheme://host while preserving the path's case
    u = F.concat(
        F.lower(F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)),
        F.regexp_extract(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(.*)$", 1))
    u = F.regexp_replace(u, r"^(https://[^/?#]*):443(?=[/?#]|$)", "$1")
    u = F.regexp_replace(u, r"^(http://[^/?#]*):80(?=[/?#]|$)", "$1")
    u = F.regexp_replace(u, r"^([a-z][a-z0-9+.-]*://[^/?#]+)/$", "$1")
    return u


def cap_per_domain(docs: DataFrame, url_col: str = "url",
                   max_docs: int = 1000, id_col: str = "doc_id",
                   seed: int = 0,
                   extra_suffixes: list[str] | None = None) -> DataFrame:
    """Keep at most ``max_docs`` documents per registered domain,
    selected in seed-deterministic hash order (no rand() — stable
    across runs/retries like sample_token_budget).  The standard
    anti-spam / diversity cap on web corpora.

    One window per domain; adds a ``domain`` column."""
    if max_docs < 1:
        raise ValueError("max_docs must be >= 1")
    out = docs.withColumn(
        "domain", registered_domain(F.col(url_col), extra_suffixes))
    rnd = F.xxhash64(F.col(id_col).cast("string"), F.lit(seed))
    w = Window.partitionBy("domain").orderBy(rnd.asc(), F.col(id_col).asc())
    return (out.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= max_docs)
            .drop("__rk"))
