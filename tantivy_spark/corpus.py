"""Deterministic synthetic webtext corpora (pages schema) + adapters.

The north-rule input table is Common-Crawl-style pages
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.
Two sources:

- :func:`pages_from_documents` adapts the driver-generated
  ``documents.parquet`` test table into the pages schema (url derived from
  doc_id so that url order == doc_id order; ``html`` wraps ``text``, making
  the byte-identity-per-url invariant checkable).
- :func:`synthetic_pages` generates an arbitrary-size deterministic corpus
  whose content depends only on a per-row index (never on partitioning or
  parallelism): Zipf-ish vocabulary for hot-term skew, mixed case,
  punctuation, Unicode tokens, >=40-byte tokens (analyzer must drop them),
  and occasional empty documents.  Generation is distributed
  (spark.range -> JVM expressions; no driver materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# deterministic vocabulary: common words get low ranks (hot terms)
_COMMON = (
    "the of and to a in is was for on that with as by at from it an be this "
    "are or his which you had not but have her she they we one all were when "
    "there can more if out so up said what its about than into them only time"
).split()
_RARE_PREFIXES = ["zeta", "quark", "nimbus", "vortex", "ember", "lattice", "crypt", "fjord"]
_UNICODE_WORDS = ["naïve", "Ünïcödé", "Σίγμα", "straße", "crème", "日本語", "données"]
_LONG_TOKEN = "x" * 45  # 45 ASCII bytes -> must be dropped by RemoveLong(40)


def pages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet -> pages(url, warc_ts, html, text, lang).

    url embeds a zero-padded doc_id so lexicographic url order equals
    numeric doc_id order (stable DocAddress assignment either way).
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.format_string("https://example.org/doc/%010d", F.col("doc_id")).alias("url"),
        (F.to_timestamp(F.lit("2024-01-01 00:00:00"))
         + F.make_interval(secs=F.col("doc_id").cast("double"))).alias("warc_ts"),
        F.concat(
            F.lit("<html><body>").cast("binary"),
            F.encode(F.coalesce(F.col("text"), F.lit("")), "UTF-8"),
            F.lit("</body></html>").cast("binary"),
        ).alias("html"),
        F.col("text"),
        F.col("lang"),
    )


def pages_from_table(spark: SparkSession, table: str,
                     snapshot_id: int | None = None,
                     as_of: str | None = None) -> DataFrame:
    """The production input path: a CATALOG TABLE of Common-Crawl-style
    pages (url, warc_ts, html, text, lang) — on clusters with an Iceberg
    catalog this is the Iceberg table the north-star describes, read
    with optional SNAPSHOT PINNING so an index build (and any later
    resume of it) sees one immutable table state, the same immutability
    contract the reference gets from its meta.json snapshot.

    ``snapshot_id`` / ``as_of`` lower to Iceberg time travel
    (``VERSION AS OF`` / ``TIMESTAMP AS OF``); both are also understood
    by Delta, so the adapter is catalog-agnostic.  The sandbox has no
    catalog runtime, so tests exercise the parquet path
    (:func:`pages_from_documents`) — this function is the thin seam
    where the table source plugs in, and everything downstream consumes
    a plain DataFrame."""
    r = spark.read
    if snapshot_id is not None:
        r = r.option("snapshot-id", int(snapshot_id)) \
             .option("versionAsOf", int(snapshot_id))
    if as_of is not None:
        r = r.option("as-of-timestamp", as_of) \
             .option("timestampAsOf", as_of)
    return r.table(table).select("url", "warc_ts", "html", "text", "lang")


def synthetic_pages(spark: SparkSession, n_docs: int, seed: int = 7,
                    avg_len: int = 60) -> DataFrame:
    """Deterministic pages corpus of n_docs rows, partition-invariant.

    Every token choice is a pure function of (row id, token ordinal) via a
    64-bit mix, so the corpus is identical at any parallelism.  Token rank
    follows an approximate Zipf via an inverse-power transform of the
    uniform hash.  Entirely JVM-side (expressions over spark.range).
    """
    vocab = list(_COMMON)
    for p in _RARE_PREFIXES:
        vocab += [f"{p}{i:03d}" for i in range(40)]
    vocab_arr = F.array(*[F.lit(w) for w in vocab])
    v = len(vocab)

    df = spark.range(n_docs).withColumnRenamed("id", "rid")
    # per-doc length: 1 + (hash % (2*avg_len)) ; ~avg_len mean; some zeros
    h_doc = F.abs(F.xxhash64(F.col("rid"), F.lit(seed)))
    doc_len = F.when(h_doc % 97 == 0, F.lit(0)).otherwise((h_doc % (2 * avg_len)) + 1)

    tok_idx = F.sequence(F.lit(0), F.greatest(doc_len - 1, F.lit(0)))
    # uniform in (0,1) from a 64-bit mix of (rid, j)
    u = lambda j: (F.pmod(F.xxhash64(F.col("rid"), j, F.lit(seed + 1)), F.lit(1_000_003)) + 0.5) / 1_000_003.0
    # Zipf-ish rank: floor(v * u^3) concentrates mass on low ranks
    word_of = lambda j: F.element_at(vocab_arr, (F.floor(F.pow(u(j), 3.0) * v) + 1).cast("int"))
    # decorations keyed on a second hash
    decorate = lambda j, w: (
        F.when(F.pmod(F.xxhash64(F.col("rid"), j, F.lit(seed + 2)), 41) == 0, F.upper(w))
        .when(F.pmod(F.xxhash64(F.col("rid"), j, F.lit(seed + 2)), 41) == 1, F.initcap(w))
        .when(F.pmod(F.xxhash64(F.col("rid"), j, F.lit(seed + 2)), 53) == 2,
              F.element_at(F.array(*[F.lit(x) for x in _UNICODE_WORDS]),
                           (F.pmod(F.xxhash64(F.col("rid"), j, F.lit(seed + 3)),
                                   len(_UNICODE_WORDS)) + 1).cast("int")))
        .when(F.pmod(F.xxhash64(F.col("rid"), j, F.lit(seed + 2)), 199) == 3, F.lit(_LONG_TOKEN))
        .otherwise(w)
    )
    punct = lambda j: (
        F.when(F.pmod(F.xxhash64(F.col("rid"), j, F.lit(seed + 4)), 11) == 0, F.lit(", "))
        .when(F.pmod(F.xxhash64(F.col("rid"), j, F.lit(seed + 4)), 17) == 0, F.lit(". "))
        .otherwise(F.lit(" "))
    )
    text = F.when(
        doc_len == 0, F.lit("")
    ).otherwise(
        F.array_join(F.transform(tok_idx, lambda j: F.concat(decorate(j, word_of(j)), punct(j))), "")
    )

    return df.select(
        F.format_string("https://example.org/p/%012d", F.col("rid")).alias("url"),
        (F.to_timestamp(F.lit("2023-06-01 00:00:00"))
         + F.make_interval(secs=F.col("rid").cast("double"))).alias("warc_ts"),
        F.concat(F.lit("<html><body>").cast("binary"), F.encode(text, "UTF-8"),
                 F.lit("</body></html>").cast("binary")).alias("html"),
        text.alias("text"),
        F.when(F.pmod(F.xxhash64(F.col("rid"), F.lit(seed + 5)), 17) == 0, F.lit("el"))
        .when(F.pmod(F.xxhash64(F.col("rid"), F.lit(seed + 5)), 17) == 1, F.lit("de"))
        .otherwise(F.lit("en")).alias("lang"),
    )


def extract_text(html) -> "Column":
    """HTML binary/string column -> extracted plain text, the ingestion
    step for pages that arrive with ONLY ``html`` populated (the
    north-rule invariant "byte-identical extracted text per url" is
    asserted by re-extracting the wrapped corpus and comparing against
    its ``text`` column — tests + gate entry ``extract_text_docs``).

    Pure JVM regexp chain (codegen-friendly, no UDF):
    script/style/comment blocks drop wholesale; block-closing tags
    become newlines; remaining tags become spaces; the core entities
    decode; horizontal whitespace collapses and edges trim.  This is a
    whitespace-normalizing extractor in the readability/trafilatura
    family, not a DOM parser — pages whose visible text depends on CSS
    or JS need a real browser pipeline upstream."""
    from pyspark.sql import Column  # noqa: F401

    h = html.cast("string")
    h = F.regexp_replace(h, r"(?is)<(script|style)[^>]*>.*?</\1\s*>", " ")
    h = F.regexp_replace(h, r"(?s)<!--.*?-->", " ")
    h = F.regexp_replace(
        h, r"(?i)<br\s*/?>|</p\s*>|</div\s*>|</li\s*>|</tr\s*>|</h[1-6]\s*>",
        "\n")
    h = F.regexp_replace(h, r"<[^>]*>", " ")
    for ent, rep in (("&nbsp;", " "), ("&amp;", "&"), ("&lt;", "<"),
                     ("&gt;", ">"), ("&quot;", "\""), ("&#39;", "'")):
        h = F.replace(h, F.lit(ent), F.lit(rep))
    h = F.regexp_replace(h, r"[ \t]+", " ")
    h = F.regexp_replace(h, r" ?\n ?", "\n")
    h = F.regexp_replace(h, r"\n{3,}", "\n\n")
    # Spark's trim strips only spaces; edges may hold newlines too
    return F.regexp_replace(h, r"^\s+|\s+$", "")
