"""Engine-independent DuckDB oracles for the hash-based dedup operators.

DuckDB has no ``xxhash64``, so for five rounds ``minhash_lsh_pairs``,
``jaccard_verified_pairs`` and ``simhash_docs`` were rows-only gate
entries.  This module closes that gap: it recomputes the 64-bit hashes
from the PUBLISHED xxHash64 spec in pure Python/numpy
(:mod:`tantivy_spark.functions.xxh` — an independent implementation,
pinned against Spark by tests/test_xxh.py) and injects them as literal
``VALUES`` tables into self-contained DuckDB SQL, which then performs
the banding join / bucket cap / pair grouping / shingle-set Jaccard /
bit-vote assembly itself.  Every downstream relational step is therefore
checked by an independent engine; only the raw 64-bit hash values come
from the spec reimplementation.

The oracle corpus is read at SQL-build time from the gate scale factor
directory — the driver's correctness gate always runs at sf0.01, and
``scripts/check_gate.py`` exports ``SPARK_GRAFT_GATE_SF_DIR`` for local
simulations at other scales.

Tokenizer parity note: the JVM pipeline tokenizes with the Java regex
``[\\p{L}\\p{N}]+`` (dedup.py shingle_hashes / simhash64).  The Python
replica uses ``[^\\W_]+`` which matches it exactly on ASCII corpora (the
synthetic testdata is pure ASCII — asserted below, loud failure
otherwise).
"""

from __future__ import annotations

import os
import re

from tantivy_spark.functions.xxh import (
    SPARK_SEED, _signed, spark_xxhash64, xxh64_int_np, xxh64_long_np)

_TOKEN_RE = re.compile(r"[^\W_]+")
_MAX_TOKEN_BYTES = 40  # tantivy_spark.MAX_TOKEN_BYTES (RemoveLong(40))


def gate_sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_GATE_SF_DIR", "/root/testdata/sf0.01")


def _read_documents(sf_dir: str) -> list[tuple[int, str]]:
    import duckdb
    rows = duckdb.sql(
        f"SELECT doc_id, coalesce(text, '') FROM "
        f"'{sf_dir}/documents.parquet' ORDER BY doc_id").fetchall()
    for _, t in rows:
        if not t.isascii():
            raise ValueError(
                "dedup oracle requires an ASCII corpus for tokenizer "
                "parity (Java \\p{L}\\p{N} vs Python [^\\W_])")
    return [(int(i), t) for i, t in rows]


def _with_dupes(docs: list[tuple[int, str]]) -> list[tuple[int, str]]:
    """Mirror of __spark_entry__._documents_with_dupes."""
    return docs + [(i + 10_000_000, t) for i, t in docs if i % 50 == 0]


def _with_half_dupes(docs: list[tuple[int, str]]) -> list[tuple[int, str]]:
    """Mirror of __spark_entry__._documents_with_half_dupes (Spark
    ``cast(length(text)/2 as int)`` truncates toward zero)."""
    return docs + [(i + 10_000_000, t[: int(len(t) / 2)])
                   for i, t in docs if i % 50 == 0]


def _tokens_lower(text: str) -> list[str]:
    """shingle_hashes tokenization: lowercase THEN split (no length
    filter — dedup shingles deliberately skip RemoveLong)."""
    return _TOKEN_RE.findall(text.lower())


def _doc_sigs(docs: list[tuple[int, str]], num_hashes: int = 32,
              shingle_k: int = 3) -> list[tuple[int, list[int]]]:
    """(id, signature) replicating minhash_signatures for every doc with
    >= k tokens (docs below that have no shingles and no signature)."""
    import numpy as np
    out: list[tuple[int, list[int]]] = []
    for did, text in docs:
        toks = _tokens_lower(text)
        if len(toks) < shingle_k:
            continue
        shs = np.array(
            [spark_xxhash64(*toks[i:i + shingle_k])
             for i in range(len(toks) - shingle_k + 1)],
            dtype=np.int64).view(np.uint64)
        # permutation i = xxhash64(sh BIGINT, lit(i) INT): hashLong then
        # chained hashInt — vectorized across the shingle axis
        base = xxh64_long_np(shs, SPARK_SEED)
        out.append((did, [int(xxh64_int_np(i, base).view(np.int64).min())
                          for i in range(num_hashes)]))
    return out


def _sig_band_rows(sigs: list[tuple[int, list[int]]], bands: int = 8,
                   rows_per_band: int = 4) -> list[tuple[int, int, int]]:
    out: list[tuple[int, int, int]] = []
    for did, sig in sigs:
        for b in range(bands):
            chunk = sig[b * rows_per_band:(b + 1) * rows_per_band]
            out.append((did, b, spark_xxhash64(*chunk)))
    return out


def _band_rows(docs: list[tuple[int, str]], num_hashes: int = 32,
               bands: int = 8, rows_per_band: int = 4,
               shingle_k: int = 3) -> list[tuple[int, int, int]]:
    """(id, band, bhash) rows replicating minhash_signatures +
    minhash_lsh_candidates banding for every doc with >= k tokens."""
    return _sig_band_rows(_doc_sigs(docs, num_hashes, shingle_k),
                          bands, rows_per_band)


def _values(rows, types: str) -> str:
    body = ",".join("(" + ",".join(str(v) for v in r) + ")" for r in rows)
    return f"(VALUES {body})" if rows else f"(SELECT {types} WHERE FALSE)"


def _band_cte(rows) -> str:
    return ("band(id, band, bhash) AS " +
            _values(rows, "0 AS id, 0 AS band, 0 AS bhash") + ",\n" +
            "sized AS (SELECT id, band, bhash FROM band "
            "QUALIFY count(*) OVER (PARTITION BY band, bhash) <= 200),\n"
            "cands AS (SELECT a.id AS id_a, c.id AS id_b, "
            "count(*) AS n_bands_matched FROM sized a JOIN sized c "
            "ON a.band = c.band AND a.bhash = c.bhash AND a.id < c.id "
            "GROUP BY a.id, c.id)")


def minhash_lsh_sql(sf_dir: str | None = None) -> str:
    """Oracle for minhash_lsh_pairs: Python-spec band hashes over the
    seeded-dupe corpus as a literal table; DuckDB applies the
    max_bucket=200 cap, the banded self-join and the pair fold."""
    docs = _with_dupes(_read_documents(sf_dir or gate_sf_dir()))
    rows = _band_rows(docs)
    return ("WITH " + _band_cte(rows) + "\n"
            "SELECT CAST(id_a AS BIGINT) AS id_a, "
            "CAST(id_b AS BIGINT) AS id_b, "
            "CAST(n_bands_matched AS BIGINT) AS n_bands_matched "
            "FROM cands ORDER BY id_a, id_b")


def jaccard_verified_sql(sf_dir: str | None = None) -> str:
    """Oracle for jaccard_verified_pairs: LSH candidates from the
    injected band table; the exact 3-shingle Jaccard is computed BY
    DUCKDB from the raw text (distinct shingle STRINGS — hash-free, so
    this side is fully engine-independent)."""
    docs = _with_half_dupes(_read_documents(sf_dir or gate_sf_dir()))
    rows = _band_rows(docs)
    return (
        "WITH " + _band_cte(rows) + ",\n"
        "docs AS (SELECT doc_id AS id, text FROM documents UNION ALL "
        "SELECT doc_id + 10000000, substr(text, 1, "
        "CAST(floor(length(text) / 2.0) AS INT)) FROM documents "
        "WHERE doc_id % 50 = 0),\n"
        "cids AS (SELECT id_a AS id FROM cands "
        "UNION SELECT id_b FROM cands),\n"
        "toks AS (SELECT d.id, regexp_extract_all(lower(coalesce(d.text, "
        "'')), '[\\p{L}\\p{N}]+') AS t FROM docs d JOIN cids USING (id)),\n"
        "sh AS (SELECT DISTINCT id, t[i] || ' ' || t[i+1] || ' ' || t[i+2]"
        " AS s FROM toks, LATERAL (SELECT unnest(generate_series(1, "
        "len(t) - 2)) AS i) g),\n"
        "sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY id),\n"
        "inter AS (SELECT c.id_a, c.id_b, count(*) AS n_inter FROM cands c"
        " JOIN sh a ON a.id = c.id_a "
        "JOIN sh b ON b.id = c.id_b AND a.s = b.s GROUP BY c.id_a, c.id_b)"
        "\nSELECT CAST(c.id_a AS BIGINT) AS id_a, "
        "CAST(c.id_b AS BIGINT) AS id_b, "
        "round(CAST(coalesce(i.n_inter, 0) AS DOUBLE) / "
        "(na.n + nb.n - coalesce(i.n_inter, 0)), 4) AS jaccard_r "
        "FROM cands c LEFT JOIN inter i "
        "ON i.id_a = c.id_a AND i.id_b = c.id_b "
        "JOIN sizes na ON na.id = c.id_a JOIN sizes nb ON nb.id = c.id_b "
        "ORDER BY id_a, id_b")


def incremental_dedup_sql(sf_dir: str | None = None,
                          num_hashes: int = 32, bands: int = 8,
                          rows_per_band: int = 4, shingle_k: int = 3,
                          threshold: float = 0.5) -> str:
    """Oracle for incremental_dedup_docs (pipeline.dedup.dedup_against):
    Python-spec signatures + band hashes for BOTH sides as literal
    tables; DuckDB itself applies the ref-side bucket cap, the
    new-vs-ref band join, the per-pair signature-agreement estimate,
    the deterministic best-match selection, and the threshold.  The ref
    signature table is pre-filtered in Python to a SUPERSET of the
    joinable ids (uncapped bucket intersection — the cap only removes
    candidates, so the SQL join stays authoritative) to bound the
    literal-SQL size."""
    docs = _read_documents(sf_dir or gate_sf_dir())
    new = ([(i + 10_000_000, t) for i, t in docs if i % 50 == 0]
           + [(i + 20_000_000, t[: int(len(t) / 2)])
              for i, t in docs if i % 50 == 25])
    ref_sigs = _doc_sigs(docs, num_hashes, shingle_k)
    new_sigs = _doc_sigs(new, num_hashes, shingle_k)
    bn = _sig_band_rows(new_sigs, bands, rows_per_band)
    br = _sig_band_rows(ref_sigs, bands, rows_per_band)
    new_buckets = {(b, h) for _, b, h in bn}
    cand_ref = {did for did, b, h in br if (b, h) in new_buckets}
    sigr = [(did, i, h) for did, sig in ref_sigs if did in cand_ref
            for i, h in enumerate(sig)]
    sign = [(did, i, h) for did, sig in new_sigs
            for i, h in enumerate(sig)]
    newids = [(i,) for i, _ in new]
    return (
        "WITH bandn(id, band, bhash) AS "
        + _values(bn, "0 AS id, 0 AS band, 0 AS bhash") + ",\n"
        "bandr(id, band, bhash) AS "
        + _values(br, "0 AS id, 0 AS band, 0 AS bhash") + ",\n"
        "sizedr AS (SELECT id, band, bhash FROM bandr "
        "QUALIFY count(*) OVER (PARTITION BY band, bhash) <= 200),\n"
        "cands AS (SELECT DISTINCT n.id AS id, rf.id AS ref_id "
        "FROM bandn n JOIN sizedr rf "
        "ON n.band = rf.band AND n.bhash = rf.bhash),\n"
        "sign(id, i, h) AS " + _values(sign, "0 AS id, 0 AS i, 0 AS h")
        + ",\n"
        "sigr(id, i, h) AS " + _values(sigr, "0 AS id, 0 AS i, 0 AS h")
        + ",\n"
        "est AS (SELECT c.id, c.ref_id, "
        "CAST(sum(CASE WHEN a.h = b.h THEN 1 ELSE 0 END) AS DOUBLE) / "
        f"{num_hashes} AS ej FROM cands c "
        "JOIN sign a ON a.id = c.id "
        "JOIN sigr b ON b.id = c.ref_id AND b.i = a.i "
        "GROUP BY c.id, c.ref_id),\n"
        "best AS (SELECT id, ref_id, ej FROM est QUALIFY row_number() "
        "OVER (PARTITION BY id ORDER BY ej DESC, ref_id ASC) = 1),\n"
        "newids(id) AS " + _values(newids, "0 AS id") + "\n"
        "SELECT CAST(n.id AS BIGINT) AS doc_id, "
        f"coalesce(b.ej >= {threshold}, FALSE) AS is_dup, "
        "CAST(b.ref_id AS BIGINT) AS best_match, "
        "round(b.ej, 4) AS est_r "
        "FROM newids n LEFT JOIN best b ON b.id = n.id ORDER BY doc_id")


def simhash_sql(sf_dir: str | None = None) -> str:
    """Oracle for simhash_docs: per-(doc, token-hash) counts as a literal
    table (hashes from the Python spec implementation); DuckDB performs
    the 64 bit-votes and the sign/bit assembly itself (signed two's-
    complement: bit 63 contributes -2^63)."""
    sfd = sf_dir or gate_sf_dir()
    docs = _read_documents(sfd)
    hcache: dict[str, int] = {}
    rows: list[tuple[int, int, int]] = []
    for did, text in docs:
        counts: dict[int, int] = {}
        # simhash64 tokenizes the ORIGINAL text, length-filters the raw
        # token, then hashes the lowercased token
        for rt in _TOKEN_RE.findall(text):
            if len(rt.encode("utf-8")) >= _MAX_TOKEN_BYTES:
                continue
            lt = rt.lower()
            h = hcache.get(lt)
            if h is None:
                h = hcache[lt] = spark_xxhash64(lt)
            counts[h] = counts.get(h, 0) + 1
        for h, c in counts.items():
            rows.append((did, h, c))
    return (
        "WITH tok(id, h, cnt) AS " +
        _values(rows, "0 AS id, 0 AS h, 0 AS cnt") + ",\n"
        "bits AS (SELECT id, j, sum(CASE WHEN (h >> j) & 1 = 1 THEN cnt "
        "ELSE -cnt END) AS v FROM tok, LATERAL (SELECT "
        "unnest(generate_series(0, 63)) AS j) g GROUP BY id, j),\n"
        "sig AS (SELECT id, CAST(sum(CASE WHEN v > 0 THEN CASE WHEN "
        "j = 63 THEN -9223372036854775807 - 1 ELSE 1::BIGINT << j END "
        "ELSE 0 END) AS BIGINT) AS simhash FROM bits GROUP BY id)\n"
        "SELECT CAST(d.doc_id AS BIGINT) AS id, "
        "CAST(coalesce(s.simhash, 0) AS BIGINT) AS simhash "
        "FROM documents d LEFT JOIN sig s ON s.id = d.doc_id "
        "ORDER BY id")


def token_budget_sample_sql(budgets: dict[str, int] | None = None,
                            seed: int = 0,
                            sf_dir: str | None = None) -> str:
    """Oracle for token_budget_sample_docs: the per-doc
    ``xxhash64(cast(doc_id as string), seed)`` rank is Spark-specific,
    so compute it spec-correct in Python (functions/xxh.py, pinned
    against Spark) and inject it as a literal table; DuckDB then replays
    the per-stratum cumulative-budget window verbatim."""
    import duckdb

    from tantivy_spark.functions.xxh import _signed, xxh64_bytes, xxh64_int

    budgets = budgets or {"en": 40_000, "de": 15_000}
    sfd = sf_dir or gate_sf_dir()
    langs = ",".join(f"'{l}'" for l in budgets)
    rows = duckdb.sql(
        f"SELECT doc_id FROM '{sfd}/documents.parquet' "
        f"WHERE lang IN ({langs}) ORDER BY doc_id").fetchall()
    lits = [(int(i), _signed(xxh64_int(
        seed, xxh64_bytes(str(int(i)).encode(), 42)))) for (i,) in rows]
    case = " ".join(f"WHEN '{l}' THEN {int(b)}" for l, b in budgets.items())
    return (
        "WITH h(doc_id, h) AS " + _values(lits, "0 AS doc_id, 0 AS h") +
        ",\nj AS (SELECT d.doc_id, d.lang, d.n_chars, h.h, "
        f"CASE d.lang {case} END AS budget "
        "FROM documents d JOIN h ON d.doc_id = h.doc_id "
        f"WHERE d.lang IN ({langs})),\n"
        "r AS (SELECT *, sum(n_chars) OVER (PARTITION BY lang "
        "ORDER BY h ASC, doc_id ASC ROWS BETWEEN UNBOUNDED PRECEDING "
        "AND CURRENT ROW) AS cum FROM j)\n"
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, lang, "
        "CAST(n_chars AS BIGINT) AS n_tokens FROM r "
        "WHERE cum - n_chars < budget ORDER BY doc_id")


def _simhash_py(text: str, hcache: dict[str, int]) -> int:
    """Python-spec 64-bit SimHash replicating pipeline/dedup.simhash64
    exactly (token regex, 40-byte raw-length filter, lowercase-then-
    hash, +cnt/-cnt bit votes, signed two's-complement assembly)."""
    counts: dict[int, int] = {}
    for rt in _TOKEN_RE.findall(text):
        if len(rt.encode("utf-8")) >= _MAX_TOKEN_BYTES:
            continue
        lt = rt.lower()
        h = hcache.get(lt)
        if h is None:
            h = hcache[lt] = spark_xxhash64(lt)
        counts[h] = counts.get(h, 0) + 1
    sig = 0
    for j in range(64):
        v = sum(c if (h >> j) & 1 else -c for h, c in counts.items())
        if v > 0:
            sig |= 1 << j
    return sig - (1 << 64) if sig >= (1 << 63) else sig


def simhash_near_dup_sql(max_hamming: int = 3, max_bucket: int = 2000,
                         sf_dir: str | None = None) -> str:
    """Oracle for simhash_near_dup_pairs: python-spec signatures AND
    their Hamming-LSH chunk values as literal tables (the chunking uses
    an unsigned view of the signed signature, like Spark's
    shiftrightunsigned); DuckDB replays the bucket cap, the chunk
    equi-join, and the exact popcount(xor) verification itself."""
    docs = _with_dupes(_read_documents(sf_dir or gate_sf_dir()))
    hcache: dict[str, int] = {}
    sigs = [(did, _simhash_py(t, hcache)) for did, t in docs]
    ch_rows = _simhash_chunk_rows(sigs, max_hamming)
    return (
        "WITH sig(id, s) AS " + _values(sigs, "0 AS id, 0 AS s") + ",\n"
        "ch(id, chunk, cval) AS " +
        _values(ch_rows, "0 AS id, 0 AS chunk, 0 AS cval") + ",\n"
        "f AS (SELECT id, chunk, cval FROM ch QUALIFY count(*) OVER "
        f"(PARTITION BY chunk, cval) <= {max_bucket}),\n"
        "p AS (SELECT DISTINCT a.id AS id_a, c.id AS id_b FROM f a "
        "JOIN f c ON a.chunk = c.chunk AND a.cval = c.cval "
        "AND a.id < c.id)\n"
        "SELECT CAST(p.id_a AS BIGINT) AS id_a, "
        "CAST(p.id_b AS BIGINT) AS id_b, "
        "CAST(bit_count(xor(sa.s, sb.s)) AS BIGINT) AS hamming "
        "FROM p JOIN sig sa ON sa.id = p.id_a "
        "JOIN sig sb ON sb.id = p.id_b "
        f"WHERE bit_count(xor(sa.s, sb.s)) <= {max_hamming} "
        "ORDER BY id_a, id_b")


def _simhash_chunk_rows(sigs: list[tuple[int, int]],
                        max_hamming: int) -> list[tuple[int, int, int]]:
    """(id, chunk, cval) Hamming-LSH chunk rows over the UNSIGNED view
    of the signed signatures (mirrors dedup._simhash_chunk_cols)."""
    n_chunks = max_hamming + 1
    base, extra = divmod(64, n_chunks)
    out: list[tuple[int, int, int]] = []
    for did, s in sigs:
        u = s & 0xFFFFFFFFFFFFFFFF
        off = 0
        for i in range(n_chunks):
            w = base + (1 if i < extra else 0)
            out.append((did, i, (u >> off) & ((1 << w) - 1)))
            off += w
    return out


def simhash_incremental_sql(max_hamming: int = 3, max_bucket: int = 2000,
                            sf_dir: str | None = None) -> str:
    """Oracle for simhash_incremental_docs: python-spec signatures for
    the reference corpus AND the +10M-id verbatim new batch, chunk rows
    for both sides as literal tables; DuckDB replays the store cap, the
    new-vs-ref chunk join, the exact popcount verify, and the
    deterministic (hamming, ref_id)-min best-match selection."""
    docs = _read_documents(sf_dir or gate_sf_dir())
    new = [(i + 10_000_000, t) for i, t in docs if i % 50 == 0]
    hcache: dict[str, int] = {}
    ref_sigs = [(d, _simhash_py(t, hcache)) for d, t in docs]
    new_sigs = [(d, _simhash_py(t, hcache)) for d, t in new]
    return (
        "WITH rsig(id, s) AS " +
        _values(ref_sigs, "0 AS id, 0 AS s") + ",\n"
        "nsig(id, s) AS " + _values(new_sigs, "0 AS id, 0 AS s") + ",\n"
        "rch(id, chunk, cval) AS " +
        _values(_simhash_chunk_rows(ref_sigs, max_hamming),
                "0 AS id, 0 AS chunk, 0 AS cval") + ",\n"
        "nch(id, chunk, cval) AS " +
        _values(_simhash_chunk_rows(new_sigs, max_hamming),
                "0 AS id, 0 AS chunk, 0 AS cval") + ",\n"
        "store AS (SELECT id, chunk, cval FROM rch QUALIFY count(*) "
        f"OVER (PARTITION BY chunk, cval) <= {max_bucket}),\n"
        "p AS (SELECT DISTINCT n.id AS id, r.id AS ref_id FROM nch n "
        "JOIN store r ON n.chunk = r.chunk AND n.cval = r.cval),\n"
        "h AS (SELECT p.id, p.ref_id, CAST(bit_count(xor(ns.s, rs.s)) "
        "AS BIGINT) AS hamming FROM p JOIN nsig ns ON ns.id = p.id "
        "JOIN rsig rs ON rs.id = p.ref_id "
        f"WHERE bit_count(xor(ns.s, rs.s)) <= {max_hamming}),\n"
        "b AS (SELECT id, ref_id, hamming FROM h QUALIFY row_number() "
        "OVER (PARTITION BY id ORDER BY hamming, ref_id) = 1)\n"
        "SELECT CAST(n.id AS BIGINT) AS id, "
        "b.ref_id IS NOT NULL AS is_dup, "
        "CAST(b.ref_id AS BIGINT) AS best_match, b.hamming "
        "FROM (SELECT DISTINCT id FROM nsig) n LEFT JOIN b USING (id) "
        "ORDER BY id")
