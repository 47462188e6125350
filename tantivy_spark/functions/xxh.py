"""Pure-Python replica of Spark's ``xxhash64`` expression.

Spark's ``F.xxhash64(cols...)`` evaluates the public xxHash64 algorithm
(Yann Collet, xxhash.com — spec at
github.com/Cyan4973/xxHash/blob/dev/doc/xxhash_spec.md) with seed 42,
CHAINED across columns: the running hash of column *i* becomes the seed
for column *i + 1*.  Per-type dispatch mirrors
``catalyst/expressions/hash.scala`` + ``XXH64.java``:

- long          -> ``hashLong``  (the 8-byte single-round shortcut)
- int/short/byte-> ``hashInt``   (the 4-byte shortcut, value sign-extended
                                  then masked to 32 bits)
- string/binary -> ``hashUnsafeBytes`` = spec xxh64 over the UTF-8 bytes
- null          -> skipped (hash unchanged)

WHY THIS EXISTS: the DuckDB correctness oracles for the MinHash/LSH,
Jaccard-verify and SimHash dedup operators need the same 64-bit hashes
the JVM computes, and DuckDB has no xxhash64.  This module recomputes
them INDEPENDENTLY (from the published spec, not by calling Spark) so
the oracle builder can inject them as literal tables — an
engine-independent check of the whole JVM hash pipeline.  Parity with
Spark is pinned by tests/test_xxh.py across types, lengths and chains.
"""

from __future__ import annotations

_M = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5

SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * P2) & _M
    h ^= h >> 29
    h = (h * P3) & _M
    h ^= h >> 32
    return h


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * P2) & _M
    return (_rotl(acc, 31) * P1) & _M


def xxh64_long(value: int, seed: int = SPARK_SEED) -> int:
    """xxh64 of one 8-byte long — Spark XXH64.hashLong."""
    value &= _M
    h = (seed + P5 + 8) & _M
    h ^= _round(0, value)
    h = (_rotl(h, 27) * P1 + P4) & _M
    return _fmix(h)


def xxh64_int(value: int, seed: int = SPARK_SEED) -> int:
    """xxh64 of one 4-byte int — Spark XXH64.hashInt (sign-extend then
    mask: Java widens the int to long before ``& 0xFFFFFFFFL``)."""
    v = value & 0xFFFFFFFF
    h = (seed + P5 + 4) & _M
    h ^= (v * P1) & _M
    h = (_rotl(h, 23) * P2 + P3) & _M
    return _fmix(h)


def xxh64_bytes(data: bytes, seed: int = SPARK_SEED) -> int:
    """Spec xxh64 over a byte string — Spark XXH64.hashUnsafeBytes."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & _M
        v2 = (seed + P2) & _M
        v3 = seed & _M
        v4 = (seed - P1) & _M
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i:i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8:i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16:i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24:i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h = ((h ^ _round(0, v)) * P1 + P4) & _M
    else:
        h = (seed + P5) & _M
    h = (h + n) & _M
    while i <= n - 8:
        h ^= _round(0, int.from_bytes(data[i:i + 8], "little"))
        h = (_rotl(h, 27) * P1 + P4) & _M
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i:i + 4], "little") * P1) & _M
        h = (_rotl(h, 23) * P2 + P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * P5) & _M
        h = (_rotl(h, 11) * P1) & _M
        i += 1
    return _fmix(h)


def _signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


# ---------------------------------------------------------------- numpy
# Vectorized twins of hashLong/hashInt for the oracle builder's hot loop
# (32 permutation hashes x every shingle).  uint64 arithmetic wraps mod
# 2^64 in numpy, matching the scalar masking; every scalar is wrapped in
# np.uint64 to dodge numpy 1.x value-based promotion to float64.

def _np_rotl(x, r: int):
    import numpy as np
    return (x << np.uint64(r)) | (x >> np.uint64(64 - r))


def _np_fmix(h):
    import numpy as np
    h = h ^ (h >> np.uint64(33))
    h = h * np.uint64(P2)
    h = h ^ (h >> np.uint64(29))
    h = h * np.uint64(P3)
    h = h ^ (h >> np.uint64(32))
    return h


def xxh64_long_np(values, seed: int = SPARK_SEED):
    """Vectorized ``xxh64_long`` — ``values`` is a uint64 ndarray (or
    int64 reinterpreted), ``seed`` a scalar; returns uint64 ndarray."""
    import numpy as np
    v = values.astype(np.uint64, copy=False)
    h = np.uint64((seed + P5 + 8) & _M)
    k = _np_rotl(v * np.uint64(P2), 31) * np.uint64(P1)
    h = h ^ k
    h = _np_rotl(h, 27) * np.uint64(P1) + np.uint64(P4)
    return _np_fmix(h)


def xxh64_int_np(value: int, seeds):
    """Vectorized ``xxh64_int`` with a FIXED int value and an ndarray of
    seeds (the chained-column case ``xxhash64(longcol, lit(i))``)."""
    import numpy as np
    h = seeds + np.uint64((P5 + 4) & _M)
    h = h ^ np.uint64(((value & 0xFFFFFFFF) * P1) & _M)
    h = _np_rotl(h, 23) * np.uint64(P2) + np.uint64(P3)
    return _np_fmix(h)


def spark_xxhash64(*values) -> int:
    """Replica of ``F.xxhash64(*cols)`` for already-evaluated Python
    values.  Accepts int (→ long path), str (→ utf-8 bytes), bytes, and
    ``("i32", v)`` tuples to force the 4-byte int path (Spark literals
    of Python ints are IntegerType).  None values are skipped, matching
    Spark's null semantics.  Returns the SIGNED 64-bit value Spark
    returns."""
    h = SPARK_SEED
    for v in values:
        if v is None:
            continue
        if isinstance(v, tuple) and v[0] == "i32":
            h = xxh64_int(v[1], h)
        elif isinstance(v, bool):
            h = xxh64_int(1 if v else 0, h)
        elif isinstance(v, int):
            h = xxh64_long(v, h)
        elif isinstance(v, str):
            h = xxh64_bytes(v.encode("utf-8"), h)
        elif isinstance(v, (bytes, bytearray)):
            h = xxh64_bytes(bytes(v), h)
        else:
            raise TypeError(f"unsupported xxhash64 operand type: {type(v)}")
    return _signed(h)
