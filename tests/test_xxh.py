"""Parity pins for the pure-Python xxHash64 replica (functions/xxh.py)
against Spark's JVM ``xxhash64`` expression — the independence anchor
for the dedup_oracle literal tables: Spark computes the hashes one way
(XXH64.java), the oracle recomputes them from the published spec, and
DuckDB compares the downstream relational results.
"""

import pytest
from pyspark.sql import functions as F

from tantivy_spark.functions.xxh import (
    spark_xxhash64, xxh64_int_np, xxh64_long_np)

pytestmark = pytest.mark.usefixtures("spark")

CASES = [
    ("", 0, 0),
    ("a", 1, 1),
    ("hello world", -5, -7),
    ("señor café — ünïcode", 2**62, 2**31 - 1),
    ("exactly8", 123456789012345, -2**31),
    ("x" * 31, -2**63, 63),          # just under the 32-byte stripe
    ("x" * 32, 2**63 - 1, -1),       # exactly one stripe
    ("x" * 33, 42, 0),               # stripe + tail byte
    ("y" * 100, -42, 5),             # multiple stripes + 4-byte + tail
]


def test_spark_parity_all_types_and_chains(spark):
    df = spark.createDataFrame(CASES, "s string, l long, i int")
    got = df.select(
        F.xxhash64("s").alias("hs"), F.xxhash64("l").alias("hl"),
        F.xxhash64("i").alias("hi"),
        F.xxhash64("s", "l", "i").alias("hc"),
        F.xxhash64("l", F.lit(7)).alias("hli"),
        F.xxhash64("s", "s", "s").alias("hsss"),
    ).collect()
    for (s, l, i), r in zip(CASES, got):
        assert spark_xxhash64(s) == r.hs
        assert spark_xxhash64(l) == r.hl
        assert spark_xxhash64(("i32", i)) == r.hi
        assert spark_xxhash64(s, l, ("i32", i)) == r.hc
        assert spark_xxhash64(l, ("i32", 7)) == r.hli
        assert spark_xxhash64(s, s, s) == r.hsss


def test_null_skipped(spark):
    df = spark.createDataFrame([("abc",)], "s string")
    got = df.select(F.xxhash64("s", F.lit(None).cast("long")).alias("h"),
                    F.xxhash64(F.lit(None).cast("string"), "s").alias("h2")
                    ).collect()[0]
    assert spark_xxhash64("abc", None) == got.h
    assert spark_xxhash64(None, "abc") == got.h2


def test_numpy_vectorized_matches_scalar():
    import numpy as np
    vals = np.array([0, 1, -1, 2**62, -2**63, 1234567],
                    dtype=np.int64).view(np.uint64)
    base = xxh64_long_np(vals, 42)
    for i in (0, 3, 31):
        vec = xxh64_int_np(i, base).view(np.int64)
        for j, v in enumerate(vals.view(np.int64)):
            assert int(vec[j]) == spark_xxhash64(int(v), ("i32", i))


def test_known_spec_vector():
    # xxh64("", seed=0) is the published spec value 0xEF46DB3751D8E999
    from tantivy_spark.functions.xxh import _signed, xxh64_bytes
    assert xxh64_bytes(b"", 0) == 0xEF46DB3751D8E999
    # and seed 42 empty-string via the public entry point
    assert spark_xxhash64("") == _signed(xxh64_bytes(b"", 42))
