import pandas as pd
import pytest
from pyspark.sql import functions as F

from tantivy_spark.analyzer import (
    duckdb_tokens_sql,
    tokenize_series,
    tokenize_with_positions_series,
    tokens_col,
    tokens_with_positions_col,
)

# goldens ported from /root/reference/src/tokenizer/simple_tokenizer.rs:72-79
# (token text + ordinal positions; lowercase applied by the default chain)
GOLDENS = [
    ("Hello, happy tax payer!", ["hello", "happy", "tax", "payer"], [0, 1, 2, 3]),
    ("", [], []),
    ("   \t\n ", [], []),
    ("a_b", ["a", "b"], [0, 1]),  # underscore is NOT alphanumeric
    ("abc123 456def", ["abc123", "456def"], [0, 1]),
    # 39/40/41-byte boundary: RemoveLongFilter keeps < 40 bytes
    ("x" * 39 + " " + "y" * 40 + " " + "z" * 41 + " tail",
     ["x" * 39, "tail"], [0, 3]),
    # unicode letters; punctuation runs
    ("naïve -- café!!", ["naïve", "café"], [0, 1]),
    ("Straße große", ["straße", "große"], [0, 1]),
]


@pytest.mark.parametrize("text,tokens,positions", GOLDENS)
def test_pandas_analyzer_goldens(text, tokens, positions):
    got = tokenize_with_positions_series(pd.Series([text]))[0]
    assert [t for t, _ in got] == tokens
    assert [p for _, p in got] == positions


def test_three_implementations_agree_on_corpus(spark, tiny_pages):
    """JVM expression form == pandas form == DuckDB SQL form on real data."""
    import duckdb

    pdf = tiny_pages.select("url", "text").orderBy("url").toPandas()

    # JVM
    jvm = (
        tiny_pages.select("url", tokens_col(F.col("text")).alias("toks"))
        .orderBy("url").toPandas()
    )
    # pandas
    pd_toks = tokenize_series(pdf["text"])
    # duckdb
    con = duckdb.connect()
    con.register("t", pdf)
    dk = con.sql(
        f"SELECT url, {duckdb_tokens_sql('text')} AS toks FROM t ORDER BY url"
    ).df()

    for i in range(len(pdf)):
        a, b, c = list(jvm["toks"][i]), list(pd_toks.iloc[i]), list(dk["toks"][i])
        assert a == b == c, f"row {i}: {a[:5]} {b[:5]} {c[:5]}"


def test_positions_skip_long_tokens(spark):
    df = spark.createDataFrame([("aa " + "b" * 45 + " cc",)], ["text"])
    rows = df.select(tokens_with_positions_col(F.col("text")).alias("tp")).collect()
    tp = [(s["token"], s["pos"]) for s in rows[0]["tp"]]
    assert tp == [("aa", 0), ("cc", 2)]


def test_fieldnorm_col_counts_survivors(spark):
    from tantivy_spark.analyzer import fieldnorm_col

    df = spark.createDataFrame([("aa " + "b" * 45 + " cc dd",), ("", ), (None,)], ["text"])
    got = [r[0] for r in df.select(fieldnorm_col(F.col("text"))).collect()]
    assert got == [3, 0, 0]
