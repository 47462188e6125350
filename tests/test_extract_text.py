"""HTML text extraction (corpus.extract_text): JVM regexp-chain
extractor whose north-rule invariant is BYTE-IDENTITY per url when
re-extracting the wrapped corpus."""

import pytest
from pyspark.sql import functions as F

from tantivy_spark.corpus import extract_text, pages_from_documents


def _x(spark, html: str) -> str:
    return spark.createDataFrame([(html,)], "h STRING") \
        .select(extract_text(F.col("h")).alias("t")).collect()[0]["t"]


@pytest.mark.parametrize("html,text", [
    ("<html><body>hello world</body></html>", "hello world"),
    ("<p>one</p><p>two</p>", "one\ntwo"),
    ("<div>a<br>b</div>", "a\nb"),
    ("x<script>var a = '<p>no</p>';</script>y", "x y"),
    ("x<style>p { color: red }</style>y", "x y"),
    ("keep <!-- drop this <b>too</b> --> going", "keep going"),
    ("a &amp; b &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;end",
     "a & b <tag> \"q\" 's' end"),
    ("<ul><li>first</li><li>second</li></ul>", "first\nsecond"),
    ("<h1>Title</h1>Body", "Title\nBody"),
    ("", ""),
])
def test_extraction_vectors(spark, html, text):
    assert _x(spark, html) == text


def test_byte_identity_over_corpus(spark):
    """The north-rule invariant: extracting the html column reproduces
    the text column BYTE-IDENTICALLY for every url."""
    pages = pages_from_documents(spark, "/root/testdata/sf0.001")
    n_bad = pages.filter(
        extract_text(F.col("html")) != F.col("text")).count()
    assert n_bad == 0


def test_binary_and_string_inputs_agree(spark):
    df = spark.createDataFrame([("<b>hi</b> there",)], "h STRING") \
        .withColumn("b", F.encode(F.col("h"), "UTF-8"))
    row = df.select(extract_text(F.col("h")).alias("a"),
                    extract_text(F.col("b")).alias("b")).collect()[0]
    assert row["a"] == row["b"] == "hi there"
