"""URL pipeline operators (pipeline/urls.py): normalization, host /
registered-domain extraction, per-domain caps."""

import pytest
from pyspark.sql import functions as F

from tantivy_spark.pipeline.urls import (
    cap_per_domain, registered_domain, url_host, url_normalize,
)


def _one(spark, col_fn, value):
    return spark.createDataFrame([(value,)], "u STRING") \
        .select(col_fn(F.col("u")).alias("v")).collect()[0]["v"]


@pytest.mark.parametrize("url,host", [
    ("https://Example.COM/path", "example.com"),
    ("http://sub.site.org:8080/x?q=1", "sub.site.org"),
    ("ftp://files.example.net/a", "files.example.net"),
    ("not a url", ""),
])
def test_url_host(spark, url, host):
    assert _one(spark, url_host, url) == host


@pytest.mark.parametrize("url,dom", [
    ("https://a.b.example.com/x", "example.com"),
    ("https://www.bbc.co.uk/news", "bbc.co.uk"),
    ("https://example.com/", "example.com"),
    ("https://localhost/x", "localhost"),
    ("https://shop.foo.com.au/y", "foo.com.au"),
])
def test_registered_domain(spark, url, dom):
    assert _one(spark, registered_domain, url) == dom


@pytest.mark.parametrize("url,norm", [
    ("HTTPS://Example.COM/Path#frag", "https://example.com/Path"),
    ("https://example.com:443/x", "https://example.com/x"),
    ("http://example.com:80/", "http://example.com"),
    ("https://example.com/", "https://example.com"),
    ("https://example.com/a?b=1&a=2", "https://example.com/a?b=1&a=2"),
    ("http://example.com:8080/x", "http://example.com:8080/x"),
])
def test_url_normalize(spark, url, norm):
    assert _one(spark, url_normalize, url) == norm


def test_cap_per_domain(spark):
    rows = [(i, f"https://d{i % 3}.example{i % 3}.com/p/{i}")
            for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id LONG, url STRING")
    out = cap_per_domain(docs, max_docs=4)
    per = {r["domain"]: r["cnt"] for r in
           out.groupBy("domain").agg(F.count("*").alias("cnt")).collect()}
    assert set(per) == {"example0.com", "example1.com", "example2.com"}
    assert all(v == 4 for v in per.values())
    # deterministic across invocations
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in cap_per_domain(docs, max_docs=4)
               .collect())
    assert a == b
    with pytest.raises(ValueError, match="max_docs"):
        cap_per_domain(docs, max_docs=0)
