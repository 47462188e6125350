import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_TINY = "/root/testdata/sf0.001"
SF_SMALL = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from tantivy_spark.session import get_spark

    spark = get_spark("tantivy_spark_tests", master="local[8]", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def tiny_pages(spark):
    from tantivy_spark.corpus import pages_from_documents

    return pages_from_documents(spark, SF_TINY)


@pytest.fixture(scope="session")
def tiny_index(spark, tiny_pages, tmp_path_factory):
    """Index over sf0.001 documents-as-pages, 4 deterministic segments.

    segment = doc_id % 4, parseable from the url tail so the golden engine
    can reproduce the exact same DocAddress assignment.
    """
    from tantivy_spark.index.build import IndexConfig, build_index
    from tantivy_spark.index.reader import IndexReader

    out = str(tmp_path_factory.mktemp("idx") / "tiny")
    cfg = IndexConfig(
        key_col="url", text_col="text", n_segments=4,
        segment_expr="pmod(cast(substring(url, -10, 10) as bigint), 4)",
    )
    build_index(spark, tiny_pages, out, cfg)
    return IndexReader(spark, out)


@pytest.fixture(scope="session")
def tiny_golden(spark, tiny_pages):
    from tantivy_spark.query.golden import GoldenIndex

    rows = tiny_pages.select("url", "text").collect()
    keys = [r["url"] for r in rows]
    texts = [r["text"] or "" for r in rows]
    return GoldenIndex(keys, texts, segment_of=lambda i, k: int(k[-10:]) % 4)
