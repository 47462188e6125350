"""Incremental (streaming) index ingestion tests: micro-batches append
segments; results equal a batch build over the same docs; batch
re-delivery is idempotent; merge compacts the incremental index."""

import os

import pytest
from pyspark.sql import functions as F

from tantivy_spark.corpus import synthetic_pages
from tantivy_spark.index.build import IndexConfig, build_index
from tantivy_spark.index.reader import IndexReader
from tantivy_spark.query import BooleanQuery, Occur, TermQuery
from tantivy_spark.query.exact import ExactSearcher
from tantivy_spark.streaming import IncrementalIndexer

QUERY = BooleanQuery([(Occur.SHOULD, TermQuery("the")),
                      (Occur.SHOULD, TermQuery("of"))])


@pytest.fixture(scope="module")
def corpus(spark):
    return synthetic_pages(spark, 240, seed=11).select("url", "text")


def test_incremental_equals_batch(spark, corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sidx") / "inc")
    cfg = IndexConfig(key_col="url", text_col="text")
    ix = IncrementalIndexer(spark, out, cfg, segments_per_batch=3)
    b0 = corpus.filter(F.substring("url", -1, 1).isin(*"01234"))
    b1 = corpus.filter(~F.substring("url", -1, 1).isin(*"01234"))
    ix.process_batch(b0, 0)
    ix.process_batch(b1, 1)

    reader = IndexReader(spark, out)
    assert reader.num_docs == corpus.count()

    batch_out = str(tmp_path_factory.mktemp("bidx") / "batch")
    build_index(spark, corpus, batch_out,
                IndexConfig(key_col="url", text_col="text", n_segments=4))
    batch_reader = IndexReader(spark, batch_out)

    # same global stats and same ranked keys (addresses differ by design)
    assert reader.total_num_tokens == batch_reader.total_num_tokens
    got = ExactSearcher(reader).search(QUERY, k=10).collect()
    want = ExactSearcher(batch_reader).search(QUERY, k=10).collect()
    assert [r["key"] for r in got] == [r["key"] for r in want]
    for g, w in zip(got, want):
        assert g["score"] == pytest.approx(w["score"], rel=1e-12)


def test_batch_redelivery_is_idempotent(spark, corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sidx2") / "inc")
    ix = IncrementalIndexer(spark, out, IndexConfig(key_col="url", text_col="text"),
                            segments_per_batch=2)
    ix.process_batch(corpus, 0)
    n1 = IndexReader(spark, out).num_docs
    ix.process_batch(corpus, 0)  # redelivery
    assert IndexReader(spark, out).num_docs == n1


def test_streaming_source_end_to_end(spark, corpus, tmp_path_factory):
    """Real Structured Streaming flow: file source -> foreachBatch sink."""
    src = str(tmp_path_factory.mktemp("src"))
    out = str(tmp_path_factory.mktemp("sidx3") / "inc")
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    corpus.write.mode("overwrite").parquet(src)

    ix = IncrementalIndexer(spark, out, IndexConfig(key_col="url", text_col="text"),
                            segments_per_batch=2)
    stream = (spark.readStream.schema("url string, text string").parquet(src)
              .writeStream.foreachBatch(ix.process_batch)
              .option("checkpointLocation", ckpt)
              .trigger(availableNow=True).start())
    stream.awaitTermination(120)
    reader = IndexReader(spark, out)
    assert reader.num_docs == corpus.count()
    hits = ExactSearcher(reader).search(TermQuery("the"), k=5).collect()
    assert len(hits) == 5


def test_merge_compacts_incremental(spark, corpus, tmp_path_factory):
    from tantivy_spark.index.merge import merge_segments

    out = str(tmp_path_factory.mktemp("sidx4") / "inc")
    ix = IncrementalIndexer(spark, out, IndexConfig(key_col="url", text_col="text"),
                            segments_per_batch=2)
    half = corpus.limit(120)
    rest = corpus.subtract(half)
    ix.process_batch(half, 0)
    ix.process_batch(rest, 1)
    merged = str(tmp_path_factory.mktemp("sidx4m") / "merged")
    merge_segments(spark, out, merged)
    r = IndexReader(spark, merged)
    assert r.num_docs == corpus.count()
    assert ExactSearcher(r).count(TermQuery("the")) == \
        ExactSearcher(IndexReader(spark, out)).count(TermQuery("the"))
