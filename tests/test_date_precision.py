"""Date fast-field storage precision (ref: DateOptions::set_precision,
src/schema/date_time_options.rs:92-107; exercised by fastfield/mod.rs
test_datefastfield / test_gcd_date): the fast-field column stores
timestamps TRUNCATED to the configured precision, and every range /
aggregation read observes the truncated value.  The reference's
indexed (term-dictionary) precision is always seconds
(DATE_TIME_PRECISION_INDEXED); this design replaces that dictionary
with fast-field range scans, so only the storage precision appears."""

import datetime as dt

import pytest

from tantivy_spark.index.build import IndexConfig, build_index
from tantivy_spark.index.reader import IndexReader
from tantivy_spark.query.ast import FastFieldRangeQuery
from tantivy_spark.query.exact import ExactSearcher

T0 = dt.datetime(2021, 1, 1, 12, 0, 0)


def _build(spark, out, precision=None):
    rows = [("a", 0, T0 + dt.timedelta(microseconds=700_000)),   # .7s
            ("b", 1, T0 + dt.timedelta(microseconds=123_456)),   # .123456s
            ("c", 2, T0 + dt.timedelta(seconds=2))]
    df = spark.createDataFrame(rows, "key STRING, i LONG, ts TIMESTAMP") \
        .withColumn("text", df_text())
    cfg = IndexConfig(key_col="key", text_col="text", n_segments=1,
                      segment_expr="0", fast_field_cols=["ts"],
                      date_precisions={"ts": precision} if precision
                      else None)
    build_index(spark, df, out, cfg, resume=False)
    return ExactSearcher(IndexReader(spark, out))


def df_text():
    from pyspark.sql import functions as F
    return F.lit("doc text")


def _stored(searcher):
    return {r["key"]: r["ts"]
            for r in searcher.reader.docmap.select("key", "ts").collect()}


def test_seconds_precision_truncates_storage(spark, tmp_path):
    """test_gcd_date's seconds case: sub-second components vanish from
    the stored fast-field value."""
    s = _build(spark, str(tmp_path / "sec"), "seconds")
    got = _stored(s)
    assert got["a"] == T0
    assert got["b"] == T0
    assert got["c"] == T0 + dt.timedelta(seconds=2)


def test_millis_precision_keeps_millis(spark, tmp_path):
    s = _build(spark, str(tmp_path / "ms"), "milliseconds")
    got = _stored(s)
    assert got["a"] == T0 + dt.timedelta(milliseconds=700)
    assert got["b"] == T0 + dt.timedelta(milliseconds=123)


def test_default_keeps_full_microseconds(spark, tmp_path):
    """Without a configured precision the stored value is the source
    value (Spark microseconds) — test_datefastfield's identity reads:
    what was written comes back exactly."""
    s = _build(spark, str(tmp_path / "full"))
    got = _stored(s)
    assert got["b"] == T0 + dt.timedelta(microseconds=123_456)


def test_range_reads_observe_truncation(spark, tmp_path):
    """A range whose bound falls inside a truncated-away sub-second
    window sees the TRUNCATED values, exactly like the reference's
    columnar reads over a seconds-precision column."""
    s = _build(spark, str(tmp_path / "rsec"), "seconds")
    # doc "a" (.7s) stored at 12:00:00 -> a range starting .5s excludes it
    lo = T0 + dt.timedelta(microseconds=500_000)
    hi = T0 + dt.timedelta(seconds=10)
    assert s.count(FastFieldRangeQuery("ts", lo, hi)) == 1   # only "c"
    full = _build(spark, str(tmp_path / "rfull"))
    assert full.count(FastFieldRangeQuery("ts", lo, hi)) == 2  # a + c


def test_nanoseconds_clamps_to_micros(spark, tmp_path):
    """"nanoseconds" is accepted (the reference's finest precision) but
    stores microseconds — Spark's TimestampType ceiling, documented on
    IndexConfig.date_precisions."""
    s = _build(spark, str(tmp_path / "ns"), "nanoseconds")
    assert _stored(s)["b"] == T0 + dt.timedelta(microseconds=123_456)


def test_unknown_precision_raises(spark, tmp_path):
    with pytest.raises(ValueError, match="unknown date precision"):
        _build(spark, str(tmp_path / "bad"), "hours")
