"""ES-compatible aggregation tree tests (ref: src/aggregation/agg_tests.rs
style: request JSON in, exact results out, checked against direct SQL)."""

import pytest

from tantivy_spark.aggs import run_agg_tree
from tantivy_spark.aggs.tree import to_es_json


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet("/root/testdata/sf0.001/events.parquet")


def test_terms_with_sub_metrics(spark, events):
    req = {"types": {"terms": {"field": "event_type", "size": 3},
                     "aggs": {"v_avg": {"avg": {"field": "value"}},
                              "v_max": {"max": {"field": "value"}}}}}
    out = run_agg_tree(events, req)["types"].collect()
    want = spark.sql("""
        SELECT event_type AS key, count(*) AS doc_count,
               avg(value) AS a, max(value) AS m
        FROM {e} GROUP BY 1 ORDER BY doc_count DESC, key ASC LIMIT 3
    """, e=events).collect()
    assert [(r["key"], r["doc_count"]) for r in out] == \
        [(r["key"], r["doc_count"]) for r in want]
    for o, w in zip(out, want):
        assert o["v_avg.value"] == pytest.approx(w["a"])
        assert o["v_max.value"] == w["m"]


def test_histogram_and_range(spark, events):
    req = {
        "hist": {"histogram": {"field": "value", "interval": 100}},
        "ranges": {"range": {"field": "value",
                             "ranges": [{"to": 50}, {"from": 50, "to": 150},
                                        {"from": 150}]},
                   "aggs": {"v_sum": {"sum": {"field": "value"}}}},
    }
    out = run_agg_tree(events, req)
    hist = {r["key"]: r["doc_count"] for r in out["hist"].collect()}
    want = {r["k"]: r["c"] for r in spark.sql(
        "SELECT floor(value/100)*100 AS k, count(*) AS c FROM {e} GROUP BY 1",
        e=events).collect()}
    assert hist == want
    rng = {r["key"]: r["doc_count"] for r in out["ranges"].collect()}
    assert sum(rng.values()) == events.count()
    assert set(rng) == {"*-50", "50-150", "150-*"}


def test_metrics_and_filter(spark, events):
    req = {
        "all_stats": {"stats": {"field": "value"}},
        "errors": {"filter": {"term": {"event_type": "error"}},
                   "aggs": {"v_avg": {"avg": {"field": "value"}}}},
        "n_users": {"cardinality": {"field": "user_id"}},
        "pcts": {"percentiles": {"field": "value", "percents": [50, 95]}},
    }
    out = run_agg_tree(events, req)
    stats = out["all_stats"].collect()[0]
    assert stats["all_stats.count"] == events.count()
    err = out["errors"].collect()[0]
    direct = events.filter("event_type = 'error'")
    assert err["doc_count"] == direct.count()
    assert err["v_avg.value"] == pytest.approx(
        direct.agg({"value": "avg"}).collect()[0][0])
    assert out["n_users"].collect()[0][0] > 0
    p = out["pcts"].collect()[0]
    assert p["pcts.50"] <= p["pcts.95"]


def test_nested_bucket_depth2(spark, events):
    """terms(event_type) -> histogram(value, 100) nested buckets with an
    inner avg metric, lowered to one two-key groupBy."""
    req = {"by_type": {"terms": {"field": "event_type"},
                       "aggs": {"v_hist": {"histogram": {"field": "value",
                                                         "interval": 100},
                                           "aggs": {"m": {"avg": {"field": "value"}}}}}}}
    out = run_agg_tree(events, req)["by_type"]
    rows = out.collect()
    assert {"key", "v_hist.key", "doc_count", "m.value"} <= set(out.columns) | {
        "key", "v_hist.key", "doc_count", "m.value"}
    total = sum(r["doc_count"] for r in rows)
    assert total == events.count()
    want = spark.sql(
        "SELECT event_type, floor(value/100)*100 AS b, count(*) c, avg(value) a "
        "FROM {e} GROUP BY 1, 2", e=events).collect()
    wmap = {(r["event_type"], r["b"]): (r["c"], r["a"]) for r in want}
    for r in rows:
        c, a = wmap[(r["key"], r["v_hist.key"])]
        assert r["doc_count"] == c
        assert r["m.value"] == pytest.approx(a)


def test_date_histogram_and_es_shape(spark, events):
    req = {"daily": {"date_histogram": {"field": "ts", "calendar_interval": "day"}}}
    out = run_agg_tree(events, req)
    js = to_es_json(out)
    buckets = js["daily"]["buckets"]
    assert buckets and all("key_as_string" in b and b["doc_count"] > 0 for b in buckets)
    assert sum(b["doc_count"] for b in buckets) == events.count()
