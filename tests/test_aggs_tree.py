"""ES-compatible aggregation tree tests (ref: src/aggregation/agg_tests.rs
style: request JSON in, exact results out, checked against direct SQL)."""

import pytest
from pyspark.sql import functions as F

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
        "hist": {"histogram": {"field": "value", "interval": 100,
                       "min_doc_count": 1}},  # default 0 gap-fills
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
                                                         "interval": 100,
                                                         "min_doc_count": 1},
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


def test_nested_bucket_depth3(spark, events):
    """terms -> date_histogram(day) -> histogram(value) with a leaf avg —
    arbitrary-depth nesting (ref: aggregation/mod.rs:38-54, agg_tests.rs
    exercises 3+ levels), still ONE deepest groupBy shuffle."""
    req = {"by_type": {"terms": {"field": "event_type"},
                       "aggs": {"daily": {
                           "date_histogram": {"field": "ts",
                                              "calendar_interval": "day"},
                           "aggs": {"vh": {
                               "histogram": {"field": "value", "interval": 100,
                                             "min_doc_count": 1},
                               "aggs": {"m": {"avg": {"field": "value"}}}}}}}}}
    out = run_agg_tree(events, req)["by_type"]
    rows = out.collect()
    assert {"key", "daily.key_as_string", "vh.key", "doc_count",
            "m.value"} <= set(out.columns)
    assert sum(r["doc_count"] for r in rows) == events.count()
    want = spark.sql(
        "SELECT event_type, date_format(ts, 'yyyy-MM-dd') AS d, "
        "floor(value/100)*100 AS b, count(*) c, avg(value) a "
        "FROM {e} GROUP BY 1, 2, 3", e=events).collect()
    wmap = {(r["event_type"], r["d"], r["b"]): (r["c"], r["a"]) for r in want}
    assert len(rows) == len(wmap)
    for r in rows:
        c, a = wmap[(r["key"], r["daily.key_as_string"], r["vh.key"])]
        assert r["doc_count"] == c
        assert r["m.value"] == pytest.approx(a)


def test_terms_size_is_per_parent(spark, events):
    """A nested terms level with size keeps top-N keys PER PARENT bucket."""
    req = {"by_type": {"terms": {"field": "event_type"},
                       "aggs": {"top_users": {
                           "terms": {"field": "user_id", "size": 2}}}}}
    rows = run_agg_tree(events, req)["by_type"].collect()
    per_parent: dict = {}
    for r in rows:
        per_parent.setdefault(r["key"], []).append(r)
    for ptype, bucket_rows in per_parent.items():
        assert len(bucket_rows) <= 2
        # the kept users are that parent's top-2 by count
        want = spark.sql(
            "SELECT user_id, count(*) c FROM {e} WHERE event_type = '%s' "
            "GROUP BY 1 ORDER BY c DESC, user_id ASC LIMIT 2" % ptype,
            e=events).collect()
        assert sorted(r["top_users.key"] for r in bucket_rows) == \
            sorted(w["user_id"] for w in want)


def test_histogram_gap_filling(spark, events):
    """min_doc_count=0 + extended_bounds: every interval in the domain is
    present, empty ones with doc_count 0 (histogram.rs:63-129)."""
    req = {"hist": {"histogram": {"field": "value", "interval": 50,
                                  "min_doc_count": 0,
                                  "extended_bounds": {"min": -200, "max": 700}}}}
    rows = run_agg_tree(events, req)["hist"].collect()
    keys = [r["key"] for r in rows]
    assert keys == sorted(keys)
    # gap-free arithmetic progression over the full extended domain
    assert keys[0] <= -200 and keys[-1] >= 650
    assert keys == [keys[0] + 50 * i for i in range(len(keys))]
    filled = [r for r in rows if r["doc_count"] == 0]
    assert filled  # extended bounds forced empty buckets
    nonzero = {r["key"]: r["doc_count"] for r in rows if r["doc_count"] > 0}
    want = {r["k"]: r["c"] for r in spark.sql(
        "SELECT floor(value/50)*50 AS k, count(*) AS c FROM {e} GROUP BY 1",
        e=events).collect()}
    assert nonzero == want


def test_histogram_hard_bounds(spark, events):
    req = {"hist": {"histogram": {"field": "value", "interval": 50,
                                  "hard_bounds": {"min": 0, "max": 200}}}}
    rows = run_agg_tree(events, req)["hist"].collect()
    assert all(0 <= r["key"] <= 200 for r in rows)


def test_composite_tree_node(spark, events):
    """composite as a request-tree node: multi-source buckets, size and
    after-key pagination (bucket/composite/mod.rs)."""
    req = {"comp": {"composite": {
        "size": 5,
        "sources": [{"t": {"terms": {"field": "event_type"}}},
                    {"u": {"terms": {"field": "user_id"}}}],
    }, "aggs": {"v": {"sum": {"field": "value"}}}}}
    page1 = run_agg_tree(events, req)["comp"].collect()
    assert len(page1) == 5
    assert [(r["t"], r["u"]) for r in page1] == \
        sorted((r["t"], r["u"]) for r in page1)
    last = page1[-1]
    req2 = {"comp": {"composite": {
        "size": 5, "after": {"t": last["t"], "u": last["u"]},
        "sources": [{"t": {"terms": {"field": "event_type"}}},
                    {"u": {"terms": {"field": "user_id"}}}],
    }}}
    page2 = run_agg_tree(events, req2)["comp"].collect()
    assert all((r["t"], r["u"]) > (last["t"], last["u"]) for r in page2)
    assert all(r["v.value"] is not None for r in page1)


def test_top_hits_tree_node(spark, events):
    """top_hits under a terms bucket: top-2 events per type by value desc
    (metric/top_hits.rs)."""
    req = {"by_type": {"terms": {"field": "event_type"},
                       "aggs": {"best": {"top_hits": {
                           "size": 2,
                           "sort": [{"value": {"order": "desc"}}],
                           "docvalue_fields": ["event_id", "value"]}}}}}
    rows = run_agg_tree(events, req)["by_type"].collect()
    per_parent: dict = {}
    for r in rows:
        per_parent.setdefault(r["key"], []).append(r)
    for ptype, hits in per_parent.items():
        assert [h["best.rank"] for h in hits] == list(range(1, len(hits) + 1))
        want = spark.sql(
            "SELECT event_id, value FROM {e} WHERE event_type = '%s' "
            "ORDER BY value DESC, event_id ASC LIMIT 2" % ptype,
            e=events).collect()
        assert [h["event_id"] for h in hits] == [w["event_id"] for w in want]


def test_top_hits_misplacement_raises(spark, events):
    """top_hits at a non-leaf level, or sharing its level with metric
    sub-aggs, is rejected loudly instead of silently dropped."""
    import pytest

    from tantivy_spark.aggs import run_agg_tree

    non_leaf = {"by_type": {"terms": {"field": "event_type"},
                            "aggs": {
                                "best": {"top_hits": {"size": 1}},
                                "by_user": {"terms": {"field": "user_id"},
                                            "aggs": {"av": {"avg": {
                                                "field": "value"}}}}}}}
    with pytest.raises(ValueError, match="non-leaf"):
        run_agg_tree(events, non_leaf)
    with_sibling = {"by_type": {"terms": {"field": "event_type"},
                                "aggs": {
                                    "best": {"top_hits": {"size": 1}},
                                    "av": {"avg": {"field": "value"}}}}}
    with pytest.raises(ValueError, match="share its level"):
        run_agg_tree(events, with_sibling)


def test_date_histogram_fixed_interval(spark, events):
    req = {"h12": {"date_histogram": {"field": "ts", "fixed_interval": "12h"}}}
    rows = run_agg_tree(events, req)["h12"].collect()
    assert sum(r["doc_count"] for r in rows) == events.count()
    want = spark.sql(
        "SELECT from_unixtime(floor(unix_timestamp(ts)/43200)*43200, "
        "'yyyy-MM-dd HH:mm:ss') AS k, count(*) c FROM {e} GROUP BY 1",
        e=events).collect()
    assert {r["key_as_string"]: r["doc_count"] for r in rows} == \
        {w["k"]: w["c"] for w in want}


def test_intermediate_level_metrics(spark, events):
    """A metric attached to a non-leaf level joins on as a repeated column."""
    req = {"by_type": {"terms": {"field": "event_type"},
                       "aggs": {"tavg": {"avg": {"field": "value"}},
                                "daily": {"date_histogram": {
                                    "field": "ts", "calendar_interval": "day"}}}}}
    rows = run_agg_tree(events, req)["by_type"].collect()
    assert "tavg.value" in rows[0].asDict()
    want = {r["event_type"]: r["a"] for r in spark.sql(
        "SELECT event_type, avg(value) a FROM {e} GROUP BY 1", e=events).collect()}
    for r in rows:
        assert r["tavg.value"] == pytest.approx(want[r["key"]])


def test_date_histogram_and_es_shape(spark, events):
    req = {"daily": {"date_histogram": {"field": "ts", "calendar_interval": "day"}}}
    out = run_agg_tree(events, req)
    js = to_es_json(out)
    buckets = js["daily"]["buckets"]
    assert buckets and all("key_as_string" in b and b["doc_count"] > 0 for b in buckets)
    assert sum(b["doc_count"] for b in buckets) == events.count()


def test_terms_missing_parameter(spark):
    """ES terms `missing`: absent values bucket under the substitute."""
    from tantivy_spark.aggs import run_agg_tree

    df = spark.createDataFrame(
        [("a", 1.0), (None, 2.0), ("b", 3.0), (None, 4.0)],
        "lang STRING, v DOUBLE")
    req = {"t": {"terms": {"field": "lang", "missing": "unknown"},
                 "aggs": {"av": {"avg": {"field": "v"}}}}}
    out = {(r["key"], r["doc_count"], r["av.value"])
           for r in run_agg_tree(df, req)["t"].collect()}
    assert out == {("a", 1, 1.0), ("b", 1, 3.0), ("unknown", 2, 3.0)}


class TestAggregationLimits:
    """Bucket budget guard (ref: src/aggregation/agg_limits.rs
    AggregationLimitsGuard; DEFAULT_BUCKET_LIMIT, mod.rs:152-155)."""

    def test_gapfill_histogram_over_budget_raises(self, spark, events):
        """A fine-interval gap-filled histogram over a wide range must
        fail loudly instead of exploding the bucket domain."""
        from py4j.protocol import Py4JJavaError
        from pyspark.errors import SparkRuntimeException

        df = spark.createDataFrame([(0.0,), (1e9,)], "value DOUBLE")
        req = {"h": {"histogram": {"field": "value", "interval": 0.001,
                                   "min_doc_count": 0}}}
        out = run_agg_tree(df, req, max_buckets=1000)["h"]
        with pytest.raises((Py4JJavaError, SparkRuntimeException)) as ei:
            out.collect()
        assert "bucket budget exceeded" in str(ei.value)

    def test_static_size_over_budget_raises(self, spark, events):
        from tantivy_spark.aggs import AggregationLimitsError

        req = {"t": {"terms": {"field": "event_type", "size": 10_000_000}}}
        with pytest.raises(AggregationLimitsError):
            run_agg_tree(events, req)
        req = {"h": {"histogram": {
            "field": "value", "interval": 0.001,
            "extended_bounds": {"min": 0, "max": 1e9}}}}
        with pytest.raises(AggregationLimitsError):
            run_agg_tree(events, req)

    def test_collect_guard_in_to_es_json(self, spark, events):
        from tantivy_spark.aggs import AggregationLimitsError

        req = {"u": {"terms": {"field": "user_id", "size": 400}}}
        out = run_agg_tree(events, req, max_buckets=1_000_000)
        with pytest.raises(AggregationLimitsError,
                           match="refusing to collect"):
            to_es_json(out, max_buckets=5)

    def test_within_budget_unchanged(self, spark, events):
        """Existing requests under budget are untouched by the guard."""
        req = {"h": {"histogram": {"field": "value", "interval": 100,
                                   "min_doc_count": 0}}}
        rows = run_agg_tree(events, req)["h"].collect()
        assert sum(r["doc_count"] for r in rows) == events.count()


class TestMergeableSketches:
    """Cross-query mergeable sketches (ref: IntermediateAggregationResults,
    mod.rs:119-128; DataSketches HLL like metric/cardinality.rs)."""

    def test_partition_invariance_within_query(self, spark, events):
        """The within-query merge property: sketch estimates are
        identical at any partition count (partials merge exactly)."""
        a = events.repartition(2).agg(
            F.approx_count_distinct("user_id")).collect()[0][0]
        b = events.repartition(13).agg(
            F.approx_count_distinct("user_id")).collect()[0][0]
        assert a == b

    def test_incremental_union_equals_whole(self, spark, events):
        """Partial sketches per batch union to the SAME estimate as one
        sketch over everything — the incremental-aggregation property."""
        from tantivy_spark.aggs.sketches import (
            cardinality_sketch, merge_cardinality)

        whole = cardinality_sketch(events, "user_id")
        whole_est = merge_cardinality(whole).collect()[0]["estimate"]
        b1 = cardinality_sketch(events.filter("event_id % 3 = 0"), "user_id")
        b2 = cardinality_sketch(events.filter("event_id % 3 = 1"), "user_id")
        b3 = cardinality_sketch(events.filter("event_id % 3 = 2"), "user_id")
        merged = merge_cardinality(b1.unionAll(b2).unionAll(b3)) \
            .collect()[0]["estimate"]
        assert merged == whole_est
        exact = events.select("user_id").distinct().count()
        assert abs(merged - exact) / exact < 0.05

    def test_tree_sketch_cardinality(self, spark, events):
        from tantivy_spark.aggs import run_agg_tree

        out = run_agg_tree(events, {
            "n": {"cardinality": {"field": "user_id", "sketch": True}}})
        est = out["n"].collect()[0]["n.value"]
        exact = events.select("user_id").distinct().count()
        assert abs(est - exact) / exact < 0.05


class TestTermsOrder:
    """terms `order` by _key/_count/metric sub-agg (bucket/terms.rs)."""

    def test_order_by_key_and_metric(self, spark, events):
        req = {"t": {"terms": {"field": "event_type", "size": 100,
                               "order": {"_key": "asc"}}}}
        keys = [r["key"] for r in run_agg_tree(events, req)["t"].collect()]
        assert keys == sorted(keys)

        req = {"t": {"terms": {"field": "event_type", "size": 3,
                               "order": {"av": "desc"}},
                     "aggs": {"av": {"avg": {"field": "value"}}}}}
        rows = run_agg_tree(events, req)["t"].collect()
        want = spark.sql("""
            SELECT event_type AS key, avg(value) AS a FROM {e}
            GROUP BY 1 ORDER BY a DESC, key ASC LIMIT 3
        """, e=events).collect()
        assert [r["key"] for r in rows] == [r["key"] for r in want]
        avs = [r["av.value"] for r in rows]
        assert avs == sorted(avs, reverse=True)

    def test_order_selects_per_parent(self, spark, events):
        """order-by-metric drives the per-parent top-N selection too."""
        req = {"u": {"terms": {"field": "event_type"},
                     "aggs": {"top_users": {
                         "terms": {"field": "user_id", "size": 1,
                                   "order": {"mv": "desc"}},
                         "aggs": {"mv": {"max": {"field": "value"}}}}}}}
        rows = run_agg_tree(events, req)["u"].collect()
        want = {r["event_type"]: r["u"] for r in spark.sql("""
            SELECT event_type, user_id AS u FROM (
              SELECT event_type, user_id,
                     row_number() OVER (PARTITION BY event_type
                         ORDER BY max(value) DESC, user_id ASC) AS rk
              FROM {e} GROUP BY 1, 2) WHERE rk = 1
        """, e=events).collect()}
        got = {r["key"]: r["top_users.key"] for r in rows}
        assert got == want

    def test_bad_order_target_raises(self, spark, events):
        req = {"t": {"terms": {"field": "event_type",
                               "order": {"nope": "desc"}}}}
        with pytest.raises(ValueError, match="not a metric sub-agg"):
            run_agg_tree(events, req)["t"].collect()


def test_date_histogram_gap_fill(spark):
    """date_histogram(fixed_interval) min_doc_count=0 emits empty
    buckets across the span, widened by extended_bounds."""
    df = spark.createDataFrame(
        [("2024-01-01 00:10:00", 1.0), ("2024-01-01 03:40:00", 2.0)],
        "ts STRING, v DOUBLE").select(
        F.to_timestamp("ts").alias("ts"), "v")
    req = {"h": {"date_histogram": {"field": "ts", "fixed_interval": "1h",
                                    "min_doc_count": 0}}}
    rows = run_agg_tree(df, req)["h"].collect()
    keys = [r["key_as_string"] for r in rows]
    assert len(keys) == 4                       # 00,01,02,03 — gaps filled
    assert sorted(keys) == keys
    counts = {r["key_as_string"][:13]: r["doc_count"] for r in rows}
    assert counts["2024-01-01 00"] == 1 and counts["2024-01-01 03"] == 1
    assert counts["2024-01-01 01"] == 0 and counts["2024-01-01 02"] == 0

    # extended_bounds widen the domain; the budget guard still applies
    req["h"]["date_histogram"]["extended_bounds"] = {
        "min": "2023-12-31 22:00:00", "max": "2024-01-01 05:00:00"}
    rows = run_agg_tree(df, req)["h"].collect()
    assert len(rows) == 8                       # 22..05 inclusive
    from pyspark.errors import SparkRuntimeException
    req["h"]["date_histogram"]["fixed_interval"] = "1s"
    with pytest.raises(Exception) as ei:
        run_agg_tree(df, req, max_buckets=1000)["h"].collect()
    assert "bucket budget" in str(ei.value) or "max_buckets" in str(ei.value)


def test_sibling_bucket_sub_aggs(spark, events):
    """SEVERAL sibling bucket sub-aggs under one level (ES and the
    reference allow arbitrary siblings, mod.rs:38-54): each sibling
    forks its own chain, published as `name` / `name.<sibling>`."""
    req = {"t": {"terms": {"field": "event_type"},
                 "aggs": {
                     "by_user": {"terms": {"field": "user_id", "size": 2}},
                     "by_val": {"histogram": {"field": "value",
                                              "interval": 100}},
                     "av": {"avg": {"field": "value"}}}}}
    out = run_agg_tree(events, req)
    assert set(out) == {"t", "t.by_val"}
    first = out["t"].collect()          # terms -> by_user path
    assert {"key", "by_user.key", "doc_count", "av.value"} <= \
        set(first[0].asDict())
    second = out["t.by_val"].collect()  # terms -> by_val path
    assert {"key", "by_val.key", "doc_count", "av.value"} <= \
        set(second[0].asDict())
    # per-path correctness: histogram counts per event_type
    want = {(r["event_type"], r["k"]): r["c"] for r in spark.sql(
        "SELECT event_type, floor(value/100)*100 AS k, count(*) AS c "
        "FROM {e} GROUP BY 1, 2", e=events).collect()}
    got = {(r["key"], r["by_val.key"]): r["doc_count"] for r in second}
    assert got == want


def test_nested_es_fold(spark, events):
    """to_es_json(..., request=...) folds multi-level chains into the
    fully NESTED ES buckets shape, with TRUE per-ancestor doc_counts
    (run_agg_tree(nested=True) attaches them per level)."""
    req = {"types": {"terms": {"field": "event_type"},
                     "aggs": {"av": {"avg": {"field": "value"}},
                              "by_user": {"terms": {"field": "user_id",
                                                    "size": 2}}}}}
    res = run_agg_tree(events, req, nested=True)
    js = to_es_json(res, request=req)
    buckets = js["types"]["buckets"]
    want = {r["event_type"]: (r["c"], r["a"]) for r in spark.sql(
        "SELECT event_type, count(*) c, avg(value) a FROM {e} GROUP BY 1",
        e=events).collect()}
    assert {b["key"] for b in buckets} == set(want)
    for b in buckets:
        c, a = want[b["key"]]
        assert b["doc_count"] == c                  # TRUE ancestor count
        assert b["av"]["value"] == pytest.approx(a)
        sub = b["by_user"]["buckets"]
        assert 1 <= len(sub) <= 2
        assert all({"key", "doc_count"} <= set(s) for s in sub)
        assert sum(s["doc_count"] for s in sub) <= c
    # without request: flat rows, unchanged historical behaviour
    flat = to_es_json(run_agg_tree(events, req))
    assert "by_user.key" in flat["types"]["buckets"][0]


def test_extended_stats_full_surface(spark, events):
    """extended_stats returns the full reference surface
    (extended_stats.rs:39-118): stats fields, sum_of_squares,
    population/sampling variance & std_deviation, and sigma bounds
    (default sigma=2) nested as std_deviation_bounds in the ES fold."""
    import math

    req = {"es": {"extended_stats": {"field": "value", "sigma": 3.0}}}
    js = to_es_json(run_agg_tree(events, req))["es"]
    vals = [r["value"] for r in events.select("value").collect()]
    n = len(vals)
    mean = sum(vals) / n
    var_pop = sum((v - mean) ** 2 for v in vals) / n
    var_samp = sum((v - mean) ** 2 for v in vals) / (n - 1)
    assert js["count"] == n
    assert js["sum"] == pytest.approx(sum(vals))
    assert js["min"] == pytest.approx(min(vals))
    assert js["max"] == pytest.approx(max(vals))
    assert js["avg"] == pytest.approx(mean)
    assert js["sum_of_squares"] == pytest.approx(sum(v * v for v in vals))
    assert js["variance"] == pytest.approx(var_pop)
    assert js["variance_population"] == pytest.approx(var_pop)
    assert js["variance_sampling"] == pytest.approx(var_samp)
    assert js["std_deviation"] == pytest.approx(math.sqrt(var_pop))
    assert js["std_deviation_sampling"] == pytest.approx(math.sqrt(var_samp))
    b = js["std_deviation_bounds"]
    assert b["upper"] == pytest.approx(mean + 3.0 * math.sqrt(var_pop))
    assert b["lower"] == pytest.approx(mean - 3.0 * math.sqrt(var_pop))
    assert b["upper_population"] == b["upper"] and b["lower_population"] == b["lower"]
    assert b["upper_sampling"] == pytest.approx(mean + 3.0 * math.sqrt(var_samp))
    assert b["lower_sampling"] == pytest.approx(mean - 3.0 * math.sqrt(var_samp))


def test_extended_stats_under_terms_nested_bounds(spark, events):
    """sigma bounds survive the nested ES fold under a bucket level."""
    req = {"types": {"terms": {"field": "event_type"},
                     "aggs": {"es": {"extended_stats": {"field": "value"}}}}}
    res = run_agg_tree(events, req, nested=True)
    js = to_es_json(res, request=req)
    for b in js["types"]["buckets"]:
        es = b["es"]
        assert "std_deviation_bounds" in es
        sb = es["std_deviation_bounds"]
        assert sb["upper"] == pytest.approx(es["avg"] + 2.0 * es["std_deviation"])
        assert sb["lower"] == pytest.approx(es["avg"] - 2.0 * es["std_deviation"])


class TestPercentileSketches:
    """Mergeable t-digest percentiles (aggs/sketches.py + tdigest.py):
    partials persist per batch, merge without rescanning — the
    IntermediateAggregationResults story (aggregation/mod.rs:119-128)."""

    def test_partials_persist_and_merge(self, spark, events):
        from tantivy_spark.aggs.sketches import (
            merge_percentile_sketches, percentile_estimate,
            percentile_partials)

        # two "batches" (repartition splits) build partials separately
        parts_a = percentile_partials(events.filter("event_id % 2 = 0"),
                                      "value")
        parts_b = percentile_partials(events.filter("event_id % 2 = 1"),
                                      "value")
        partials = parts_a.unionByName(parts_b)
        assert partials.schema["sketch"].dataType.typeName() == "binary"
        merged = merge_percentile_sketches(partials)
        assert merged.count() == 1
        est = percentile_estimate(merged, [25, 50, 95]).collect()[0]["values"]
        import numpy as np
        vals = np.array([r["value"] for r in events.select("value").collect()])
        exact = np.quantile(vals, [0.25, 0.5, 0.95])
        for e, x in zip(est, exact):
            assert abs(e - x) <= 0.02 * max(abs(x), 1.0), (e, x)

    def test_grouped_partials(self, spark, events):
        from tantivy_spark.aggs.sketches import (
            merge_percentile_sketches, percentile_estimate,
            percentile_partials)

        partials = percentile_partials(events, "value", "event_type")
        merged = merge_percentile_sketches(partials, "event_type")
        est = {r["event_type"]: r["values"] for r in percentile_estimate(
            merged, [50], "event_type").collect()}
        want = {r["event_type"]: r["m"] for r in spark.sql(
            "SELECT event_type, median(value) m FROM {e} GROUP BY 1",
            e=events).collect()}
        assert set(est) == set(want)
        for k, v in want.items():
            assert abs(est[k][0] - v) <= 0.03 * max(abs(v), 1.0)

    def test_tree_sketch_flag(self, spark, events):
        """{"percentiles": {..., "sketch": true}} runs the same digest
        inline and lands in the ES fold as an ordered values array."""
        req = {"p": {"percentiles": {"field": "value", "sketch": True,
                                     "percents": [50, 95]}}}
        js = to_es_json(run_agg_tree(events, req))["p"]
        import numpy as np
        vals = np.array([r["value"] for r in events.select("value").collect()])
        exact = np.quantile(vals, [0.5, 0.95])
        assert len(js["values"]) == 2
        for e, x in zip(js["values"], exact):
            assert abs(e - x) <= 0.02 * max(abs(x), 1.0)

    def test_merge_associativity(self):
        """merge(merge(a,b),c) ~= merge(a,b,c) ~= one-shot build."""
        import numpy as np

        from tantivy_spark.functions import tdigest as td
        rng = np.random.default_rng(7)
        data = rng.lognormal(3.0, 1.0, 30_000)
        a, b, c = np.array_split(data, 3)
        two_step = td.merge([td.merge([td.build(a), td.build(b)]),
                             td.build(c)])
        one_step = td.merge([td.build(a), td.build(b), td.build(c)])
        single = td.build(data)
        qs = [0.25, 0.5, 0.9, 0.99]
        exact = np.quantile(data, qs)
        for blob in (two_step, one_step, single):
            est = td.quantile(blob, qs)
            rel = np.max(np.abs(est - exact) / np.abs(exact))
            assert rel < 0.02, rel


def test_composite_es_fold(spark, events):
    """to_es_json folds composite frames into the ES shape: key structs
    per bucket + after_key cursor (bucket/composite/mod.rs)."""
    req = {"pages": {"composite": {
        "size": 3,
        "sources": [{"t": {"terms": {"field": "event_type"}}},
                    {"u": {"terms": {"field": "user_id"}}}]}}}
    js = to_es_json(run_agg_tree(events, req), request=req)["pages"]
    assert len(js["buckets"]) == 3
    first = js["buckets"][0]
    assert set(first["key"]) == {"t", "u"}
    assert first["doc_count"] > 0
    assert js["after_key"] == js["buckets"][-1]["key"]
    # page 2 via the cursor: strictly after, no overlap
    req2 = {"pages": {"composite": {
        "size": 3, "after": js["after_key"],
        "sources": req["pages"]["composite"]["sources"]}}}
    js2 = to_es_json(run_agg_tree(events, req2), request=req2)["pages"]
    keys1 = [(b["key"]["t"], b["key"]["u"]) for b in js["buckets"]]
    keys2 = [(b["key"]["t"], b["key"]["u"]) for b in js2["buckets"]]
    assert not set(keys1) & set(keys2)
    assert all(k2 > keys1[-1] for k2 in keys2)


def test_date_histogram_offset(spark, events):
    """date_histogram fixed_interval + offset (date_histogram.rs:77):
    bucket boundaries shift by the signed duration; totals and the
    gap-filled bucket grid stay consistent."""
    req = {"d": {"date_histogram": {"field": "ts", "fixed_interval": "1d",
                                    "offset": "6h"}}}
    rows = run_agg_tree(events, req)["d"].collect()
    assert sum(r["doc_count"] for r in rows) == events.count()
    # every key sits on a 6h-offset day boundary
    for r in rows:
        assert r["key_as_string"].endswith("06:00:00")
    # parity with the direct shifted-floor SQL
    want = {r["k"]: r["c"] for r in spark.sql(
        "SELECT from_unixtime(floor((unix_timestamp(ts) - 21600)/86400)"
        "*86400 + 21600, 'yyyy-MM-dd HH:mm:ss') AS k, count(*) c "
        "FROM {e} GROUP BY 1", e=events).collect()}
    got = {r["key_as_string"]: r["doc_count"] for r in rows
           if r["doc_count"] > 0}
    assert got == want


def test_percentiles_es_values_shape(spark, events):
    """Percentiles fold into the ES result shape: float-string keys
    under "values", both top-level and nested under a bucket level."""
    req = {"p": {"percentiles": {"field": "value", "percents": [50, 95]}}}
    js = to_es_json(run_agg_tree(events, req), request=req)["p"]
    assert set(js) == {"values"} and set(js["values"]) == {"50.0", "95.0"}
    want = events.approxQuantile("value", [0.5], 0.001)[0]
    assert js["values"]["50.0"] == pytest.approx(want, rel=0.01)

    req2 = {"types": {"terms": {"field": "event_type"},
                      "aggs": {"p": {"percentiles": {
                          "field": "value", "percents": [50]}}}}}
    js2 = to_es_json(run_agg_tree(events, req2, nested=True), request=req2)
    for b in js2["types"]["buckets"]:
        assert set(b["p"]) == {"values"} and "50.0" in b["p"]["values"]


def test_calendar_date_histogram_gap_fill_in_fold(spark):
    """Calendar intervals gap-fill in the ES fold (min_doc_count
    defaults to 0): missing days and months materialize with
    doc_count 0 — EXCEEDS the reference, which supports
    fixed_interval only (date_histogram.rs:143-146)."""
    import datetime as dt

    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1), 1.0), (dt.datetime(2024, 1, 4), 2.0),
         (dt.datetime(2024, 4, 2), 3.0)],
        "ts TIMESTAMP, v DOUBLE")
    req = {"d": {"date_histogram": {"field": "ts",
                                    "calendar_interval": "day"}}}
    js = to_es_json(run_agg_tree(df, req), request=req)
    days = [b["key_as_string"] for b in js["d"]["buckets"]]
    assert days[:4] == ["2024-01-01", "2024-01-02", "2024-01-03",
                        "2024-01-04"]
    assert len(days) == (dt.date(2024, 4, 2) - dt.date(2024, 1, 1)).days + 1
    assert js["d"]["buckets"][1]["doc_count"] == 0

    req_m = {"m": {"date_histogram": {"field": "ts",
                                      "calendar_interval": "month"}}}
    js_m = to_es_json(run_agg_tree(df, req_m), request=req_m)
    assert [b["key_as_string"] for b in js_m["m"]["buckets"]] == \
        ["2024-01", "2024-02", "2024-03", "2024-04"]
    assert [b["doc_count"] for b in js_m["m"]["buckets"]] == [2, 0, 0, 1]


class TestTDigestProperties:
    """Property tests for the mergeable t-digest (functions/tdigest.py):
    rank-error bounds, merge-invariance, serialization round-trip."""

    def test_rank_error_bound_random(self):
        import numpy as np
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from tantivy_spark.functions import tdigest as td

        @settings(max_examples=20, deadline=None)
        @given(st.integers(0, 2**32 - 1), st.sampled_from(
            ["uniform", "normal", "lognormal", "bimodal"]))
        def run(seed, shape):
            rng = np.random.default_rng(seed)
            n = 5000
            if shape == "uniform":
                data = rng.uniform(-10, 10, n)
            elif shape == "normal":
                data = rng.normal(0, 3, n)
            elif shape == "lognormal":
                data = rng.lognormal(1.0, 1.0, n)
            else:
                data = np.concatenate([rng.normal(-50, 1, n // 2),
                                       rng.normal(50, 1, n // 2)])
            blob = td.merge([td.build(c) for c in np.array_split(data, 7)])
            qs = np.array([0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99])
            est = td.quantile(blob, qs)
            data_sorted = np.sort(data)
            # RANK error (the t-digest guarantee): the estimate's rank
            # must sit within 2% of n of the requested rank
            ranks = np.searchsorted(data_sorted, est) / n
            assert np.max(np.abs(ranks - qs)) < 0.02, (shape, seed)

        run()

    def test_serialization_roundtrip(self):
        import numpy as np

        from tantivy_spark.functions import tdigest as td

        data = np.arange(1000, dtype=float)
        blob = td.build(data)
        m, w, delta = td.deserialize(blob)
        assert td.serialize(m, w, delta) == blob
        assert abs(w.sum() - 1000) < 1e-9          # weights conserved

    def test_empty_and_single(self):
        import math

        import numpy as np

        from tantivy_spark.functions import tdigest as td

        empty = td.build(np.array([]))
        assert all(math.isnan(x) for x in td.quantile(empty, [0.5]))
        one = td.build(np.array([42.0]))
        assert list(td.quantile(one, [0.0, 0.5, 1.0])) == [42.0] * 3
        merged = td.merge([empty, one])
        assert list(td.quantile(merged, [0.5])) == [42.0]


def test_percentiles_keyed_false_array_form(spark, events):
    """percentiles keyed:false renders the array response form
    (metric/percentiles.rs response modes)."""
    req = {"p": {"percentiles": {"field": "value", "percents": [95, 50],
                                 "keyed": False}}}
    js = to_es_json(run_agg_tree(events, req), request=req)["p"]
    assert [d["key"] for d in js["values"]] == [50.0, 95.0]
    assert all(set(d) == {"key", "value"} for d in js["values"])


def test_keyed_range_and_histogram_buckets(spark, events):
    """keyed:true renders bucket MAPS keyed by label (range) and by the
    Rust-Display number (histogram) — bucket/range.rs:90 keyed test
    shape, histogram.rs:148."""
    req = {"r": {"range": {"field": "value",
                           "ranges": [{"from": 0.0, "to": 100.0},
                                      {"from": 100.0, "to": 200.0}],
                           "keyed": True}},
           "h": {"histogram": {"field": "value", "interval": 200,
                               "keyed": True}}}
    res = to_es_json(run_agg_tree(events, req, nested=True), request=req)
    rb = res["r"]["buckets"]
    assert isinstance(rb, dict)
    assert set(rb) >= {"0-100", "100-200"}
    assert rb["0-100"]["key"] == "0-100" and rb["0-100"]["from"] == 0.0
    hb = res["h"]["buckets"]
    assert isinstance(hb, dict) and "0" in hb
    assert hb["0"]["key"] == 0.0
    assert sum(b["doc_count"] for b in hb.values()) == events.count()


# ------------------------------------------------ multi-valued fields
# (the reference's Cardinality::Multivalued fast-field columns: every
# aggregator iterates values_for_doc and collects once PER VALUE
# OCCURRENCE — get_test_index_2_segments' scores_i64 holds [1,2]/[5,5])

@pytest.fixture(scope="module")
def mv_frame(spark):
    return spark.createDataFrame(
        [(1, [1, 2], 10.0), (2, [5, 5], 20.0), (3, None, 30.0)],
        "doc_id LONG, scores ARRAY<LONG>, w DOUBLE")


def test_multivalue_terms_per_occurrence(spark, mv_frame):
    out = run_agg_tree(mv_frame, {"t": {"terms": {"field": "scores"}}})
    rows = {int(r["key"]): int(r["doc_count"])
            for r in out["t"].collect()}
    # [5,5] counts TWICE; the no-values doc drops (null semantics)
    assert rows == {1: 1, 2: 1, 5: 2}


def test_multivalue_metric_each_value(spark, mv_frame):
    out = run_agg_tree(mv_frame, {"a": {"avg": {"field": "scores"}}})
    got = out["a"].collect()[0][0]
    assert abs(got - (1 + 2 + 5 + 5) / 4) < 1e-12


def test_multivalue_missing_substitute(spark, mv_frame):
    out = run_agg_tree(
        mv_frame, {"t": {"terms": {"field": "scores", "missing": 0}}})
    rows = {int(r["key"]): int(r["doc_count"])
            for r in out["t"].collect()}
    assert rows == {0: 1, 1: 1, 2: 1, 5: 2}


def test_multivalue_sibling_unaffected(spark, mv_frame):
    """A sibling agg over a scalar field must NOT see the explosion."""
    out = run_agg_tree(mv_frame, {
        "t": {"terms": {"field": "scores"}},
        "s": {"sum": {"field": "w"}}})
    assert out["s"].collect()[0][0] == 60.0


def test_multivalue_bucket_with_scalar_submetric(spark, mv_frame):
    """Sub-metrics collect once per parent value occurrence, like the
    reference's per-occurrence sub-agg collect."""
    out = run_agg_tree(mv_frame, {
        "t": {"terms": {"field": "scores"},
              "aggs": {"m": {"sum": {"field": "w"}}}}})
    rows = {int(r["key"]): float(r["m.value"]) for r in out["t"].collect()}
    assert rows == {1: 10.0, 2: 10.0, 5: 40.0}   # [5,5] adds w twice


def test_multivalue_two_arrays_raise(spark):
    df = spark.createDataFrame(
        [(1, [1], [2])], "doc_id LONG, a ARRAY<LONG>, b ARRAY<LONG>")
    with pytest.raises(ValueError, match="multi-valued"):
        run_agg_tree(df, {"t": {"terms": {"field": "a"},
                                "aggs": {"m": {"avg": {"field": "b"}}}}})
