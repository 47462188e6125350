"""ES-JSON aggregation vectors ported from the reference's end-to-end
suite (/root/reference/src/aggregation/agg_tests.rs) against
``run_agg_tree(..., nested=True)`` + ``to_es_json(..., request=...)``.

The fixture replays get_test_index_2_segments
(/root/reference/src/aggregation/mod.rs:561-659): 9 docs of
(text, date, score); expected JSON bodies are copied verbatim from the
reference's assert_eq! blocks.
"""

from __future__ import annotations

import datetime as dt

import pytest

from tantivy_spark.aggs import run_agg_tree, to_es_json

DAY = 86400


@pytest.fixture(scope="module")
def ref_docs(spark):
    base = dt.datetime(2019, 1, 1, tzinfo=dt.timezone.utc)
    rows = [
        ("cool", base, 1.0),
        ("cool", base + dt.timedelta(days=1), 3.0),
        ("cool", base + dt.timedelta(days=1), 5.0),
        ("nohit", base + dt.timedelta(days=1), 6.0),
        ("cool", base + dt.timedelta(days=1), 7.0),
        ("cool", base + dt.timedelta(days=1), 11.0),
        ("cool", base + dt.timedelta(days=2), 14.0),
        ("cool", base + dt.timedelta(days=2), 44.0),
        ("nohit", base + dt.timedelta(days=2), 44.0),
    ]
    return spark.createDataFrame(rows, "text STRING, date TIMESTAMP, "
                                       "score DOUBLE")


def _run(docs, req):
    return to_es_json(run_agg_tree(docs, req, nested=True), request=req)


def test_range_parent_terms_child(spark, ref_docs):
    """agg_tests.rs:25-103 case A — range(4) parent, terms(_key asc)
    child; expected JSON copied verbatim."""
    req = {"parent_range": {
        "range": {"field": "score",
                  "ranges": [{"to": 3.0}, {"from": 3.0, "to": 7.0},
                             {"from": 7.0, "to": 20.0}, {"from": 20.0}]},
        "aggs": {"child_terms": {"terms": {"field": "text",
                                           "order": {"_key": "asc"}}}}}}
    res = _run(ref_docs, req)
    assert res["parent_range"]["buckets"] == [
        {"key": "*-3", "doc_count": 1, "to": 3.0,
         "child_terms": {"buckets": [{"doc_count": 1, "key": "cool"}],
                         "sum_other_doc_count": 0}},
        {"key": "3-7", "doc_count": 3, "from": 3.0, "to": 7.0,
         "child_terms": {"buckets": [{"doc_count": 2, "key": "cool"},
                                     {"doc_count": 1, "key": "nohit"}],
                         "sum_other_doc_count": 0}},
        {"key": "7-20", "doc_count": 3, "from": 7.0, "to": 20.0,
         "child_terms": {"buckets": [{"doc_count": 3, "key": "cool"}],
                         "sum_other_doc_count": 0}},
        {"key": "20-*", "doc_count": 2, "from": 20.0,
         "child_terms": {"buckets": [{"doc_count": 1, "key": "cool"},
                                     {"doc_count": 1, "key": "nohit"}],
                         "sum_other_doc_count": 0}},
    ]


def test_histogram_parent_terms_child(spark, ref_docs):
    """agg_tests.rs:105-137 case B — histogram(100) parent, terms child."""
    req = {"parent_hist": {
        "histogram": {"field": "score", "interval": 100.0},
        "aggs": {"child_terms": {"terms": {"field": "text",
                                           "order": {"_key": "asc"}}}}}}
    res = _run(ref_docs, req)
    assert res["parent_hist"] == {
        "buckets": [
            {"key": 0.0, "doc_count": 9,
             "child_terms": {"buckets": [{"doc_count": 7, "key": "cool"},
                                         {"doc_count": 2, "key": "nohit"}],
                             "sum_other_doc_count": 0}}]}


def test_range_parent_range_child_empty_buckets(spark, ref_docs):
    """agg_tests.rs:140-215 case A — range(5) parent, range child; every
    DEFINED child range materializes (empties at doc_count 0, extended
    with the implicit tail bucket: extend_validate_ranges)."""
    req = {"parent_range": {
        "range": {"field": "score",
                  "ranges": [{"to": 3.0}, {"from": 3.0, "to": 7.0},
                             {"from": 7.0, "to": 11.0},
                             {"from": 11.0, "to": 20.0}, {"from": 20.0}]},
        "aggs": {"child_range": {
            "range": {"field": "score",
                      "ranges": [{"to": 3.0}, {"from": 3.0, "to": 20.0}]}}}}}
    res = _run(ref_docs, req)
    assert res["parent_range"]["buckets"] == [
        {"key": "*-3", "doc_count": 1, "to": 3.0,
         "child_range": {"buckets": [
             {"key": "*-3", "doc_count": 1, "to": 3.0},
             {"key": "3-20", "doc_count": 0, "from": 3.0, "to": 20.0},
             {"key": "20-*", "doc_count": 0, "from": 20.0}]}},
        {"key": "3-7", "doc_count": 3, "from": 3.0, "to": 7.0,
         "child_range": {"buckets": [
             {"key": "*-3", "doc_count": 0, "to": 3.0},
             {"key": "3-20", "doc_count": 3, "from": 3.0, "to": 20.0},
             {"key": "20-*", "doc_count": 0, "from": 20.0}]}},
        {"key": "7-11", "doc_count": 1, "from": 7.0, "to": 11.0,
         "child_range": {"buckets": [
             {"key": "*-3", "doc_count": 0, "to": 3.0},
             {"key": "3-20", "doc_count": 1, "from": 3.0, "to": 20.0},
             {"key": "20-*", "doc_count": 0, "from": 20.0}]}},
        {"key": "11-20", "doc_count": 2, "from": 11.0, "to": 20.0,
         "child_range": {"buckets": [
             {"key": "*-3", "doc_count": 0, "to": 3.0},
             {"key": "3-20", "doc_count": 2, "from": 3.0, "to": 20.0},
             {"key": "20-*", "doc_count": 0, "from": 20.0}]}},
        {"key": "20-*", "doc_count": 2, "from": 20.0,
         "child_range": {"buckets": [
             {"key": "*-3", "doc_count": 0, "to": 3.0},
             {"key": "3-20", "doc_count": 0, "from": 3.0, "to": 20.0},
             {"key": "20-*", "doc_count": 2, "from": 20.0}]}},
    ]


def test_terms_parent_range_child(spark, ref_docs):
    """agg_tests.rs:216-272 case B — terms parent (count desc default),
    range child extended with the implicit 20-* tail."""
    req = {"parent_terms": {
        "terms": {"field": "text"},
        "aggs": {"child_range": {
            "range": {"field": "score",
                      "ranges": [{"to": 3.0}, {"from": 3.0, "to": 7.0},
                                 {"from": 7.0, "to": 20.0}]}}}}}
    res = _run(ref_docs, req)
    assert res["parent_terms"]["sum_other_doc_count"] == 0
    assert res["parent_terms"]["doc_count_error_upper_bound"] == 0
    assert res["parent_terms"]["buckets"] == [
        {"key": "cool", "doc_count": 7,
         "child_range": {"buckets": [
             {"key": "*-3", "doc_count": 1, "to": 3.0},
             {"key": "3-7", "doc_count": 2, "from": 3.0, "to": 7.0},
             {"key": "7-20", "doc_count": 3, "from": 7.0, "to": 20.0},
             {"key": "20-*", "doc_count": 1, "from": 20.0}]}},
        {"key": "nohit", "doc_count": 2,
         "child_range": {"buckets": [
             {"key": "*-3", "doc_count": 0, "to": 3.0},
             {"key": "3-7", "doc_count": 1, "from": 3.0, "to": 7.0},
             {"key": "7-20", "doc_count": 0, "from": 7.0, "to": 20.0},
             {"key": "20-*", "doc_count": 1, "from": 20.0}]}},
    ]


def test_range_parent_histogram_child(spark, ref_docs):
    """agg_tests.rs:278-321 case A — range(5) parent, histogram(100)
    child: one child bucket per parent at key 0.0."""
    req = {"parent_range": {
        "range": {"field": "score",
                  "ranges": [{"to": 3.0}, {"from": 3.0, "to": 7.0},
                             {"from": 7.0, "to": 11.0},
                             {"from": 11.0, "to": 20.0}, {"from": 20.0}]},
        "aggs": {"child_hist": {
            "histogram": {"field": "score", "interval": 100.0}}}}}
    res = _run(ref_docs, req)
    assert res["parent_range"]["buckets"] == [
        {"key": "*-3", "doc_count": 1, "to": 3.0,
         "child_hist": {"buckets": [{"key": 0.0, "doc_count": 1}]}},
        {"key": "3-7", "doc_count": 3, "from": 3.0, "to": 7.0,
         "child_hist": {"buckets": [{"key": 0.0, "doc_count": 3}]}},
        {"key": "7-11", "doc_count": 1, "from": 7.0, "to": 11.0,
         "child_hist": {"buckets": [{"key": 0.0, "doc_count": 1}]}},
        {"key": "11-20", "doc_count": 2, "from": 11.0, "to": 20.0,
         "child_hist": {"buckets": [{"key": 0.0, "doc_count": 2}]}},
        {"key": "20-*", "doc_count": 2, "from": 20.0,
         "child_hist": {"buckets": [{"key": 0.0, "doc_count": 2}]}},
    ]


def test_terms_parent_histogram_child_gapfill(spark, ref_docs):
    """agg_tests.rs:322-379 case B — terms parent, histogram(10) child
    gap-fills empties PER PARENT (min_doc_count defaults to 0,
    histogram.rs:199-201)."""
    req = {"parent_terms": {
        "terms": {"field": "text"},
        "aggs": {"child_hist": {
            "histogram": {"field": "score", "interval": 10.0}}}}}
    res = _run(ref_docs, req)
    assert res["parent_terms"]["buckets"] == [
        {"key": "cool", "doc_count": 7,
         "child_hist": {"buckets": [
             {"key": 0.0, "doc_count": 4}, {"key": 10.0, "doc_count": 2},
             {"key": 20.0, "doc_count": 0}, {"key": 30.0, "doc_count": 0},
             {"key": 40.0, "doc_count": 1}]}},
        {"key": "nohit", "doc_count": 2,
         "child_hist": {"buckets": [
             {"key": 0.0, "doc_count": 1}, {"key": 10.0, "doc_count": 0},
             {"key": 20.0, "doc_count": 0}, {"key": 30.0, "doc_count": 0},
             {"key": 40.0, "doc_count": 1}]}},
    ]


def test_range_parent_date_histogram_child(spark, ref_docs):
    """agg_tests.rs:382-419 case A — date_histogram(fixed 30d) child:
    exactly one child bucket per parent, count matching the parent."""
    req = {"parent_range": {
        "range": {"field": "score",
                  "ranges": [{"to": 3.0}, {"from": 3.0, "to": 7.0},
                             {"from": 7.0, "to": 11.0},
                             {"from": 11.0, "to": 20.0}, {"from": 20.0}]},
        "aggs": {"child_date_hist": {
            "date_histogram": {"field": "date", "fixed_interval": "30d"}}}}}
    res = _run(ref_docs, req)
    for bucket in res["parent_range"]["buckets"]:
        child = bucket["child_date_hist"]["buckets"]
        assert len(child) == 1
        assert child[0]["doc_count"] == bucket["doc_count"]


def test_terms_parent_date_histogram_child(spark, ref_docs):
    """agg_tests.rs:420-440 case B — date_histogram(fixed 1d) child
    per-day counts under each term bucket."""
    req = {"parent_terms": {
        "terms": {"field": "text"},
        "aggs": {"child_date_hist": {
            "date_histogram": {"field": "date", "fixed_interval": "1d"}}}}}
    res = _run(ref_docs, req)
    buckets = res["parent_terms"]["buckets"]
    assert buckets[0]["key"] == "cool"
    cool = buckets[0]["child_date_hist"]["buckets"]
    assert [b["doc_count"] for b in cool] == [1, 4, 2]
    assert buckets[1]["key"] == "nohit"
    nohit = buckets[1]["child_date_hist"]["buckets"]
    assert [b["doc_count"] for b in nohit] == [1, 1]


@pytest.fixture(scope="module")
def flushing_docs(spark):
    """agg_tests.rs:445-470 — 80 docs (score 0..79), the last one
    'termb', the rest 'terma'."""
    rows = [(float(v), "termb" if v == 79 else "terma") for v in range(80)]
    return spark.createDataFrame(rows, "score DOUBLE, string_id STRING")


def test_flushing_range_in_range(spark, flushing_docs):
    """agg_tests.rs:486-613 — bucketsL1 range(3) + bucketsL2 range(3)
    doc_count assertions, copied verbatim."""
    req = {"bucketsL1": {
        "range": {"field": "score",
                  "ranges": [{"to": 3.0}, {"from": 3.0, "to": 70.0},
                             {"from": 70.0}]},
        "aggs": {"bucketsL2": {
            "range": {"field": "score",
                      "ranges": [{"to": 30.0}, {"from": 30.0, "to": 70.0},
                                 {"from": 70.0}]}}}}}
    res = _run(flushing_docs, req)
    b = res["bucketsL1"]["buckets"]
    assert b[0]["doc_count"] == 3
    assert b[0]["bucketsL2"]["buckets"][0]["doc_count"] == 3
    assert b[1]["key"] == "3-70"
    assert b[1]["doc_count"] == 70 - 3
    assert b[1]["bucketsL2"]["buckets"][0]["doc_count"] == 27
    assert b[1]["bucketsL2"]["buckets"][1]["doc_count"] == 40
    assert b[1]["bucketsL2"]["buckets"][2]["doc_count"] == 0
    assert b[2]["bucketsL2"]["buckets"][2]["doc_count"] == 80 - 70
    assert b[2]["doc_count"] == 80 - 70


def test_flushing_terms_histogram_exact_json(spark, flushing_docs):
    """agg_tests.rs:616-654 — term_agg_test expected JSON verbatim:
    terms(count desc default) + histogram(70) child, root terms carries
    sum_other_doc_count and doc_count_error_upper_bound."""
    req = {"term_agg_test": {
        "terms": {"field": "string_id"},
        "aggs": {"bucketsL2": {
            "histogram": {"field": "score", "interval": 70.0}}}}}
    res = _run(flushing_docs, req)
    assert res["term_agg_test"] == {
        "buckets": [
            {"bucketsL2": {"buckets": [
                {"doc_count": 70, "key": 0.0},
                {"doc_count": 9, "key": 70.0}]},
             "doc_count": 79, "key": "terma"},
            {"bucketsL2": {"buckets": [
                {"doc_count": 1, "key": 70.0}]},
             "doc_count": 1, "key": "termb"},
        ],
        "doc_count_error_upper_bound": 0,
        "sum_other_doc_count": 0,
    }


def test_flushing_cardinality(spark, flushing_docs):
    """agg_tests.rs:656-657 — cardinality over string and numeric."""
    req = {"cardinality_string_id": {"cardinality": {"field": "string_id"}},
           "cardinality_score": {"cardinality": {"field": "score"}}}
    res = to_es_json(run_agg_tree(flushing_docs, req), request=req)
    assert res["cardinality_string_id"]["value"] == 2.0
    assert res["cardinality_score"]["value"] == 80.0


def test_skewed_terms_sub_agg_exact(spark):
    """agg_tests.rs:666-744 — the skewed-bucket regression: a dominant
    term interleaved with 89 minority terms; per-term doc_count AND the
    sum sub-agg must be exact for every bucket."""
    NUM_MINORITY = 89
    rows, truth = [], {}
    minority_idx = 0
    for i in range(5000):
        if i % 25 == 0:
            term = f"minority_{minority_idx % NUM_MINORITY:02d}"
            minority_idx += 1
            score = float(i % 13 + 1)
        else:
            term, score = "dominant", 7.0
        rows.append((score, term))
        c, s = truth.get(term, (0, 0.0))
        truth[term] = (c + 1, s + score)
    assert len(truth) == NUM_MINORITY + 1
    df = spark.createDataFrame(rows, "score DOUBLE, string_id STRING")
    req = {"my_terms": {"terms": {"field": "string_id", "size": 100},
                        "aggs": {"sum_score": {"sum": {"field": "score"}}}}}
    res = _run(df, req)
    buckets = res["my_terms"]["buckets"]
    assert len(buckets) == len(truth)
    for b in buckets:
        c, s = truth[b["key"]]
        assert b["doc_count"] == c, b["key"]
        assert b["sum_score"]["value"] == pytest.approx(s), b["key"]


def test_level1_query_scoped(spark, ref_docs):
    """agg_tests.rs:746-812 — query-scoped (TermQuery 'cool') top-level
    avg + range; pinned averages and the extended range bucket set."""
    cool = ref_docs.filter("text = 'cool'")
    req = {"average": {"avg": {"field": "score"}},
           "range": {"range": {"field": "score",
                               "ranges": [{"from": 3.0, "to": 7.0},
                                          {"from": 7.0, "to": 20.0}]}}}
    res = to_es_json(run_agg_tree(cool, req, nested=True), request=req)
    assert res["average"]["value"] == pytest.approx(12.142857142857142)
    assert res["range"]["buckets"] == [
        {"key": "*-3", "doc_count": 1, "to": 3.0},
        {"key": "3-7", "doc_count": 2, "from": 3.0, "to": 7.0},
        {"key": "7-20", "doc_count": 3, "from": 7.0, "to": 20.0},
        {"key": "20-*", "doc_count": 1, "from": 20.0},
    ]


def test_metric_missing_parameter(spark):
    """Metric aggs honour `missing` (stats.rs:32-37, average.rs:24-29):
    null-field docs count as the substitute."""
    df = spark.createDataFrame([(1.0,), (None,), (3.0,), (None,)],
                               "v DOUBLE")
    req = {"a": {"avg": {"field": "v", "missing": 10.0}},
           "s": {"sum": {"field": "v", "missing": 10.0}},
           "es": {"extended_stats": {"field": "v", "missing": 10.0}}}
    res = to_es_json(run_agg_tree(df, req), request=req)
    assert res["a"]["value"] == pytest.approx(6.0)       # (1+10+3+10)/4
    assert res["s"]["value"] == pytest.approx(24.0)
    assert res["es"]["count"] == 4
    assert res["es"]["sum"] == pytest.approx(24.0)


def test_date_histogram_epoch_key(spark, ref_docs):
    """ES date buckets carry both key (epoch millis, f64) and
    key_as_string (date_histogram.rs:87)."""
    req = {"days": {"date_histogram": {"field": "date",
                                       "fixed_interval": "1d"}}}
    res = _run(ref_docs, req)
    buckets = res["days"]["buckets"]
    base_ms = dt.datetime(2019, 1, 1,
                          tzinfo=dt.timezone.utc).timestamp() * 1000.0
    assert [b["key"] for b in buckets] == \
        [base_ms, base_ms + DAY * 1000.0, base_ms + 2 * DAY * 1000.0]
    assert [b["doc_count"] for b in buckets] == [1, 5, 3]
    assert all("key_as_string" in b for b in buckets)


def test_interior_histogram_gap_fill(spark, ref_docs):
    """Parent histogram levels gap-fill too (histogram.rs:848 fills per
    aggregation instance at every level): a histogram(10) PARENT over
    scores 1..44 materializes the empty 20/30 buckets with doc_count 0
    and empty child containers."""
    req = {"h": {"histogram": {"field": "score", "interval": 10.0},
                 "aggs": {"t": {"terms": {"field": "text",
                                          "order": {"_key": "asc"}}}}}}
    res = _run(ref_docs, req)
    buckets = res["h"]["buckets"]
    assert [b["key"] for b in buckets] == [0.0, 10.0, 20.0, 30.0, 40.0]
    assert [b["doc_count"] for b in buckets] == [5, 2, 0, 0, 2]
    assert buckets[2]["t"] == {"buckets": []}       # synthetic empty
    assert buckets[4]["t"]["buckets"] == [
        {"key": "cool", "doc_count": 1}, {"key": "nohit", "doc_count": 1}]


def test_level2_range_with_sibling_metric_and_terms(spark, ref_docs):
    """agg_tests.rs:888-1035 (level2) — query-scoped range with a metric
    AND a terms bucket at the same level; pinned counts per range,
    null metric on the synthetic empty 19-20 bucket, exact avg pins."""
    cool = ref_docs.filter("text = 'cool'")
    req = {"range": {
        "range": {"field": "score",
                  "ranges": [{"to": 3.0}, {"from": 3.0, "to": 7.0},
                             {"from": 7.0, "to": 19.0},
                             {"from": 19.0, "to": 20.0}, {"from": 20.0}]},
        "aggs": {"average_in_range": {"avg": {"field": "score"}},
                 "term_agg": {"terms": {"field": "text"}}}},
        "average": {"avg": {"field": "score"}}}
    res = to_es_json(run_agg_tree(cool, req, nested=True), request=req)
    b = res["range"]["buckets"]
    assert b[1]["key"] == "3-7" and b[1]["doc_count"] == 2
    assert res["average"]["value"] == pytest.approx(12.142857142857142)
    assert b[2]["key"] == "7-19" and b[2]["doc_count"] == 3
    assert b[4]["key"] == "20-*" and b[4]["doc_count"] == 1
    assert b[3]["key"] == "19-20" and b[3]["doc_count"] == 0
    assert b[3]["average_in_range"]["value"] is None   # empty bucket
    assert b[4]["average_in_range"]["value"] == pytest.approx(44.0)
    assert len(b) == 5                                  # no 6th bucket


def test_terms_on_json_object(spark):
    """agg_tests.rs:1131-1176 — terms aggregation addressed INTO a json
    field ("json.color"); expected JSON verbatim."""
    import json as _json

    df = spark.createDataFrame(
        [(_json.dumps({"color": "red"}),),
         (_json.dumps({"color": "red"}),),
         (_json.dumps({"color": "blue"}),)], "json STRING")
    req = {"jsonagg": {"terms": {"field": "json.color"}}}
    res = to_es_json(run_agg_tree(df, req), request=req)
    assert res == {"jsonagg": {
        "buckets": [{"doc_count": 2, "key": "red"},
                    {"doc_count": 1, "key": "blue"}],
        "doc_count_error_upper_bound": 0,
        "sum_other_doc_count": 0}}


def test_terms_on_nested_json_object_escaped_dots(spark):
    """agg_tests.rs:1178-1238 — escaped dots address literal-dot KEYS
    ("json\\.blub" column, "color\\.dot" key) next to real nesting."""
    import json as _json

    rows = [({"color.dot": "red", "color": {"nested": "red"}},),
            ({"color.dot": "blue", "color": {"nested": "blue"}},),
            ({"color.dot": "blue", "color": {"nested": "blue"}},)]
    df = spark.createDataFrame([( _json.dumps(r[0]),) for r in rows],
                               "`json.blub` STRING")
    req = {"jsonagg1": {"terms": {"field": "json\\.blub.color\\.dot"}},
           "jsonagg2": {"terms": {"field": "json\\.blub.color.nested"}}}
    res = to_es_json(run_agg_tree(df, req), request=req)
    want_buckets = [{"doc_count": 2, "key": "blue"},
                    {"doc_count": 1, "key": "red"}]
    for name in ("jsonagg1", "jsonagg2"):
        assert res[name]["buckets"] == want_buckets
        assert res[name]["sum_other_doc_count"] == 0


def test_metric_on_json_number(spark):
    """Numeric agg on a json path casts to double (the reference's
    json fast-field numeric columns)."""
    import json as _json

    df = spark.createDataFrame(
        [(_json.dumps({"score": i}),) for i in (1, 3, 5)], "j STRING")
    req = {"a": {"avg": {"field": "j.score"}},
           "h": {"histogram": {"field": "j.score", "interval": 4,
                               "min_doc_count": 1}}}
    res = to_es_json(run_agg_tree(df, req), request=req)
    assert res["a"]["value"] == pytest.approx(3.0)
    assert [(b["key"], b["doc_count"]) for b in res["h"]["buckets"]] == \
        [(0.0, 2), (4.0, 1)]


def test_json_mixed_types(spark):
    """agg_tests.rs:1358-1460 — terms + range over a json path whose
    values mix numbers, strings, and booleans across segments.  Typed
    bucket keys: integral numbers unify as i64 (10.0 -> key 10),
    booleans keep key 1/0 + key_as_string, strings stay strings; the
    custom metric order drops doc_count_error_upper_bound.  Expected
    JSON copied verbatim."""
    import json as _json

    docs = [{"mixed_type": 10.0, "mixed_price": 10.0},
            {"mixed_type": "blue", "mixed_price": 5.0},
            {"mixed_type": "blue", "mixed_price": 5.0},
            {"mixed_type": "blue", "mixed_price": 5.0},
            {"mixed_type": True, "mixed_price": "no_price"},
            {"mixed_type": "red", "mixed_price": 1.0},
            {"mixed_type": "red", "mixed_price": 1.0},
            {"mixed_type": -20.5, "mixed_price": -20.5},
            {"mixed_type": True, "mixed_price": "no_price"}]
    df = spark.createDataFrame([(_json.dumps(d),) for d in docs],
                               "json STRING")
    req = {
        "termagg": {
            "terms": {"field": "json.mixed_type",
                      "order": {"min_price": "desc"}},
            "aggs": {"min_price": {"min": {"field": "json.mixed_price"}}}},
        "rangeagg": {
            "range": {"field": "json.mixed_type",
                      "ranges": [{"to": 3.0},
                                 {"from": 19.0, "to": 20.0},
                                 {"from": 20.0}]},
            "aggs": {"average_in_range":
                     {"avg": {"field": "json.mixed_type"}}}},
    }
    res = _run(df, req)
    assert res["termagg"] == {
        "buckets": [
            {"doc_count": 1, "key": 10, "min_price": {"value": 10.0}},
            {"doc_count": 3, "key": "blue", "min_price": {"value": 5.0}},
            {"doc_count": 2, "key": "red", "min_price": {"value": 1.0}},
            {"doc_count": 1, "key": -20.5,
             "min_price": {"value": -20.5}},
            {"doc_count": 2, "key": 1, "key_as_string": "true",
             "min_price": {"value": None}},
        ],
        "sum_other_doc_count": 0,
    }
    # python == treats 10 == 10.0: pin the JSON-number TYPES too
    keys = [b["key"] for b in res["termagg"]["buckets"]]
    assert isinstance(keys[0], int) and isinstance(keys[3], float)
    assert res["rangeagg"]["buckets"] == [
        {"average_in_range": {"value": -20.5}, "doc_count": 1,
         "key": "*-3", "to": 3.0},
        {"average_in_range": {"value": 10.0}, "doc_count": 1,
         "from": 3.0, "key": "3-19", "to": 19.0},
        {"average_in_range": {"value": None}, "doc_count": 0,
         "from": 19.0, "key": "19-20", "to": 20.0},
        {"average_in_range": {"value": None}, "doc_count": 0,
         "from": 20.0, "key": "20-*"},
    ]


def test_json_mixed_numerical_segments(spark):
    """agg_tests.rs:1463-1517 — i64-written 10 and f64-written 10.0
    unify into ONE bucket with i64 key 10; 10.5 stays f64.  Default
    order keeps both exact-count fields."""
    df = spark.createDataFrame(
        [('{"mixed_price": 10.5}',), ('{"mixed_price": 10.0}',),
         ('{"mixed_price": 10}',)], "json STRING")
    req = {"termagg": {"terms": {"field": "json.mixed_price"}}}
    res = _run(df, req)
    assert res["termagg"] == {
        "buckets": [{"doc_count": 2, "key": 10},
                    {"doc_count": 1, "key": 10.5}],
        "doc_count_error_upper_bound": 0,
        "sum_other_doc_count": 0,
    }
    keys = [b["key"] for b in res["termagg"]["buckets"]]
    assert isinstance(keys[0], int) and isinstance(keys[1], float)


def test_json_empty_columns(spark):
    """agg_tests.rs:1240-1355 — segments where the addressed json key
    is entirely absent still aggregate correctly; docs lacking the
    terms key drop out, docs lacking the metric key yield null."""
    import json as _json

    docs = [{"price": 10.0}, {"color": "blue"},
            {"color": "red", "price": 10.0},
            {"color": "red", "price": 10.0},
            {"color": "green", "price": 20.0},
            {"color": "green", "price": 20.0},
            {"color": "green", "price": 20.0}]
    df = spark.createDataFrame([(_json.dumps(d),) for d in docs],
                               "json STRING")
    res = _run(df, {"jsonagg": {"terms": {"field": "json.color"}}})
    assert res["jsonagg"] == {
        "buckets": [{"doc_count": 3, "key": "green"},
                    {"doc_count": 2, "key": "red"},
                    {"doc_count": 1, "key": "blue"}],
        "doc_count_error_upper_bound": 0,
        "sum_other_doc_count": 0,
    }
    req = {"jsonagg": {
        "aggs": {"min_price": {"min": {"field": "json.price"}}},
        "terms": {"field": "json.color",
                  "order": {"min_price": "desc"}}}}
    res = _run(df, req)
    assert res["jsonagg"] == {
        "buckets": [
            {"key": "green", "doc_count": 3,
             "min_price": {"value": 20.0}},
            {"key": "red", "doc_count": 2,
             "min_price": {"value": 10.0}},
            {"key": "blue", "doc_count": 1,
             "min_price": {"value": None}},
        ],
        "sum_other_doc_count": 0,
    }


def test_invalid_requests_error_parity(spark, ref_docs):
    """agg_tests.rs:1059-1128 — invalid requests raise BEFORE any job:
    numeric metric on a text column ("not configured as fast field"),
    missing `field` key, unknown agg variant."""
    from tantivy_spark.aggs.tree import run_agg_tree as run

    with pytest.raises(ValueError,
                       match='not configured as fast field'):
        run(ref_docs, {"average": {"avg": {"field": "text"}}})
    with pytest.raises(ValueError, match="missing field `field`"):
        run(ref_docs, {"average": {"avg": {"fieldd": "a"}}})
    with pytest.raises(ValueError,
                       match="unknown variant `doesnotmatchanyagg`"):
        run(ref_docs,
            {"average": {"doesnotmatchanyagg": {"field": "a"}}})


def test_field_validation_helper(spark, ref_docs):
    """agg_tests.rs:1520-1560 — validate_aggregation_fields_exist
    parity: a nonexistent field raises FieldNotFound carrying the
    field name; a valid field passes."""
    from tantivy_spark.aggs.tree import FieldNotFoundError

    with pytest.raises(FieldNotFoundError) as ei:
        run_agg_tree(ref_docs,
                     {"avg_test": {"avg": {"field": "nonexistent_field"}}})
    assert ei.value.field == "nonexistent_field"
    run_agg_tree(ref_docs, {"avg_test": {"avg": {"field": "score"}}})


def test_field_validation_covers_date_histogram(spark, ref_docs):
    """date_histogram gets the same field-existence parity as every
    other kind — a nonexistent column raises FieldNotFound instead of
    an opaque downstream analysis error."""
    from tantivy_spark.aggs.tree import FieldNotFoundError

    with pytest.raises(FieldNotFoundError) as ei:
        run_agg_tree(ref_docs, {"h": {"date_histogram": {
            "field": "no_such_ts", "fixed_interval": "1d"}}})
    assert ei.value.field == "no_such_ts"


def test_typed_key_order_selection(spark):
    """_key ordering over typed json keys is NUMERIC within the number
    group (lexicographic tagged-string order would rank 10 before 9
    and mis-select under a size cap): keys {2, 9.5, 10, "a"} with
    _key asc size 3 keep [2, 9.5, 10]."""
    df = spark.createDataFrame(
        [('{"v": 2}',), ('{"v": 10}',), ('{"v": "a"}',),
         ('{"v": 9.5}',), ('{"v": 10}',)], "j STRING")
    req = {"t": {"terms": {"field": "j.v",
                           "order": {"_key": "asc"}, "size": 3}}}
    res = _run(df, req)
    assert [b["key"] for b in res["t"]["buckets"]] == [2, 9.5, 10]
    req["t"]["terms"]["order"] = {"_key": "desc"}
    res = _run(df, req)
    assert [b["key"] for b in res["t"]["buckets"]] == ["a", 10, 9.5]


def test_percentile_order_selection(spark):
    """agg_tests.rs:1565-1689 — terms ordered by a percentile sub-agg
    stat ("my_pct.50" desc) with size=1 keeps the higher-p50 bucket
    and accounts for the pruned docs in sum_other_doc_count.  The
    reference tests this via segment_size pruning + intermediate-prune;
    this engine's selection is one exact global frame, so the observable
    contract (only "b" survives, dropped docs counted) is the assertion."""
    rows = [(1.0, "a"), (2.0, "a"), (99.0, "b"), (100.0, "b")]
    df = spark.createDataFrame(rows, "score_f64 DOUBLE, string_id STRING")
    req = {"my_terms": {
        "terms": {"field": "string_id", "size": 1,
                  "order": {"my_pct.50": "desc"}},
        "aggs": {"my_pct": {"percentiles": {"field": "score_f64",
                                            "percents": [50]}}}}}
    res = _run(df, req)
    buckets = res["my_terms"]["buckets"]
    assert [b["key"] for b in buckets] == ["b"]
    assert buckets[0]["doc_count"] == 2
    assert res["my_terms"]["sum_other_doc_count"] == 2
    # custom (metric) order: no doc_count_error_upper_bound
    assert "doc_count_error_upper_bound" not in res["my_terms"]

    # two-segment variant (agg_tests.rs:1622): extra docs (3.0,"a"),
    # (98.0,"b") — "b" still wins; 3 pruned docs accounted
    df2 = spark.createDataFrame(rows + [(3.0, "a"), (98.0, "b")],
                                "score_f64 DOUBLE, string_id STRING")
    res2 = _run(df2, req)
    b2 = res2["my_terms"]["buckets"]
    assert [b["key"] for b in b2] == ["b"] and b2[0]["doc_count"] == 3
    assert res2["my_terms"]["sum_other_doc_count"] == 3


def test_root_sum_other_exact_under_size_cap(spark):
    """Root-level terms with a size cap reports the EXACT dropped-doc
    total (bucket/terms.rs sum_other accounting), plus error bound 0
    for the default count-desc order (exact global selection)."""
    df = spark.createDataFrame(
        [(w,) for w in ["x"] * 5 + ["y"] * 3 + ["z"] * 2 + ["w"]],
        "t STRING")
    res = _run(df, {"a": {"terms": {"field": "t", "size": 2}}})
    assert [(b["key"], b["doc_count"]) for b in res["a"]["buckets"]] == \
        [("x", 5), ("y", 3)]
    assert res["a"]["sum_other_doc_count"] == 3
    assert res["a"]["doc_count_error_upper_bound"] == 0


def test_typed_json_terms_as_child_level(spark):
    """Typed json term keys decode at NESTED levels too: a child terms
    agg on a json path under a real-column parent keeps i64/f64/bool/
    string buckets distinct, with i64 unification of 1 and 1.0."""
    rows = [("x", '{"v": 1}'), ("x", '{"v": 1.0}'), ("x", '{"v": "a"}'),
            ("y", '{"v": 2.5}'), ("y", '{"v": true}')]
    df = spark.createDataFrame(rows, "grp STRING, j STRING")
    req = {"p": {"terms": {"field": "grp"},
                 "aggs": {"c": {"terms": {"field": "j.v"}}}}}
    res = _run(df, req)
    by_key = {b["key"]: b for b in res["p"]["buckets"]}
    cx = by_key["x"]["c"]["buckets"]
    assert [(b["key"], b["doc_count"]) for b in cx] == [(1, 2), ("a", 1)]
    assert isinstance(cx[0]["key"], int)
    cy = by_key["y"]["c"]["buckets"]
    assert {(b["key"], b.get("key_as_string"), b["doc_count"])
            for b in cy} == {(1, "true", 1), (2.5, None, 1)}


def test_terms_on_date_field(spark):
    """term_agg/mod.rs terms_aggregation_date/-_missing — terms on a
    DATE column keys as RFC3339 strings; `missing` substitutes the
    given string for docs lacking the field."""
    import datetime as dt

    d82 = dt.datetime(1982, 9, 17, tzinfo=dt.timezone.utc)
    d83 = dt.datetime(1983, 9, 27, tzinfo=dt.timezone.utc)
    df = spark.createDataFrame([(d82,), (d82,), (d83,), (None,)],
                               "date_field TIMESTAMP")
    res = _run(df, {"my_date": {"terms": {"field": "date_field"}}})
    assert [(b["key"], b["doc_count"])
            for b in res["my_date"]["buckets"]] == \
        [("1982-09-17T00:00:00Z", 2), ("1983-09-27T00:00:00Z", 1)]
    res = _run(df, {"my_date": {"terms": {
        "field": "date_field", "missing": "1982-09-17T00:00:00Z"}}})
    assert [(b["key"], b["doc_count"])
            for b in res["my_date"]["buckets"]] == \
        [("1982-09-17T00:00:00Z", 3), ("1983-09-27T00:00:00Z", 1)]


def test_terms_on_bool_field(spark):
    """term_agg/mod.rs terms_aggregation_bool — bool term buckets carry
    key 1/0 plus key_as_string true/false."""
    df = spark.createDataFrame([(True,), (False,), (True,)],
                               "bool_field BOOLEAN")
    res = _run(df, {"my_bool": {"terms": {"field": "bool_field"}}})
    assert res["my_bool"]["buckets"] == [
        {"key": 1, "key_as_string": "true", "doc_count": 2},
        {"key": 0, "key_as_string": "false", "doc_count": 1},
    ]


def test_terms_order_by_cardinality(spark):
    """term_agg/mod.rs terms_aggregation_order_by_cardinality_desc —
    terms ordered by a cardinality sub-agg (desc: A(5), C(3), B(1);
    asc reversed; size=2 desc keeps A, C and counts B's 3 docs in
    sum_other_doc_count)."""
    rows = ([(float(i), "A") for i in range(1, 6)]
            + [(1.0, "B")] * 3
            + [(1.0, "C"), (2.0, "C"), (3.0, "C")])
    df = spark.createDataFrame(rows, "score DOUBLE, string_id STRING")
    req = {"my_texts": {
        "terms": {"field": "string_id", "order": {"card": "desc"}},
        "aggs": {"card": {"cardinality": {"field": "score"}}}}}
    res = _run(df, req)
    assert [(b["key"], b["card"]["value"])
            for b in res["my_texts"]["buckets"]] == \
        [("A", 5.0), ("C", 3.0), ("B", 1.0)]
    req["my_texts"]["terms"]["order"] = {"card": "asc"}
    res = _run(df, req)
    assert [b["key"] for b in res["my_texts"]["buckets"]] == \
        ["B", "C", "A"]
    req["my_texts"]["terms"]["order"] = {"card": "desc"}
    req["my_texts"]["terms"]["size"] = 2
    res = _run(df, req)
    assert [b["key"] for b in res["my_texts"]["buckets"]] == ["A", "C"]
    assert res["my_texts"]["sum_other_doc_count"] == 3
