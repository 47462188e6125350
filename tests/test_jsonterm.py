"""Typed JSON terms (ref: src/schema/term.rs:72-80): order-preserving
numeric encoding + range queries inside a json field."""

import json
import random

from pyspark.sql import functions as F

from tantivy_spark.functions.jsonterm import (
    f64_sortable_hex, json_num_term, json_range_query,
)


def test_f64_hex_is_order_preserving():
    rng = random.Random(42)
    xs = ([0.0, -0.0, 1.0, -1.0, 1e-300, -1e-300, 1e300, -1e300, 0.5]
          + [rng.uniform(-1e6, 1e6) for _ in range(2000)]
          + [float(rng.randint(-10**12, 10**12)) for _ in range(2000)])
    enc = sorted(xs, key=f64_sortable_hex)
    assert enc == sorted(enc)  # hex order == numeric order
    assert all(len(f64_sortable_hex(x)) == 16 for x in xs)
    # hex chars only: the unbounded-upper sentinel "g" sorts above all
    assert all(c in "0123456789abcdef" for x in xs
               for c in f64_sortable_hex(x))


def test_typed_tokens_shapes(spark):
    from tantivy_spark.analyzer import json_typed_tokens

    doc = json.dumps({"k": 42, "s": "hi", "b": True,
                      "nest": {"x": -1.5}, "z": None})
    toks = set(spark.createDataFrame([(doc,)], "j STRING")
               .select(F.explode(json_typed_tokens(F.col("j"))).alias("t"))
               .toPandas()["t"])
    assert json_num_term("k", 42) in toks
    assert "s=hi" in toks
    assert "b#b=true" in toks
    assert json_num_term("nest.x", -1.5) in toks
    assert not any(t.startswith("z") for t in toks)  # null not indexed


def test_json_range_end_to_end(spark, tmp_path):
    """A numeric range inside a json field answers through the ordinary
    index + TermRangeQuery path, including negatives and bounds."""
    from tantivy_spark.index.build import IndexConfig, build_index
    from tantivy_spark.index.reader import IndexReader
    from tantivy_spark.query.exact import ExactSearcher

    rows = [(str(i), i, json.dumps({"k": v, "tag": "t%d" % (i % 3)}))
            for i, v in enumerate([-50, -1.5, 0, 3, 19.99, 20, 42, 59.9,
                                   60, 1000])]
    df = spark.createDataFrame(rows, "key STRING, i LONG, props STRING")
    out = str(tmp_path / "jidx")
    cfg = IndexConfig(key_col="key", field_cols={"props": "props"},
                      field_analyzers={"props": "json_typed"},
                      n_segments=2, segment_expr="pmod(i, 2)")
    build_index(spark, df, out, cfg, resume=False)
    s = ExactSearcher(IndexReader(spark, out))

    vals = [-50, -1.5, 0, 3, 19.99, 20, 42, 59.9, 60, 1000]

    def want(lo, hi, lo_in=True, hi_in=True):
        return sum(1 for v in vals
                   if (v > lo or (lo_in and v == lo))
                   and (v < hi or (hi_in and v == hi)))

    assert s.count(json_range_query("k", 20, 60, upper_inclusive=False,
                                    field="props")) == want(20, 60, True, False)
    assert s.count(json_range_query("k", -10, 5, field="props")) == \
        want(-10, 5)
    assert s.count(json_range_query("k", None, 0, field="props")) == \
        sum(1 for v in vals if v <= 0)
    assert s.count(json_range_query("k", 60, None, field="props")) == \
        sum(1 for v in vals if v >= 60)


def test_json_range_pushes_to_postings_scan(spark, tmp_path):
    """The typed-json range is an ordinary term range: its bounds reach
    the postings parquet scan as pushed filters (the FST-range walk's
    work done by row-group min/max pruning)."""
    from tantivy_spark.index.build import IndexConfig, build_index
    from tantivy_spark.index.reader import IndexReader
    from tantivy_spark.query.exact import ExactSearcher

    rows = [(str(i), i, json.dumps({"k": i * 10})) for i in range(20)]
    df = spark.createDataFrame(rows, "key STRING, i LONG, props STRING")
    out = str(tmp_path / "jidx2")
    build_index(spark, df, out, IndexConfig(
        key_col="key", field_cols={"props": "props"},
        field_analyzers={"props": "json_typed"},
        n_segments=2, segment_expr="pmod(i, 2)"), resume=False)
    s = ExactSearcher(IndexReader(spark, out))
    q = json_range_query("k", 30, 120, field="props")
    plan = s.matching(q)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    # the range bounds appear among the pushed filters on `term`
    assert "GreaterThanOrEqual(term" in plan and "LessThanOrEqual(term" in plan


def test_json_string_tokenization_and_phrase(spark, tmp_path):
    """String leaves tokenize with the default analyzer (path=tok terms
    in order), so case-folded terms AND phrases work inside json values
    — the reference's json text behaviour (string values run through
    the field's tokenizer, positions per path)."""
    from tantivy_spark.index.build import IndexConfig, build_index
    from tantivy_spark.index.reader import IndexReader
    from tantivy_spark.query import ast
    from tantivy_spark.query.exact import ExactSearcher
    from tantivy_spark.query.parser import QueryParser

    rows = [
        ("0", 0, json.dumps({"t": "The Quick Brown Fox", "k": 42})),
        ("1", 1, json.dumps({"t": "brown quick", "k": "42"})),
        ("2", 2, json.dumps({"t": "nothing here", "other": "quick brown"})),
    ]
    df = spark.createDataFrame(rows, "key STRING, i LONG, props STRING")
    out = str(tmp_path / "jidx3")
    build_index(spark, df, out, IndexConfig(
        key_col="key", field_cols={"props": "props"},
        field_analyzers={"props": "json_typed"},
        n_segments=2, segment_expr="pmod(i, 2)"), resume=False)
    s = ExactSearcher(IndexReader(spark, out))
    pr = QueryParser(fields=["props"])

    # case-folded term inside the json value
    assert s.count(pr.parse("props.t:QUICK")) == 2
    # phrase inside a json value: order matters, and the path prefix
    # keeps other paths' tokens out (doc 2 has "quick brown" under
    # `other`, not `t`)
    assert s.count(pr.parse('props.t:"quick brown"')) == 1
    assert s.count(pr.parse('props.other:"quick brown"')) == 1
    # number-or-string union: k:42 matches the number AND the string
    assert s.count(pr.parse("props.k:42")) == 2
    # but the range hits only the NUMBER-typed doc
    assert s.count(pr.parse("props.k:[40 TO 45]")) == 1


def test_i64_exact_terms_beyond_2_53(spark):
    """Integer JSON leaves index an EXACT #i= twin term: adjacent
    integers beyond 2^53 (where f64 collapses them) stay distinct, and
    json_int_range_query separates them (term.rs:72-80 i64 tag)."""
    import json as _json

    import pandas as pd

    from tantivy_spark.analyzer import json_typed_tokens
    from tantivy_spark.functions.jsonterm import (
        i64_sortable_hex, f64_sortable_hex, json_int_range_query,
        json_int_term)

    big = 1 << 53                # 9007199254740992
    nxt = big + 1                # f64-indistinguishable from big
    assert float(big) == float(nxt)              # the collapse
    assert f64_sortable_hex(big) == f64_sortable_hex(float(nxt))
    assert i64_sortable_hex(big) != i64_sortable_hex(nxt)  # exact twin

    # order preservation across the domain
    vals = [-(1 << 63), -(1 << 53) - 3, -17, 0, 17, big, nxt,
            (1 << 63) - 1]
    hexes = [i64_sortable_hex(v) for v in vals]
    assert hexes == sorted(hexes)

    # analyzer emits the twin next to the #n= term
    df = spark.createDataFrame(
        [(_json.dumps({"id": big}),), (_json.dumps({"id": nxt}),)],
        "j STRING")
    rows = df.select(json_typed_tokens(F.col("j")).alias("t")).collect()
    assert json_int_term("id", big) in rows[0]["t"]
    assert json_int_term("id", nxt) in rows[1]["t"]

    # exact range separates the f64-collapsed neighbours
    q = json_int_range_query("id", lower=nxt, upper=None)
    assert q.lower == json_int_term("id", nxt)
    assert not (q.lower <= json_int_term("id", big))  # big excluded
