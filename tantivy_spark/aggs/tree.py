"""Interpreter for the reference's ES-compatible aggregation request tree.

Reference: /root/reference/src/aggregation/ (26.9k LoC) — a JSON request
of named aggregations; bucket aggs (terms, histogram, date_histogram,
range, filter, missing) may nest sub-aggregations; metric aggs (avg, min,
max, sum, count, stats, extended_stats, percentiles, cardinality) are
leaves.  Execution there is per-segment partial results merged upward —
exactly Spark's partial/final aggregation, so the whole tree lowers to a
single ``groupBy(bucket keys...).agg(metric exprs...)`` per bucket level:
Catalyst gets one shuffle per nesting level and map-side combines
everything (the idiomatic translation of IntermediateAggregationResults).

Supported request subset (extensible):

    {"name": {"terms": {"field": f, "size": n}, "aggs": {...}},
     "name2": {"histogram": {"field": f, "interval": i}},
     "name3": {"date_histogram": {"field": ts, "calendar_interval": "day"}},
     "name4": {"range": {"field": f, "ranges": [{"to": x}, {"from": x}]}},
     "name5": {"filter": {"term": {field: v}}, "aggs": {...}},
     "name6": {"missing": {"field": f}},
     "m": {"avg"|"min"|"max"|"sum"|"value_count"|"stats"|"extended_stats"
           |"cardinality"|"percentiles": {"field": f}}}

The result is returned as a flat DataFrame per top-level bucket agg
(bucket key columns + metric columns), the Spark-native shape; a
``to_es_json`` helper folds it into the nested ES response dict.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKET_KINDS = ("terms", "histogram", "date_histogram", "range", "filter", "missing")
METRIC_KINDS = ("avg", "min", "max", "sum", "value_count", "stats",
                "extended_stats", "cardinality", "percentiles")


def _metric_cols(name: str, kind: str, body: dict) -> list[Column]:
    f = F.col(body["field"]) if "field" in body else None
    if kind == "avg":
        return [F.avg(f).alias(f"{name}.value")]
    if kind == "min":
        return [F.min(f).alias(f"{name}.value")]
    if kind == "max":
        return [F.max(f).alias(f"{name}.value")]
    if kind == "sum":
        return [F.sum(f).alias(f"{name}.value")]
    if kind == "value_count":
        return [F.count(f).alias(f"{name}.value")]
    if kind == "cardinality":
        # HLL++ sketch (reference uses DataSketches HLL: approximate-
        # compatible, not bit-identical)
        return [F.approx_count_distinct(f).alias(f"{name}.value")]
    if kind == "stats":
        return [F.count(f).alias(f"{name}.count"),
                F.sum(f).alias(f"{name}.sum"),
                F.min(f).alias(f"{name}.min"),
                F.max(f).alias(f"{name}.max"),
                F.avg(f).alias(f"{name}.avg")]
    if kind == "extended_stats":
        return [F.count(f).alias(f"{name}.count"),
                F.avg(f).alias(f"{name}.avg"),
                F.var_pop(f).alias(f"{name}.variance"),
                F.stddev_pop(f).alias(f"{name}.std_deviation")]
    if kind == "percentiles":
        pcts = body.get("percents", [1, 5, 25, 50, 75, 95, 99])
        # KLL/GK-family sketch via percentile_approx (reference uses
        # DDSketch: approximate-compatible)
        return [F.percentile_approx(f, float(p) / 100.0, 10_000)
                .alias(f"{name}.{p}") for p in pcts]
    raise ValueError(f"unsupported metric {kind}")


def _bucket_key(kind: str, body: dict) -> tuple[Column, str]:
    field = body.get("field")
    if kind == "terms":
        return F.col(field), "key"
    if kind == "histogram":
        interval = float(body["interval"])
        off = float(body.get("offset", 0.0))
        return (F.floor((F.col(field) - off) / interval) * interval + off), "key"
    if kind == "date_histogram":
        unit = body.get("calendar_interval", body.get("fixed_interval", "day"))
        unit_map = {"day": "yyyy-MM-dd", "month": "yyyy-MM", "year": "yyyy",
                    "hour": "yyyy-MM-dd HH"}
        return F.date_format(F.col(field), unit_map[unit]), "key_as_string"
    if kind == "missing":
        return F.lit(None), "key"
    raise ValueError(kind)


def _filter_pred(body: dict) -> Column:
    if "term" in body:
        ((f, v),) = body["term"].items()
        return F.col(f) == F.lit(v)
    if "range" in body:
        ((f, conds),) = body["range"].items()
        pred = F.lit(True)
        if "gte" in conds:
            pred = pred & (F.col(f) >= conds["gte"])
        if "lt" in conds:
            pred = pred & (F.col(f) < conds["lt"])
        if "gt" in conds:
            pred = pred & (F.col(f) > conds["gt"])
        if "lte" in conds:
            pred = pred & (F.col(f) <= conds["lte"])
        return pred
    raise ValueError(f"unsupported filter {body}")


def _split_sub_aggs(sub_aggs: dict | None):
    """-> (metric sub-aggs, single nested bucket sub-agg or None)."""
    metrics: dict = {}
    nested: tuple | None = None
    for sname, sbody in (sub_aggs or {}).items():
        m = [k for k in sbody if k in METRIC_KINDS]
        b = [k for k in sbody if k in BUCKET_KINDS]
        if m:
            metrics[sname] = sbody
        elif b:
            if nested is not None:
                raise ValueError("at most one nested bucket agg per level")
            nested = (sname, b[0], sbody)
        else:
            raise ValueError(f"unrecognized sub-agg {sname}")
    return metrics, nested


def _sub_metric_cols(sub_aggs: dict | None) -> list[Column]:
    metrics, nested = _split_sub_aggs(sub_aggs)
    if nested is not None:
        raise ValueError("nested bucket agg not supported under this agg kind")
    cols: list[Column] = []
    for sname, sbody in metrics.items():
        kind = [k for k in sbody if k in METRIC_KINDS][0]
        cols.extend(_metric_cols(sname, kind, sbody[kind]))
    return cols


def run_agg_tree(df: DataFrame, request: dict) -> dict[str, DataFrame]:
    """Execute an ES-style aggregation request; returns one DataFrame per
    top-level aggregation name."""
    out: dict[str, DataFrame] = {}
    for name, body in request.items():
        kinds = [k for k in body if k in BUCKET_KINDS + METRIC_KINDS]
        if not kinds:
            raise ValueError(f"no recognized agg in {name}")
        kind = kinds[0]
        sub = body.get("aggs")
        if kind in METRIC_KINDS:
            out[name] = df.agg(*_metric_cols(name, kind, body[kind]))
            continue
        if kind == "filter":
            fdf = df.filter(_filter_pred(body["filter"]))
            out[name] = fdf.agg(F.count(F.lit(1)).alias("doc_count"),
                                *_sub_metric_cols(sub))
            continue
        if kind == "range":
            field = body["range"]["field"]
            whens = None
            for i, r in enumerate(body["range"]["ranges"]):
                lo, hi = r.get("from"), r.get("to")
                label = f"{lo if lo is not None else '*'}-{hi if hi is not None else '*'}"
                cond = F.lit(True)
                if lo is not None:
                    cond = cond & (F.col(field) >= lo)
                if hi is not None:
                    cond = cond & (F.col(field) < hi)
                whens = F.when(cond, label) if whens is None else whens.when(cond, label)
            grouped = df.withColumn("key", whens).filter(F.col("key").isNotNull()) \
                .groupBy("key")
            out[name] = grouped.agg(F.count(F.lit(1)).alias("doc_count"),
                                    *_sub_metric_cols(sub))
            continue
        key_col, key_name = _bucket_key(kind, body[kind])
        if kind == "missing":
            base = df.filter(F.col(body[kind]["field"]).isNull())
            out[name] = base.agg(F.count(F.lit(1)).alias("doc_count"),
                                 *_sub_metric_cols(sub))
            continue
        metrics, nested = _split_sub_aggs(sub)
        metric_cols: list[Column] = []
        for sname, sbody in metrics.items():
            mk = [k for k in sbody if k in METRIC_KINDS][0]
            metric_cols.extend(_metric_cols(sname, mk, sbody[mk]))
        if nested is not None:
            # depth-2 bucket nesting: one groupBy over both keys computes
            # every (outer, inner) bucket; a terms outer with a size limit
            # first selects its top keys (broadcast semi-join), mirroring
            # ES shard_size semantics exactly at this scale.  to_es_json
            # refolds the flat rows into nested ES buckets.
            n_name, n_kind, n_body = nested
            inner_key, inner_key_name = _bucket_key(n_kind, n_body[n_kind])
            inner_metrics = _sub_metric_cols(n_body.get("aggs"))
            base = df
            if kind == "terms" and "size" in body[kind]:
                top_keys = (df.groupBy(key_col.alias(key_name))
                            .agg(F.count(F.lit(1)).alias("doc_count"))
                            .orderBy(F.desc("doc_count"), F.asc(key_name))
                            .limit(int(body[kind]["size"]))
                            .select(key_name))
                base = df.join(F.broadcast(top_keys),
                               key_col == top_keys[key_name], "left_semi")
            grouped = base.groupBy(key_col.alias(key_name),
                                   inner_key.alias(f"{n_name}.{inner_key_name}"))
            agg_df = grouped.agg(F.count(F.lit(1)).alias("doc_count"),
                                 *inner_metrics)
            out[name] = agg_df.orderBy(key_name, f"`{n_name}.{inner_key_name}`")
            continue
        grouped = df.groupBy(key_col.alias(key_name))
        agg_df = grouped.agg(F.count(F.lit(1)).alias("doc_count"), *metric_cols)
        if kind == "terms":
            size = int(body[kind].get("size", 10))
            min_dc = int(body[kind].get("min_doc_count", 1))
            agg_df = (agg_df.filter(F.col("doc_count") >= min_dc)
                      .orderBy(F.desc("doc_count"), F.asc(key_name)).limit(size))
        else:
            agg_df = agg_df.orderBy(key_name)
        out[name] = agg_df
    return out


def to_es_json(results: dict[str, DataFrame]) -> dict:
    """Fold flat bucket DataFrames into the nested ES response shape."""
    resp: dict = {}
    for name, df in results.items():
        rows = [r.asDict() for r in df.collect()]
        if rows and ("key" in rows[0] or "key_as_string" in rows[0]):
            resp[name] = {"buckets": rows}
        else:
            resp[name] = rows[0] if rows else {}
    return resp
