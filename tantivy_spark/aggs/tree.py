"""Interpreter for the reference's ES-compatible aggregation request tree.

Reference: /root/reference/src/aggregation/ (26.9k LoC) — a JSON request
of named aggregations; bucket aggs (terms, histogram, date_histogram,
range, filter, missing, composite) may nest sub-aggregations to ARBITRARY
depth (aggregation/mod.rs:38-54); metric aggs (avg, min, max, sum, count,
stats, extended_stats, percentiles, cardinality, top_hits) are leaves.
Execution there is per-segment partial results merged upward — exactly
Spark's partial/final aggregation, so a whole bucket CHAIN lowers to a
single ``groupBy(level-1 key, ..., level-n key).agg(...)``: Catalyst gets
ONE shuffle for the deepest grouping plus one tiny shuffle per terms level
that needs per-parent top-size selection (the ES shard_size analogue).

Flat result convention: one row per deepest bucket, ancestor keys as
columns (``key`` for the top level, ``{name}.key`` below), ``doc_count``
of the deepest bucket, metric columns ``{name}.{stat}``.  Metric sub-aggs
attached to intermediate levels join on as ``{name}.{stat}`` columns
(repeated per leaf row).  ``to_es_json(results, request=...)`` refolds
single-path key chains into the fully NESTED ES buckets shape —
per-level doc_count (true ancestor counts via
``run_agg_tree(nested=True)``), per-level metrics, child buckets under
the child's name; without ``request`` the flat rows pass through.

Bucket features vs the reference:
- terms: ``size`` (top-N per parent bucket), ``min_doc_count``, and
  ``order`` by ``_count`` / ``_key`` / a metric sub-agg (asc|desc) —
  selection AND output ordering honor it (bucket/terms.rs order).
- histogram: ``interval``/``offset``, ``min_doc_count: 0`` gap filling
  with ``extended_bounds`` / ``hard_bounds`` (histogram.rs:63-129) — the
  empty-bucket domain is generated distributedly per parent bucket
  (sequence + explode, no driver loop).
- date_histogram: calendar_interval hour/day/month/year AND
  fixed_interval (e.g. "30m", "12h", "7d") via epoch arithmetic.
- composite: multi-source paginated buckets with ``size`` and ``after``
  keyset cursor (bucket/composite/mod.rs) — as a real tree node.
- top_hits: per-bucket top documents by a sort spec with docvalue_fields
  (metric/top_hits.rs) — as a real tree node (must be the only sub-agg
  at its level; it changes the output granularity to one row per hit).
- terms ``missing``: docs lacking the field bucket under the substitute
  value; without it they are dropped (ES semantics; the ``missing``
  BUCKET agg is the explicit collector for absent values).
- SIBLING bucket sub-aggs: a level may carry several bucket children
  (mod.rs:38-54 allows arbitrary siblings); each sibling forks its own
  root->leaf chain, published as ``name`` (first path) and
  ``name.<sibling>`` — one flat frame per path, shared ancestor metric
  columns repeated on each.

Mergeable-sketch semantics (ref: IntermediateAggregationResults,
aggregation/mod.rs:119-128 — per-segment partial sketches merged
upward): Spark's execution model provides exactly this WITHIN a query —
``percentile_approx`` (KLL) and ``approx_count_distinct`` (HLL++) build
per-partition partial sketches that the final aggregation merges, which
is the property that makes them correct at any partition count.
ACROSS queries, aggs/sketches.py persists the partial sketches
themselves: ``hll_sketch_agg`` emits binary DataSketches HLL sketches —
the SAME sketch family the reference's cardinality agg uses
(metric/cardinality.rs) — that store next to index batches and merge
later with ``hll_union_agg``, so re-estimating a growing index never
rescans the data; a cardinality request opts in with
``{"sketch": true}``.  Percentiles: Spark's KLL exposes no serialized
form, so the repo carries its OWN mergeable t-digest
(functions/tdigest.py; sketches.percentile_partials / merge) — a
percentiles request opts in with ``{"sketch": true}`` and gets the
same digest family as the persisted cross-batch path.  HLL estimates
are approximate-compatible, not bit-identical — which is why the
approx-cardinality gate entry is rows-only.
"""

from __future__ import annotations

import re as _re

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

BUCKET_KINDS = ("terms", "histogram", "date_histogram", "range", "filter",
                "missing", "composite")
METRIC_KINDS = ("avg", "min", "max", "sum", "value_count", "stats",
                "extended_stats", "cardinality", "percentiles")

#: global bucket budget per aggregation request — the reference enforces
#: the same default via AggregationLimitsGuard (agg_limits.rs;
#: DEFAULT_BUCKET_LIMIT = 65_000, mod.rs:152-155).  A fine-interval
#: histogram over a wide range, or terms over a high-cardinality field,
#: must fail loudly instead of collecting unbounded buckets to the driver.
DEFAULT_BUCKET_LIMIT = 65_000

#: separator inside tagged typed-json term keys ("i\x1f10", "s\x1fblue",
#: "b\x1ftrue", "f\x1f-20.5") — decoded back into typed ES keys by
#: _fold_nested (agg_tests.rs:1358 mixed-type json term buckets)
TYPED_KEY_SEP = "\x1f"


def _decode_typed_key(kval) -> dict:
    """Tagged typed-json term key -> the ES bucket key fields: numbers
    come back as JSON numbers (i64 when integral — the reference's
    columnar numerical coercion unifies 10 and 10.0 across segments,
    agg_tests.rs:1463), strings as strings, booleans as 1/0 with a
    key_as_string (agg_tests.rs:1358 expected shape)."""
    if not isinstance(kval, str) or len(kval) < 2 \
            or kval[1] != TYPED_KEY_SEP or kval[0] not in "isfb":
        return {"key": kval}
    tag, raw = kval[0], kval[2:]
    if tag == "i":
        return {"key": int(raw)}
    if tag == "f":
        return {"key": float(raw)}
    if tag == "b":
        return {"key": 1 if raw == "true" else 0, "key_as_string": raw}
    return {"key": raw}


class AggregationLimitsError(ValueError):
    """Raised when an aggregation request exceeds its bucket budget
    (reference: agg_limits.rs AggregationLimitsGuard)."""


class FieldNotFoundError(ValueError):
    """An aggregation addresses a field the frame does not carry
    (reference: TantivyError::FieldNotFound raised by
    agg_req::validate_aggregation_fields_exist, agg_tests.rs:1520-1560).
    ``.field`` carries the offending name like the Rust variant's
    payload."""

    def __init__(self, field: str):
        super().__init__(f"field {field!r} not found")
        self.field = field


#: metric kinds whose input must be numeric — avg/sum/stats families
#: (the reference requires a numeric fast field, raising
#: InvalidArgument("... is not configured as fast field"),
#: agg_tests.rs:1081-1085).  min/max/value_count/cardinality accept any
#: column type, matching the reference's broader term/bytes support.
_NUMERIC_METRICS = ("avg", "sum", "stats", "extended_stats", "percentiles")

#: agg kinds whose body requires a ``field`` key (serde parity:
#: "missing field `field`", agg_tests.rs:1087-1096)
_FIELD_REQUIRED = _NUMERIC_METRICS + (
    "min", "max", "value_count", "cardinality", "terms", "histogram",
    "date_histogram", "range", "missing")


def _validate_fields(df: DataFrame, request: dict) -> None:
    """Request-shape + field validation with reference error parity
    (agg_tests.rs:1059-1128 invalid requests, :1520-1560 validation
    helper): unknown agg variants, missing ``field`` keys, references
    to absent columns (FieldNotFoundError), and numeric metrics over
    non-numeric columns all raise BEFORE any job is launched."""
    from pyspark.sql.types import BooleanType, NumericType, TimestampType

    known = set(BUCKET_KINDS) | set(METRIC_KINDS) | {"top_hits"}
    types = {f.name: f.dataType for f in df.schema.fields}

    def check(name: str, body: dict) -> None:
        kinds = [k for k in body if k in known]
        if not kinds:
            bad = next((k for k in body if k != "aggs"), name)
            raise ValueError(
                f"unknown variant `{bad}`, expected one of "
                f"{sorted(known)} (in aggregation {name!r})")
        kind = kinds[0]
        spec = body[kind]
        if isinstance(spec, dict):
            if kind in _FIELD_REQUIRED and "field" not in spec:
                raise ValueError(f"missing field `field` (in {kind} "
                                 f"aggregation {name!r})")
            fld = spec.get("field")
            if isinstance(fld, str):
                if fld not in types:
                    # json-pathed fields were already resolved into
                    # __jf* columns by _resolve_json_fields; anything
                    # left unresolved does not exist
                    raise FieldNotFoundError(fld)
                if kind in _NUMERIC_METRICS and not isinstance(
                        types[fld],
                        (NumericType, BooleanType, TimestampType)):
                    raise ValueError(
                        f'Field "{fld}" is not configured as fast field '
                        f"(numeric input required by {kind})")
        for sub_name, sub in (body.get("aggs") or {}).items():
            if isinstance(sub, dict):
                check(sub_name, sub)

    for name, body in request.items():
        if isinstance(body, dict):
            check(name, body)


def _domain_guard(n_buckets: Column, max_buckets: int) -> Column:
    """Lazy executor-side budget check: evaluates to NULL below budget,
    raises (failing the job with a clear message) past it.  Used where the
    PLAN itself would materialize the buckets (sequence/explode domains),
    so the overrun never runs — no extra driver action, no extra job."""
    return F.when(
        n_buckets > F.lit(max_buckets),
        F.raise_error(F.concat(
            F.lit("aggregation bucket budget exceeded: "),
            n_buckets.cast("string"),
            F.lit(f" buckets > max_buckets={max_buckets} "
                  "(reference: agg_limits.rs)"))))


def _metric_cols(name: str, kind: str, body: dict) -> list[Column]:
    f = F.col(body["field"]) if "field" in body else None
    if f is not None and body.get("missing") is not None:
        # every reference metric accepts `missing` (stats.rs:32-37,
        # average.rs:24-29): docs lacking the field count as the
        # substitute value instead of being skipped
        f = F.coalesce(f, F.lit(float(body["missing"])))
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
        if body.get("sketch"):
            # DataSketches HLL — the reference's exact sketch family
            # (metric/cardinality.rs); partial sketches also persist and
            # merge ACROSS queries via aggs/sketches.py
            from tantivy_spark.aggs.sketches import hll_estimate
            return [hll_estimate(f).alias(f"{name}.value")]
        # default: HLL++ at rsd=0.01 (~2^14 registers).  The reference's
        # DataSketches HLL (lg_k=11, cardinality.rs:20-21) is EXACT at
        # small cardinalities via its coupon/sparse mode; Spark's HLL++
        # has no sparse-exact mode, so a tighter rsd buys back the
        # small-n exactness (agg_tests.rs pins exact counts at n=80)
        # for ~16KB of per-bucket aggregation state.
        return [F.approx_count_distinct(f, 0.01).alias(f"{name}.value")]
    if kind == "stats":
        return [F.count(f).alias(f"{name}.count"),
                F.sum(f).alias(f"{name}.sum"),
                F.min(f).alias(f"{name}.min"),
                F.max(f).alias(f"{name}.max"),
                F.avg(f).alias(f"{name}.avg")]
    if kind == "extended_stats":
        # Full reference surface (extended_stats.rs:39-118): stats fields
        # + sum_of_squares + population/sampling variance & std_deviation
        # + std_deviation_bounds at avg ± sigma·std (sigma default 2.0,
        # extended_stats.rs:41-44).  All partial-aggregatable (count/sum/
        # sum-of-squares), so map-side combine holds at scale; the bound
        # arithmetic is driver-free column math over the aggregates.
        sigma = float(body.get("sigma", 2.0))
        sd_pop = F.stddev_pop(f)
        sd_samp = F.stddev_samp(f)
        avg = F.avg(f)
        return [F.count(f).alias(f"{name}.count"),
                F.sum(f).alias(f"{name}.sum"),
                F.min(f).alias(f"{name}.min"),
                F.max(f).alias(f"{name}.max"),
                avg.alias(f"{name}.avg"),
                F.sum(f * f).alias(f"{name}.sum_of_squares"),
                F.var_pop(f).alias(f"{name}.variance"),
                F.var_pop(f).alias(f"{name}.variance_population"),
                F.var_samp(f).alias(f"{name}.variance_sampling"),
                sd_pop.alias(f"{name}.std_deviation"),
                sd_pop.alias(f"{name}.std_deviation_population"),
                sd_samp.alias(f"{name}.std_deviation_sampling"),
                (avg + F.lit(sigma) * sd_pop)
                .alias(f"{name}.std_deviation_bounds.upper"),
                (avg - F.lit(sigma) * sd_pop)
                .alias(f"{name}.std_deviation_bounds.lower"),
                (avg + F.lit(sigma) * sd_pop)
                .alias(f"{name}.std_deviation_bounds.upper_population"),
                (avg - F.lit(sigma) * sd_pop)
                .alias(f"{name}.std_deviation_bounds.lower_population"),
                (avg + F.lit(sigma) * sd_samp)
                .alias(f"{name}.std_deviation_bounds.upper_sampling"),
                (avg - F.lit(sigma) * sd_samp)
                .alias(f"{name}.std_deviation_bounds.lower_sampling")]
    if kind == "percentiles":
        pcts = body.get("percents", [1, 5, 25, 50, 75, 95, 99])
        if body.get("sketch"):
            # mergeable t-digest (functions/tdigest.py) — the same
            # digest family as the persisted cross-batch path
            # (sketches.percentile_partials / merge_percentile_sketches)
            from tantivy_spark.aggs.sketches import tdigest_quantiles
            return [tdigest_quantiles(f, pcts).alias(f"{name}.values")]
        # KLL/GK-family sketch via percentile_approx (reference uses
        # DDSketch: approximate-compatible)
        return [F.percentile_approx(f, float(p) / 100.0, 10_000)
                .alias(f"{name}.{p}") for p in pcts]
    raise ValueError(f"unsupported metric {kind}")


_FIXED_UNITS = {"ms": 0.001, "s": 1, "m": 60, "h": 3600, "d": 86400}


def _fixed_interval_seconds(spec: str) -> float:
    m = _re.fullmatch(r"(\d+)(ms|s|m|h|d)", spec)
    if not m:
        raise ValueError(f"bad fixed_interval {spec!r}")
    return int(m.group(1)) * _FIXED_UNITS[m.group(2)]


def _offset_seconds(spec) -> float:
    """date_histogram ``offset`` — a signed duration string like
    '-4h' / '+30m' (date_histogram.rs:77, parse_offset_into_milliseconds
    accepts a leading sign)."""
    s = str(spec)
    sign = 1.0
    if s and s[0] in "+-":
        sign = -1.0 if s[0] == "-" else 1.0
        s = s[1:]
    return sign * _fixed_interval_seconds(s)


def _bucket_key(kind: str, body: dict) -> tuple[Column, str]:
    """(key column, ES key-name) for a bucket level."""
    field = body.get("field")
    if kind == "terms":
        col = F.col(field)
        if "missing" in body:
            # ES `missing` parameter: docs lacking the field bucket under
            # this substitute value instead of being dropped
            col = F.coalesce(col, F.lit(body["missing"]))
        return col, "key"
    if kind == "histogram":
        interval = float(body["interval"])
        off = float(body.get("offset", 0.0))
        return (F.floor((F.col(field) - off) / interval) * interval + off), "key"
    if kind == "date_histogram":
        if "fixed_interval" in body:
            secs = _fixed_interval_seconds(body["fixed_interval"])
            off = _offset_seconds(body["offset"]) if "offset" in body \
                else 0.0
            epoch = F.unix_timestamp(F.col(field)).cast("double")
            bucket_start = (F.floor((epoch - F.lit(off)) / secs)
                            * F.lit(secs) + F.lit(off))
            return (F.from_unixtime(bucket_start.cast("long"),
                                    "yyyy-MM-dd HH:mm:ss"), "key_as_string")
        unit = body.get("calendar_interval", "day")
        unit_map = {"day": "yyyy-MM-dd", "month": "yyyy-MM", "year": "yyyy",
                    "hour": "yyyy-MM-dd HH"}
        return F.date_format(F.col(field), unit_map[unit]), "key_as_string"
    raise ValueError(kind)


def _terms_sort_cols(order: dict | None, key_col: str, count_col: str,
                     lvl: "_Level") -> list[Column]:
    """ES terms ``order`` -> sort columns (ref: bucket/terms.rs custom
    order): ``{"_count": dir}``, ``{"_key": dir}``, or
    ``{"<metric sub-agg>[.stat]": dir}``.  Default _count desc; the key
    always tie-breaks ascending for determinism."""
    if not order:
        return [F.desc(count_col), F.asc(key_col)]
    ((target, direction),) = order.items()
    if direction not in ("asc", "desc"):
        raise ValueError(f"terms order direction {direction!r}")
    if target == "_count":
        col = F.col(count_col)
    elif target == "_key" and lvl.body.get("__typed_key"):
        # typed tagged keys ("i\x1f10") sort NUMERICALLY within the
        # number group, then lexically for strings — lexicographic
        # order on the tagged string would rank "10" before "9" and
        # mis-select under a size cap.  Mirrors the driver-side krank
        # in _terms_bucket_sort (numbers first, then strings).
        c = F.col(key_col)
        tag = F.substring(c, 1, 1)
        raw = F.expr(f"substring(`{key_col}`, 3)")
        num = F.when(tag == "b",
                     F.when(raw == "true", F.lit(1.0)).otherwise(0.0)) \
               .otherwise(raw.try_cast("double"))
        grp = F.when(tag != "s", F.lit(0)).otherwise(1)
        val = F.when(tag != "s", num).otherwise(F.lit(0.0))
        sval = F.when(tag == "s", raw).otherwise(F.lit(""))
        cols = [grp, val, sval]
        cols = [x.desc() if direction == "desc" else x.asc()
                for x in cols]
        return cols + [F.asc(key_col)]
    elif target == "_key":
        col = F.col(key_col)
    else:
        sname = target.split(".")[0]
        if sname not in lvl.metrics:
            raise ValueError(
                f"terms order target {target!r} is not a metric sub-agg "
                f"of this level (have {sorted(lvl.metrics)})")
        alias = target if "." in target else f"{target}.value"
        col = F.col(f"`{alias}`")
    col = col.desc() if direction == "desc" else col.asc()
    return [col, F.asc(key_col)]


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


def _fmt_bound(v) -> str:
    """Range-bound display format (bucket/range.rs key strings — Rust's
    f64 Display prints 3.0 as "3")."""
    f = float(v)
    return str(int(f)) if f == int(f) else str(f)


def _range_label(r: dict) -> str:
    lo, hi = r.get("from"), r.get("to")
    return r.get("key",
                 f"{_fmt_bound(lo) if lo is not None else '*'}-"
                 f"{_fmt_bound(hi) if hi is not None else '*'}")


def _extend_ranges(body: dict) -> list[dict]:
    """The EFFECTIVE range set (bucket/range.rs extend_validate_ranges:
    477-500): request ranges sorted by start, an implicit unbounded head
    added when the first range has a `from`, an implicit unbounded tail
    when the last has a `to`, and hole-filler ranges between
    non-contiguous neighbours.  Overlaps are rejected like the
    reference."""
    rs = sorted(body["ranges"],
                key=lambda r: (r.get("from") is not None,
                               r.get("from") if r.get("from") is not None
                               else 0.0))
    out: list[dict] = []
    if rs and rs[0].get("from") is not None:
        out.append({"to": rs[0]["from"]})
    for r in rs:
        if out:
            prev_to = out[-1].get("to")
            cur_from = r.get("from")
            if prev_to is not None and cur_from is not None:
                if float(cur_from) < float(prev_to):
                    raise ValueError(
                        f"overlapping ranges at from={cur_from}")
                if float(cur_from) > float(prev_to):   # hole filler
                    out.append({"from": prev_to, "to": cur_from})
        out.append(r)
    if out and out[-1].get("to") is not None:
        out.append({"from": out[-1]["to"]})
    return out


def _range_key(body: dict) -> Column:
    field = body["field"]
    whens = None
    for r in _extend_ranges(body):
        lo, hi = r.get("from"), r.get("to")
        label = _range_label(r)
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (F.col(field) >= lo)
        if hi is not None:
            cond = cond & (F.col(field) < hi)
        whens = F.when(cond, label) if whens is None else whens.when(cond, label)
    return whens


def _range_order_col(body: dict, col: Column) -> Column:
    """Maps a range label back to its EFFECTIVE-set index — the reference
    returns range buckets in coverage order, not label-string order."""
    expr = None
    for i, r in enumerate(_extend_ranges(body)):
        lbl = _range_label(r)
        expr = F.when(col == lbl, i) if expr is None else expr.when(col == lbl, i)
    return expr


class _Level:
    """One bucket level of a chain: its kind, request body, sub-metric
    aggs, and the alias its key column carries in the flat output."""

    __slots__ = ("name", "kind", "body", "alias", "metrics", "top_hits")

    def __init__(self, name, kind, body, alias, metrics, top_hits):
        self.name = name
        self.kind = kind
        self.body = body
        self.alias = alias
        self.metrics = metrics          # {metric_name: metric_body}
        self.top_hits = top_hits        # (name, body) | None


def _split_sub_aggs(sub_aggs: dict | None):
    """-> (metric sub-aggs, top_hits sub-agg or None,
           list of nested bucket sub-aggs [(name, kind, body), ...])."""
    metrics: dict = {}
    nested: list[tuple] = []
    top_hits: tuple | None = None
    for sname, sbody in (sub_aggs or {}).items():
        if "top_hits" in sbody:
            if top_hits is not None:
                raise ValueError("at most one top_hits per level")
            top_hits = (sname, sbody["top_hits"])
            continue
        m = [k for k in sbody if k in METRIC_KINDS]
        b = [k for k in sbody if k in BUCKET_KINDS]
        if m:
            metrics[sname] = sbody
        elif b:
            nested.append((sname, b[0], sbody))
        else:
            raise ValueError(f"unrecognized sub-agg {sname}")
    return metrics, top_hits, nested


def _chain_paths(name: str, kind: str, body: dict,
                 depth: int = 0) -> list[tuple[str, list[_Level]]]:
    """All root->leaf level chains of a (possibly sibling-forked) bucket
    request.  A level may carry SEVERAL sibling bucket sub-aggs (ES and
    the reference allow arbitrary siblings, aggregation/mod.rs:38-54);
    each sibling forks its own chain.  Returns ``[(suffix, levels)]``:
    the first path has suffix ``""`` (published under the request name,
    the historical single-chain behaviour), later paths carry the
    '.'-joined sibling-branch names (published as ``name.suffix``)."""
    metrics, top_hits, nested = _split_sub_aggs(body.get("aggs"))
    if kind in ("terms", "histogram", "date_histogram"):
        _key, key_name = _bucket_key(kind, body[kind])
        alias = key_name if depth == 0 else f"{name}.{key_name}"
    elif kind == "range":
        alias = "key" if depth == 0 else f"{name}.key"
    else:  # filter / missing add no key column
        alias = None
    lvl = _Level(name, kind, body[kind], alias, metrics, top_hits)
    if not nested:
        return [("", [lvl])]
    out: list[tuple[str, list[_Level]]] = []
    for i, (n_name, n_kind, n_body) in enumerate(nested):
        for suffix, sub in _chain_paths(n_name, n_kind, n_body, depth + 1):
            tag = n_name if i > 0 else ""
            joined = ".".join(x for x in (tag, suffix) if x)
            out.append((joined, [lvl] + sub))
    return out


def _level_metric_cols(levels: list[_Level], upto: int) -> list[Column]:
    cols: list[Column] = []
    for sname, sbody in levels[upto].metrics.items():
        mk = [k for k in sbody if k in METRIC_KINDS][0]
        cols.extend(_metric_cols(sname, mk, sbody[mk]))
    return cols


def _run_chain(df: DataFrame, name: str, kind: str, body: dict,
               max_buckets: int = DEFAULT_BUCKET_LIMIT,
               levels: list[_Level] | None = None,
               ancestor_counts: bool = False) -> DataFrame:
    """Lower ONE bucket chain.  Key columns carry internal dot-free aliases
    (__k0, __k1, ...) while computing — joins by name are then unambiguous
    — and are renamed to their public ``{name}.key`` aliases at the end."""
    if levels is None:
        levels = _chain_paths(name, kind, body)[0][1]

    # ---- pass A: one working frame carrying every level's key column ----
    work = df
    ikeys: list[str] = []          # internal aliases, parallel to pub_keys
    pub_keys: list[str] = []       # public aliases
    key_of_level: dict[int, str] = {}
    for i, lvl in enumerate(levels):
        if lvl.kind == "filter":
            work = work.filter(_filter_pred(lvl.body))
        elif lvl.kind == "missing":
            work = work.filter(F.col(lvl.body["field"]).isNull())
        elif lvl.kind == "range":
            ik = f"__k{len(ikeys)}"
            work = work.withColumn(ik, _range_key(lvl.body)) \
                       .filter(F.col(ik).isNotNull())
            ikeys.append(ik)
            pub_keys.append(lvl.alias)
            key_of_level[i] = ik
        else:
            ik = f"__k{len(ikeys)}"
            key_col, _ = _bucket_key(lvl.kind, lvl.body)
            if lvl.kind == "terms":
                from pyspark.sql.types import TimestampType
                fld = lvl.body.get("field")
                ftypes = {f.name: f.dataType for f in work.schema.fields}
                if isinstance(ftypes.get(fld), TimestampType):
                    # date term keys render RFC3339 (term_agg/mod.rs
                    # terms_aggregation_date: "1982-09-17T00:00:00Z");
                    # the session timezone is pinned UTC.  `missing`
                    # substitutes AFTER formatting so a string
                    # substitute coalesces type-correctly.
                    key_col = F.date_format(
                        F.col(fld), "yyyy-MM-dd'T'HH:mm:ss'Z'")
                    if "missing" in lvl.body:
                        key_col = F.coalesce(
                            key_col, F.lit(str(lvl.body["missing"])))
            # docs MISSING the bucketed field fall out of the bucket set
            # (ES terms/histogram semantics; the `missing` agg is the
            # explicit collector for them)
            work = work.withColumn(ik, key_col) \
                       .filter(F.col(ik).isNotNull())
            ikeys.append(ik)
            pub_keys.append(lvl.alias)
            key_of_level[i] = ik

    leaf = levels[-1]
    # top_hits is only supported as the terminal node of a chain, and not
    # next to sibling metrics — fail loudly instead of silently dropping
    # part of the request (the per-hit output granularity cannot carry
    # per-bucket metric columns coherently)
    for lvl in levels[:-1]:
        if lvl.top_hits is not None:
            raise ValueError(
                f"top_hits sub-agg {lvl.top_hits[0]!r} attached to non-leaf "
                f"level {lvl.name!r}: top_hits must be the deepest node")
    if leaf.top_hits is not None and leaf.metrics:
        raise ValueError(
            f"top_hits {leaf.top_hits[0]!r} cannot share its level with "
            f"metric sub-aggs {sorted(leaf.metrics)}; split the request")

    def _publish(frame: DataFrame) -> DataFrame:
        for ik, pub in zip(ikeys, pub_keys):
            frame = frame.withColumnRenamed(ik, pub)
        return frame

    # ---- top_hits leaf: output granularity is one row per hit ----------
    if leaf.top_hits is not None:
        th_name, th = leaf.top_hits
        size = int(th.get("size", 3))
        order = []
        for spec in th.get("sort", []):
            ((fld, opts),) = spec.items()
            direction = opts.get("order", "asc") if isinstance(opts, dict) else opts
            order.append(F.col(fld).desc() if direction == "desc"
                         else F.col(fld).asc())
        fields = th.get("docvalue_fields", [])
        order += [F.col(f).asc() for f in fields]  # deterministic tie-break
        w = (Window.partitionBy(*ikeys).orderBy(*order) if ikeys
             else Window.orderBy(*order))
        hits = (work.withColumn("__rank", F.row_number().over(w))
                .filter(F.col("__rank") <= size))
        out = hits.select(*ikeys, F.col("__rank").alias(f"{th_name}.rank"),
                          *fields).orderBy(*ikeys, "__rank")
        return _publish(out)

    # ---- pass B: the deepest grouping (the ONE big shuffle) -------------
    grouped = (work.groupBy(*ikeys) if ikeys else work.groupBy()) \
        .agg(F.count(F.lit(1)).alias("doc_count"),
             *_level_metric_cols(levels, len(levels) - 1))
    if not ikeys:  # pure filter/missing chain: single-row result
        return grouped
    if len(levels) == 1 and leaf.kind == "terms":
        # total doc_count across ALL buckets, captured BEFORE the size /
        # min_doc_count selection below prunes any: the ES fold derives
        # an EXACT root sum_other_doc_count from it (bucket/terms.rs
        # accounts cut buckets the same way).  Window over the small
        # bucket frame — bounded by the budget guard.
        grouped = grouped.withColumn(
            "__total_dc",
            F.sum("doc_count").over(Window.partitionBy()))

    # ---- pass C: per-level terms size / min_doc_count, outer -> inner ---
    # A terms level with a size keeps its top-N keys PER PARENT bucket
    # (the ES semantics); selection is computed on the working frame's
    # level-granular counts, then semi-joined into the leaf frame.
    for i, lvl in enumerate(levels):
        if i not in key_of_level or lvl.kind != "terms":
            continue
        upto = ikeys.index(key_of_level[i]) + 1
        keys = ikeys[:upto]
        size = lvl.body.get("size")
        min_dc = int(lvl.body.get("min_doc_count", 1))
        order = lvl.body.get("order")
        if size is None and min_dc <= 1:
            continue
        sel_aggs = [F.count(F.lit(1)).alias("_dc")]
        if order and next(iter(order)) not in ("_count", "_key"):
            # order-by-sub-metric: the selection frame computes the
            # metric per candidate bucket (bucket/terms.rs order path)
            sel_aggs += _level_metric_cols(levels, i)
        counts = work.groupBy(*keys).agg(*sel_aggs)
        if min_dc > 1:
            counts = counts.filter(F.col("_dc") >= min_dc)
        if size is not None:
            parents = keys[:-1]
            w = (Window.partitionBy(*parents) if parents else Window) \
                .orderBy(*_terms_sort_cols(order, keys[-1], "_dc", lvl))
            counts = (counts.withColumn("_rk", F.row_number().over(w))
                      .filter(F.col("_rk") <= int(size)))
        grouped = grouped.join(F.broadcast(counts.select(*keys)),
                               keys, "left_semi")

    # ---- pass D: histogram gap filling at the leaf level ---------------
    # histogram min_doc_count DEFAULTS to 0 (histogram.rs:199-201):
    # empty buckets materialize unless the request filters them
    if leaf.kind == "histogram" and int(leaf.body.get("min_doc_count", 0)) == 0:
        grouped = _fill_histogram_gaps(grouped, leaf, ikeys, max_buckets)
    if leaf.kind == "date_histogram" and "fixed_interval" in leaf.body \
            and int(leaf.body.get("min_doc_count", 0)) == 0:
        grouped = _fill_date_histogram_gaps(grouped, leaf, ikeys, max_buckets)
    if leaf.kind == "histogram" and "hard_bounds" in leaf.body:
        hb = leaf.body["hard_bounds"]
        k = F.col(ikeys[-1])
        grouped = grouped.filter((k >= float(hb["min"])) & (k <= float(hb["max"])))

    # ---- pass E: intermediate-level metrics join on ancestor keys ------
    for i, lvl in enumerate(levels[:-1]):
        if i not in key_of_level or not (lvl.metrics or ancestor_counts):
            continue
        upto = ikeys.index(key_of_level[i]) + 1
        keys = ikeys[:upto]
        aggs = list(_level_metric_cols(levels, i))
        if ancestor_counts:
            # TRUE per-ancestor-bucket doc_count (ES nests one per
            # level; summing children under-counts docs lacking the
            # child field) — used by to_es_json's nested fold
            aggs.append(F.count(F.lit(1)).alias(f"{lvl.name}.doc_count"))
        side = work.groupBy(*keys).agg(*aggs)
        grouped = grouped.join(F.broadcast(side), keys, "left")

    # single-level terms keeps the ES bucket ordering in the flat frame
    if len(levels) == 1 and leaf.kind == "terms":
        size = int(leaf.body.get("size", 10))
        sort_cols = _terms_sort_cols(leaf.body.get("order"), ikeys[0],
                                     "doc_count", leaf)
        return _publish(grouped.orderBy(*sort_cols).limit(size))
    # range levels order by DEFINITION index (bucket/range.rs), other
    # kinds by their key value
    sort_cols = []
    for i, lvl in enumerate(levels):
        if i not in key_of_level:
            continue
        ik = key_of_level[i]
        if lvl.kind == "range":
            sort_cols.append(_range_order_col(lvl.body, F.col(ik)))
        else:
            sort_cols.append(F.col(ik))
    return _publish(grouped.orderBy(*sort_cols))


def _fill_histogram_gaps(grouped: DataFrame, leaf: _Level, ikeys: list[str],
                         max_buckets: int = DEFAULT_BUCKET_LIMIT) -> DataFrame:
    """min_doc_count=0: emit empty buckets across the bucket domain —
    [data min, data max] widened by extended_bounds (histogram.rs:63-129).
    The domain is generated per parent bucket with sequence/explode; no
    driver-side loop, so it scales to any number of parents."""
    interval = float(leaf.body["interval"])
    off = float(leaf.body.get("offset", 0.0))
    eb = leaf.body.get("extended_bounds")
    leaf_key = ikeys[-1]
    parent_keys = ikeys[:-1]

    # work in integer bucket-index space: float key equality across a join
    # is fragile, index equality is exact.  key == index * interval + off
    # (bit-identical to the bucket construction, which produces
    # integral-double-multiples of the interval).
    import math

    g2 = grouped.withColumn(
        "_bi", F.round((F.col(leaf_key) - off) / interval).cast("long"))
    lo_col = F.min(F.col("_bi"))
    hi_col = F.max(F.col("_bi"))
    if eb is not None:
        lo_col = F.least(lo_col, F.lit(int(math.floor((float(eb["min"]) - off) / interval))))
        hi_col = F.greatest(hi_col, F.lit(int(math.floor((float(eb["max"]) - off) / interval))))
    bounds = (g2.groupBy(*parent_keys) if parent_keys else g2.groupBy()) \
        .agg(lo_col.alias("_lo"), hi_col.alias("_hi"))
    # budget guard BEFORE the sequence materializes: a fine interval over a
    # wide range would otherwise explode billions of empty buckets right
    # here.  The guard is a lazy per-parent raise_error — evaluated on the
    # executors inside the same job, no extra action.
    n_dom = F.col("_hi") - F.col("_lo") + F.lit(1)
    bounds = bounds.withColumn(
        "_lo", F.coalesce(_domain_guard(n_dom, max_buckets).cast("long"),
                          F.col("_lo")))
    domain = bounds.select(
        *parent_keys,
        F.explode(F.sequence(F.col("_lo"), F.col("_hi"))).alias("_bi"))
    filled = domain.join(g2.drop(leaf_key), parent_keys + ["_bi"], "left")
    metric_cols = [c for c in grouped.columns if c not in ikeys]
    return filled.select(
        *parent_keys,
        (F.col("_bi").cast("double") * interval + off).alias(leaf_key),
        *[F.coalesce(F.col(f"`{c}`"), F.lit(0)).alias(c) if c == "doc_count"
          else F.col(f"`{c}`") for c in metric_cols])


def _fill_date_histogram_gaps(grouped: DataFrame, leaf: _Level,
                              ikeys: list[str],
                              max_buckets: int = DEFAULT_BUCKET_LIMIT
                              ) -> DataFrame:
    """date_histogram(fixed_interval) min_doc_count=0: emit empty
    buckets across the time domain, widened by ``extended_bounds``
    (epoch seconds or 'yyyy-MM-dd[ HH:mm:ss]' strings) — the same
    distributed sequence/explode shape as the numeric filler, in
    bucket-index space over epoch seconds.  Budget-guarded identically
    (a 1-second interval over a year is 31M buckets — raise, don't
    explode)."""
    secs = _fixed_interval_seconds(leaf.body["fixed_interval"])
    if secs != int(secs):
        raise ValueError("min_doc_count=0 gap filling requires a "
                         "whole-second fixed_interval")
    leaf_key = ikeys[-1]
    parent_keys = ikeys[:-1]

    def _bound_epoch(v) -> int:
        if isinstance(v, (int, float)):
            return int(v)
        from datetime import datetime
        s = str(v)
        fmt = "%Y-%m-%d %H:%M:%S" if " " in s or ":" in s else "%Y-%m-%d"
        return int(datetime.strptime(s, fmt).timestamp())

    d_off = _offset_seconds(leaf.body["offset"]) \
        if "offset" in leaf.body else 0.0
    g2 = grouped.withColumn(
        "_bi", ((F.unix_timestamp(F.col(leaf_key), "yyyy-MM-dd HH:mm:ss")
                 - F.lit(d_off)) / F.lit(secs)).cast("long"))
    lo_col, hi_col = F.min("_bi"), F.max("_bi")
    eb = leaf.body.get("extended_bounds")
    if eb is not None:
        lo_col = F.least(lo_col, F.lit(
            int((_bound_epoch(eb["min"]) - d_off) // secs)))
        hi_col = F.greatest(hi_col, F.lit(
            int((_bound_epoch(eb["max"]) - d_off) // secs)))
    bounds = (g2.groupBy(*parent_keys) if parent_keys else g2.groupBy()) \
        .agg(lo_col.alias("_lo"), hi_col.alias("_hi"))
    n_dom = F.col("_hi") - F.col("_lo") + F.lit(1)
    bounds = bounds.withColumn(
        "_lo", F.coalesce(_domain_guard(n_dom, max_buckets).cast("long"),
                          F.col("_lo")))
    domain = bounds.select(
        *parent_keys,
        F.explode(F.sequence(F.col("_lo"), F.col("_hi"))).alias("_bi"))
    filled = domain.join(g2.drop(leaf_key), parent_keys + ["_bi"], "left")
    metric_cols = [c for c in grouped.columns if c not in ikeys]
    return filled.select(
        *parent_keys,
        F.from_unixtime(F.col("_bi") * int(secs) + F.lit(int(d_off)),
                        "yyyy-MM-dd HH:mm:ss").alias(leaf_key),
        *[F.coalesce(F.col(f"`{c}`"), F.lit(0)).alias(c) if c == "doc_count"
          else F.col(f"`{c}`") for c in metric_cols])


def _run_composite(df: DataFrame, name: str, body: dict) -> DataFrame:
    """Composite agg as a tree node (bucket/composite/mod.rs): multi-source
    ordered buckets, keyset pagination via the after cursor — the predicate
    pushes into the aggregation input, never an OFFSET scan."""
    comp = body["composite"]
    sources = comp["sources"]
    size = int(comp.get("size", 10))
    after = comp.get("after")
    key_aliases: list[str] = []
    work = df
    for src in sources:
        ((sname, sbody),) = src.items()
        ((skind, sdef),) = sbody.items()
        if skind not in ("terms", "histogram", "date_histogram"):
            raise ValueError(f"unsupported composite source {skind}")
        key_col, _ = _bucket_key(skind, {**sdef})
        work = work.withColumn(sname, key_col)
        key_aliases.append(sname)
    if after is not None:
        # keyset cursor: strictly after the tuple, lexicographically
        pred = None
        eq_chain = F.lit(True)
        for a in key_aliases:
            gt = eq_chain & (F.col(a) > F.lit(after[a]))
            pred = gt if pred is None else pred | gt
            eq_chain = eq_chain & (F.col(a) == F.lit(after[a]))
        work = work.filter(pred)
    metrics, top_hits, nested = _split_sub_aggs(body.get("aggs"))
    if nested or top_hits is not None:
        raise ValueError("composite supports metric sub-aggs only")
    mcols: list[Column] = []
    for sname, sbody in metrics.items():
        mk = [k for k in sbody if k in METRIC_KINDS][0]
        mcols.extend(_metric_cols(sname, mk, sbody[mk]))
    return (work.groupBy(*key_aliases)
            .agg(F.count(F.lit(1)).alias("doc_count"), *mcols)
            .orderBy(*key_aliases).limit(size))


def _validate_budget(request: dict, max_buckets: int) -> None:
    """Static (request-shape) budget check: any explicitly requested
    bucket count past budget fails at build time, before any job runs
    (the reference's guard also rejects on the request, agg_limits.rs)."""
    for name, body in request.items():
        if not isinstance(body, dict):
            continue
        for kind in ("terms", "composite"):
            size = body.get(kind, {}).get("size") if isinstance(
                body.get(kind), dict) else None
            if size is not None and int(size) > max_buckets:
                raise AggregationLimitsError(
                    f"{kind} agg {name!r} requests size={size} > "
                    f"max_buckets={max_buckets}")
        hist = body.get("histogram")
        if isinstance(hist, dict) and "extended_bounds" in hist:
            eb = hist["extended_bounds"]
            n = (float(eb["max"]) - float(eb["min"])) / float(hist["interval"])
            if n > max_buckets:
                raise AggregationLimitsError(
                    f"histogram agg {name!r} extended_bounds span "
                    f"{int(n)} buckets > max_buckets={max_buckets}")
        _validate_budget(body.get("aggs") or {}, max_buckets)


def _resolve_json_fields(df: DataFrame,
                         request: dict) -> tuple[DataFrame, dict]:
    """Dynamic JSON field addressing in agg requests (agg_tests.rs
    test_aggregation_on_json_object: ``{"terms": {"field":
    "json.color"}}`` aggregates the values under a path of the json
    FIELD; ``\\.`` escapes literal dots in segments).  A dotted field
    whose root is a STRING column lowers to ``get_json_object`` with
    bracket-path addressing — one synthesized column per distinct path,
    cast to double where the consuming agg is numeric.  Real columns
    and struct traversals are left untouched."""
    import copy

    from pyspark.sql.types import StringType

    req = copy.deepcopy(request)
    adds: dict[str, Column] = {}
    str_cols = {f.name for f in df.schema.fields
                if isinstance(f.dataType, StringType)}

    def _json_path(field: str) -> tuple[str, str] | None:
        """-> (unescaped column name, json path) for json-addressed
        fields, None for plain columns."""
        if not isinstance(field, str) or field in df.columns:
            return None
        segs = [s.replace("\\.", ".")
                for s in _re.split(r"(?<!\\)\.", field)]
        if len(segs) < 2 or segs[0] not in str_cols:
            return None
        return segs[0], "$" + "".join(f"['{s}']" for s in segs[1:])

    def resolve(field: str, numeric: bool) -> str:
        hit = _json_path(field)
        if hit is None:
            return field
        colname, path = hit
        key = f"__jf{len(adds)}_{'n' if numeric else 's'}"
        col = F.get_json_object(F.col(f"`{colname}`"), path)
        # try_cast: json values of the wrong type (a string under a
        # numeric agg) become NULL and drop out, like the reference's
        # typed columnar readers — a plain cast would throw under ANSI
        adds[key] = col.try_cast("double") if numeric else col
        return key

    def resolve_typed(field: str) -> str:
        """Terms on a json path keep TYPED buckets (agg_tests.rs:
        1358-1461 mixed types, :1463-1518 mixed numerical segments):
        the key column carries a type tag + canonical rendering —
        integral numbers unify as i64 regardless of the source segment
        writing 10 or 10.0 (the reference's columnar numerical
        coercion), non-integral numbers stay f64, booleans keep their
        own buckets.  The ES fold (_fold_nested) decodes the tag back
        into typed JSON keys; flat consumers see the tagged string."""
        hit = _json_path(field)
        if hit is None:
            return field
        colname, path = hit
        key = f"__jf{len(adds)}_t"
        v = F.try_parse_json(F.col(f"`{colname}`"))
        typ = F.schema_of_variant(F.try_variant_get(v, path, "variant"))
        vstr = F.try_variant_get(v, path, "string")
        d = F.try_variant_get(v, path, "double")
        sep = F.lit(TYPED_KEY_SEP)
        adds[key] = (
            F.when(typ == "STRING", F.concat(F.lit("s"), sep, vstr))
            .when(typ == "BOOLEAN", F.concat(F.lit("b"), sep, vstr))
            .when(typ == "BIGINT", F.concat(F.lit("i"), sep, vstr))
            # parse_json renders decimal-literal numbers as DECIMAL:
            # scale-0 decimals are integral and already display as i64
            .when(typ.rlike(r"^DECIMAL\(\d+,0\)$"),
                  F.concat(F.lit("i"), sep, vstr))
            .when(typ.isNotNull() & (typ != "VOID") & d.isNotNull(),
                  # DOUBLE-typed variants (exponent-notation JSON):
                  # integral values inside i64 range unify as i64 like
                  # the reference's columnar coercion; the bound guard
                  # keeps the long cast from overflowing under ANSI
                  F.when((d == F.floor(d))
                         & (F.abs(d) < F.lit(9.223372036854776e18)),
                         F.concat(F.lit("i"), sep,
                                  d.cast("long").cast("string")))
                  .otherwise(F.concat(F.lit("f"), sep,
                                      d.cast("string")))))
        return key

    def walk(body: dict) -> None:
        for k, v in list(body.items()):
            if not isinstance(v, dict):
                continue
            if k == "terms" and "field" in v:
                resolved = resolve_typed(v["field"])
                if resolved != v["field"]:
                    v["__typed_key"] = True
                v["field"] = resolved
            elif k == "date_histogram" and "field" in v:
                v["field"] = resolve(v["field"], False)
            elif (k in ("histogram", "range") or k in METRIC_KINDS) \
                    and "field" in v:
                v["field"] = resolve(v["field"], True)
            elif k == "composite":
                for src in v.get("sources", []):
                    for sbody in src.values():
                        for skind, sdef in sbody.items():
                            if isinstance(sdef, dict) and "field" in sdef:
                                sdef["field"] = resolve(
                                    sdef["field"], skind == "histogram")
            if k == "aggs":
                for sub in v.values():
                    walk(sub)

    for body in req.values():
        if isinstance(body, dict):
            walk(body)
    if adds:
        for key, col in adds.items():
            df = df.withColumn(key, col)
    return df, req


def _explode_array_fields(df: DataFrame, name: str, body: dict) -> DataFrame:
    """MULTI-VALUED fast-field aggregation (ref: the reference's
    ``Cardinality::Multivalued`` fast-field columns — its aggregators
    iterate ``values_for_doc`` and collect once PER VALUE OCCURRENCE,
    so a doc holding [5, 5] adds 2 to the 5-bucket): an ``array<T>``
    column referenced by this aggregation chain is exploded to one row
    per value before bucketing/metrics.  ``explode_outer`` keeps
    no-value docs as NULL rows, so ES null-drop and the ``missing``
    substitute keep their scalar-column semantics.

    Exploding happens PER TOP-LEVEL CHAIN (each chain gets its own
    frame), so sibling aggregations over other fields never see the
    row multiplication.  A chain referencing TWO different array
    fields would need per-field independent value lists — a
    cross-product explode would miscount — so that raises."""
    from pyspark.sql.types import ArrayType

    arr_cols = {f.name for f in df.schema.fields
                if isinstance(f.dataType, ArrayType)}
    if not arr_cols:
        return df

    used: set[str] = set()

    def walk(b: dict) -> None:
        for k, v in b.items():
            if k == "aggs" and isinstance(v, dict):
                for sub in v.values():
                    walk(sub)
            elif isinstance(v, dict):
                f = v.get("field")
                if isinstance(f, str) and f in arr_cols:
                    used.add(f)

    walk(body)
    if not used:
        return df
    if len(used) > 1:
        raise ValueError(
            f"aggregation {name!r} references multiple multi-valued "
            f"fields {sorted(used)}; one chain supports at most one")
    fld = used.pop()
    return df.withColumn(fld, F.explode_outer(F.col(f"`{fld}`")))


def run_agg_tree(df: DataFrame, request: dict,
                 max_buckets: int = DEFAULT_BUCKET_LIMIT,
                 nested: bool = False) -> dict[str, DataFrame]:
    """Execute an ES-style aggregation request; returns one DataFrame per
    top-level aggregation name (flat leaf-bucket convention, see module
    docstring).

    ``max_buckets`` is the per-request bucket budget (reference:
    agg_limits.rs AggregationLimitsGuard, default 65k): requests whose
    SHAPE already exceeds it raise here; data-dependent overruns (wide
    gap-filled histogram domains) raise lazily on the executors via a
    plan-embedded guard; and ``to_es_json`` re-checks the realized total
    before collecting to the driver.

    ``nested=True`` additionally attaches a TRUE per-ancestor-bucket
    ``{level}.doc_count`` column at every intermediate key level (one
    tiny broadcast join each), which ``to_es_json(..., request=...)``
    folds into the fully nested ES response shape."""
    _validate_budget(request, max_buckets)
    base_df, request = _resolve_json_fields(df, request)
    out: dict[str, DataFrame] = {}
    for name, body in request.items():
        df = _explode_array_fields(base_df, name, body)
        _validate_fields(df, {name: body})
        kinds = [k for k in body if k in BUCKET_KINDS + METRIC_KINDS + ("top_hits",)]
        if not kinds:
            raise ValueError(f"no recognized agg in {name}")
        kind = kinds[0]
        if kind == "top_hits":
            # top-level top_hits: a single implicit all-docs bucket
            out[name] = _run_chain(
                df, name, "filter",
                {"filter": {"range": {df.columns[0]: {}}},
                 "aggs": {name: {"top_hits": body["top_hits"]}}})
            continue
        if kind in METRIC_KINDS:
            out[name] = df.agg(*_metric_cols(name, kind, body[kind]))
            continue
        if kind == "composite":
            out[name] = _run_composite(df, name, body)
            continue
        if kind in ("filter", "missing") and not body.get("aggs"):
            base = (df.filter(_filter_pred(body["filter"])) if kind == "filter"
                    else df.filter(F.col(body[kind]["field"]).isNull()))
            out[name] = base.agg(F.count(F.lit(1)).alias("doc_count"))
            continue
        for suffix, levels in _chain_paths(name, kind, body):
            key = name if not suffix else f"{name}.{suffix}"
            out[key] = _run_chain(df, name, kind, body, max_buckets,
                                  levels=levels, ancestor_counts=nested)
    return out


def _terms_bucket_sort(buckets: list[dict], body: dict) -> list[dict]:
    """ES terms bucket ordering (bucket/terms.rs): default _count desc
    with _key asc tie-break; explicit _key / _count orders honoured.
    Metric orders keep arrival order (already selection-sorted)."""
    order = body.get("order") or {"_count": "desc"}
    (tgt, direction), = order.items()
    if tgt == "_key":
        # typed json term keys can mix numbers and strings in one
        # bucket list — rank numerically first, then lexically, so the
        # sort is total (mixed-type int<str comparisons would raise)
        def krank(b):
            k = b.get("key")
            return ((0, float(k), "") if isinstance(k, (int, float))
                    and not isinstance(k, bool) else (1, 0.0, str(k)))
        return sorted(buckets, key=krank, reverse=(direction == "desc"))
    if tgt == "_count":
        return sorted(buckets,
                      key=lambda b: (-b.get("doc_count", 0)
                                     if direction == "desc"
                                     else b.get("doc_count", 0),
                                     str(b.get("key"))))
    return buckets


def _terms_container(buckets: list[dict], body: dict,
                     parent_count: int | None,
                     root: bool = False) -> dict:
    """The ES terms result object: ordered buckets + sum_other_doc_count
    (docs in buckets beyond the returned set — parent total minus the
    visible sum; exact for non-null fields, the reference counts the
    same way per segment, bucket/terms.rs).  At the ROOT the error
    bound rides along only when show_term_doc_count_error holds, which
    "defaults to true when ordering by count desc" (term_agg/mod.rs:227;
    custom-ordered responses omit it, agg_tests.rs:1447 vs :1506)."""
    out: dict = {"buckets": _terms_bucket_sort(buckets, body)}
    if parent_count is not None:
        vis = sum(b.get("doc_count") or 0 for b in buckets)
        out["sum_other_doc_count"] = max(0, parent_count - vis)
    elif body.get("size") is None or len(buckets) < int(body["size"]):
        out["sum_other_doc_count"] = 0
    if root and "sum_other_doc_count" in out \
            and _show_doc_count_error(body):
        # exact global selection: the upper bound on per-bucket count
        # error is genuinely 0 (no per-segment cutoffs to sum)
        out["doc_count_error_upper_bound"] = 0
    return out


def _show_doc_count_error(body: dict) -> bool:
    v = body.get("show_term_doc_count_error")
    if v is not None:
        return bool(v)
    order = body.get("order")
    if not order:
        return True
    (tgt, direction), = order.items()
    return tgt == "_count" and direction == "desc"


def _range_fill(buckets: list[dict], body: dict,
                metric_names=()) -> list[dict]:
    """Every DEFINED range emits a bucket, empty ones with doc_count 0,
    in definition order with their bounds (bucket/range.rs — the
    reference materializes the full range set per parent).  Synthetic
    empties carry null metric values like the reference's
    (agg_tests.rs level2: empty range bucket -> {"value": null})."""
    by_key = {b.get("key"): b for b in buckets}
    out = []
    for r in _extend_ranges(body):
        lbl = _range_label(r)
        b = by_key.get(lbl)
        if b is None:
            b = {"key": lbl, "doc_count": 0}
            if r.get("from") is not None:
                b["from"] = float(r["from"])
            if r.get("to") is not None:
                b["to"] = float(r["to"])
            for m in metric_names:
                b[m] = {"value": None}
        out.append(b)
    return out


def _hist_fill_folded(buckets: list[dict], lvl: _Level,
                      child_name: str | None) -> list[dict]:
    """INTERIOR-level histogram gap fill (histogram.rs:848 fills per
    aggregation instance at EVERY level; the distributed filler
    handles the leaf, this driver-side pass handles parents after the
    fold): missing grid keys between the realized min/max (widened by
    extended_bounds) materialize with doc_count 0 and an empty child
    container.  Bounded by the same bucket budget as the leaf path."""
    interval = float(lvl.body["interval"])
    off = float(lvl.body.get("offset", 0.0))
    keys = [float(b["key"]) for b in buckets]
    lo, hi = min(keys), max(keys)
    eb = lvl.body.get("extended_bounds")
    if eb is not None:
        import math
        lo = min(lo, math.floor((float(eb["min"]) - off) / interval)
                 * interval + off)
        hi = max(hi, math.floor((float(eb["max"]) - off) / interval)
                 * interval + off)
    n = int(round((hi - lo) / interval)) + 1
    if n > DEFAULT_BUCKET_LIMIT:
        raise AggregationLimitsError(
            f"histogram gap fill would create {n} buckets "
            f"> max_buckets={DEFAULT_BUCKET_LIMIT}")
    by_key = {float(b["key"]): b for b in buckets}
    out = []
    for i in range(n):
        k = lo + i * interval
        b = by_key.get(k)
        if b is None:
            b = {"key": k, "doc_count": 0}
            if child_name is not None:
                b[child_name] = {"buckets": []}
        out.append(b)
    return out


_CAL_FORMATS = {"day": "%Y-%m-%d", "month": "%Y-%m", "year": "%Y",
                "hour": "%Y-%m-%d %H"}


def _date_cal_fill_folded(buckets: list[dict], lvl: _Level,
                          child_name: str | None) -> list[dict]:
    """Calendar date_histogram gap fill at fold time (min_doc_count=0):
    missing calendar steps between the realized min/max keys
    materialize with doc_count 0 — the calendar twin of the
    fixed-interval filler (which runs distributively at the leaf).
    Bounded by the bucket budget."""
    from datetime import datetime, timedelta, timezone

    unit = lvl.body.get("calendar_interval", "day")
    fmt = _CAL_FORMATS[unit]
    keys = sorted(b["key_as_string"] for b in buckets)
    by_key = {b["key_as_string"]: b for b in buckets}

    def parse(s):
        return datetime.strptime(s, fmt).replace(tzinfo=timezone.utc)

    def step(dt_):
        if unit == "hour":
            return dt_ + timedelta(hours=1)
        if unit == "day":
            return dt_ + timedelta(days=1)
        if unit == "month":
            y, m = dt_.year + (dt_.month // 12), dt_.month % 12 + 1
            return dt_.replace(year=y, month=m)
        return dt_.replace(year=dt_.year + 1)

    out = []
    cur, end = parse(keys[0]), parse(keys[-1])
    while cur <= end:
        if len(out) > DEFAULT_BUCKET_LIMIT:
            raise AggregationLimitsError(
                f"calendar gap fill exceeds max_buckets="
                f"{DEFAULT_BUCKET_LIMIT}")
        k = cur.strftime(fmt)
        b = by_key.get(k)
        if b is None:
            b = {"key_as_string": k, "doc_count": 0}
            if child_name is not None:
                b[child_name] = {"buckets": []}
        out.append(b)
        cur = step(cur)
    return out


def _bucket_container(buckets: list[dict], kind: str, body: dict) -> dict:
    """Bucket list -> the ES container shape, honouring ``keyed: true``
    (bucket/range.rs:90, histogram.rs:148): keyed responses map the
    bucket key string to the bucket (key kept inside), range keys by
    label, histogram by the Rust-Display number, date by
    key_as_string."""
    if not body.get("keyed"):
        return {"buckets": buckets}
    if kind == "histogram":
        return {"buckets": {_fmt_bound(b["key"]): b for b in buckets}}
    if kind == "date_histogram":
        return {"buckets": {b["key_as_string"]: b for b in buckets}}
    return {"buckets": {b["key"]: b for b in buckets}}


def _fold_nested(rows: list[dict], levels: list[_Level]) -> list[dict]:
    """Recursive flat-rows -> nested-ES-buckets fold for one key chain.
    Rows must arrive ordered by the ancestor keys (run_agg_tree output
    order)."""
    from itertools import groupby

    lvl = levels[0]
    key_alias = lvl.alias
    key_name = "key_as_string" if "key_as_string" in key_alias else "key"
    # terms keys may arrive TAGGED from resolve_typed (json-path terms;
    # the caller's request still shows the dotted field, so detection
    # is by the tag pattern — \x1f at index 1 cannot occur in real keys)
    typed = lvl.kind == "terms"
    out = []
    for kval, grp_it in groupby(rows, key=lambda r: r[key_alias]):
        grp = list(grp_it)
        if typed and isinstance(kval, bool):
            # bool-column term buckets: key 1/0 + key_as_string
            # (term_agg/mod.rs terms_aggregation_bool)
            b: dict = {"key": 1 if kval else 0,
                       "key_as_string": "true" if kval else "false"}
        elif typed:
            b = _decode_typed_key(kval)
        else:
            b = {key_name: kval}
        if len(levels) == 1:
            b["doc_count"] = grp[0].get("doc_count")
        else:
            cnt = grp[0].get(f"{lvl.name}.doc_count")
            b["doc_count"] = cnt if cnt is not None else \
                sum(r.get("doc_count", 0) for r in grp)
        if lvl.kind == "date_histogram" and isinstance(kval, str):
            # ES date buckets carry BOTH key (epoch millis, f64) and
            # key_as_string (date_histogram.rs:87: millisecond keys);
            # the session timezone is pinned UTC (session.py), so the
            # string parses back exactly
            try:
                from datetime import datetime, timezone
                fmt = "%Y-%m-%d %H:%M:%S" if " " in kval else (
                    "%Y-%m-%d" if kval.count("-") == 2 else None)
                if fmt:
                    ts = datetime.strptime(kval, fmt).replace(
                        tzinfo=timezone.utc)
                    b["key"] = ts.timestamp() * 1000.0
            except ValueError:
                pass
        if lvl.kind == "range":
            spec = next((r for r in _extend_ranges(lvl.body)
                         if _range_label(r) == kval), None)
            if spec is not None:          # ES range buckets carry bounds
                if spec.get("from") is not None:
                    b["from"] = float(spec["from"])
                if spec.get("to") is not None:
                    b["to"] = float(spec["to"])
        for mname, mbody in lvl.metrics.items():
            stats = {c.split(".", 1)[1]: grp[0][c] for c in grp[0]
                     if c.startswith(mname + ".")
                     and c != f"{mname}.doc_count"}
            if stats:
                mk = next(k for k in mbody if k in METRIC_KINDS)
                if mk == "percentiles":   # ES: {"values": {"50.0": v}}
                    b[mname] = _percentiles_values(
                        stats, bool(mbody[mk].get("keyed", True)))
                else:
                    b[mname] = _nest_dotted(stats)
        if len(levels) > 1:
            child = levels[1]
            sub = _fold_nested(grp, levels[1:])
            if child.kind == "terms":
                b[child.name] = _terms_container(sub, child.body,
                                                 b.get("doc_count"))
            elif child.kind == "range":
                b[child.name] = _bucket_container(
                    _range_fill(sub, child.body, tuple(child.metrics)),
                    "range", child.body)
            else:
                b[child.name] = _bucket_container(sub, child.kind,
                                                  child.body)
        out.append(b)
    if lvl.kind == "terms":
        out = _terms_bucket_sort(out, lvl.body)
    if lvl.kind == "histogram" and len(levels) > 1 and out \
            and int(lvl.body.get("min_doc_count", 0)) == 0:
        # parent histogram levels gap-fill here (leaf levels were
        # filled distributively in pass D of _run_chain)
        out = _hist_fill_folded(out, lvl, levels[1].name)
    if lvl.kind == "date_histogram" and "calendar_interval" in lvl.body \
            and out and int(lvl.body.get("min_doc_count", 0)) == 0:
        child = levels[1].name if len(levels) > 1 else None
        out = _date_cal_fill_folded(out, lvl, child)
    return out


def _percentiles_values(stats: dict, keyed: bool = True) -> dict:
    """Percentile columns -> the ES percentiles result shape:
    ``{"values": {"50.0": v, ...}}`` when keyed (the default), or the
    ``keyed: false`` array form ``{"values": [{"key": 50.0, "value": v},
    ...]}`` (metric/percentiles.rs response modes).  The sketch path's
    ``values`` array is left as-is (its percents live in the request)."""
    if set(stats) == {"values"}:
        return stats
    if keyed:
        return {"values": {f"{float(p)}": v for p, v in stats.items()}}
    return {"values": sorted(({"key": float(p), "value": v}
                              for p, v in stats.items()),
                             key=lambda d: d["key"])}


def _nest_dotted(flat: dict) -> dict:
    """``{"std_deviation_bounds.upper": v}`` -> ``{"std_deviation_bounds":
    {"upper": v}}`` — the ES sub-object shape for compound metric fields
    (extended_stats.rs:103-118)."""
    out: dict = {}
    for k, v in flat.items():
        if "." in k:
            head, tail = k.split(".", 1)
            out.setdefault(head, {})[tail] = v
        else:
            out[k] = v
    return out


def to_es_json(results: dict[str, DataFrame],
               max_buckets: int = DEFAULT_BUCKET_LIMIT,
               request: dict | None = None) -> dict:
    """Fold flat bucket DataFrames into the ES response shape.

    Without ``request``, multi-level chains stay FLAT (one row per
    deepest bucket, ancestor keys as columns — the documented
    convention).  WITH ``request`` (and frames produced by
    ``run_agg_tree(..., nested=True)`` for true ancestor doc_counts),
    single-path key chains fold into the fully NESTED ES buckets shape:
    per-level doc_count, per-level metrics, child buckets under the
    child's name.

    Collect-time budget guard (agg_limits.rs): the realized bucket count
    is bounded distributedly (``limit(max+1).count()`` — short-circuits,
    never materializes more than budget+1 rows) BEFORE anything is
    collected to the driver."""
    resp: dict = {}
    for name, df in results.items():
        n = df.limit(max_buckets + 1).count()
        if n > max_buckets:
            raise AggregationLimitsError(
                f"aggregation {name!r} produced > max_buckets="
                f"{max_buckets} buckets; refusing to collect")
        rows = [r.asDict() for r in df.collect()]
        total_dc = rows[0].get("__total_dc") if rows else None
        rows = [{k: v for k, v in r.items() if k != "__total_dc"}
                for r in rows]
        levels = None
        if request is not None and "." not in name and name in request \
                and "composite" in request[name]:
            # ES composite shape (bucket/composite/mod.rs): buckets carry
            # a key STRUCT of the source values; after_key = the last
            # bucket's key, the cursor for the next page
            srcs = [next(iter(s)) for s in
                    request[name]["composite"]["sources"]]
            buckets = [{"key": {s: r[s] for s in srcs},
                        **{c: r[c] for c in r if c not in srcs}}
                       for r in rows]
            resp[name] = {"buckets": buckets}
            if buckets:
                resp[name]["after_key"] = buckets[-1]["key"]
            continue
        if request is not None and "." not in name and name in request:
            body = request[name]
            kinds = [k for k in body if k in BUCKET_KINDS]
            if kinds and kinds[0] != "composite":
                paths = _chain_paths(name, kinds[0], body)
                only = paths[0][1] if len(paths) == 1 else None
                # fold only pure key chains (every level adds a key)
                if only is not None and all(lv.alias for lv in only) \
                        and not any(lv.top_hits for lv in only):
                    levels = only
        if levels is not None:
            folded = _fold_nested(rows, levels)
            if levels[0].kind == "terms":
                resp[name] = _terms_container(folded, levels[0].body,
                                              total_dc, root=True)
            elif levels[0].kind == "range":
                resp[name] = _bucket_container(
                    _range_fill(folded, levels[0].body,
                                tuple(levels[0].metrics)),
                    "range", levels[0].body)
            else:
                resp[name] = _bucket_container(folded, levels[0].kind,
                                               levels[0].body)
        elif rows and ("key" in rows[0] or "key_as_string" in rows[0]):
            resp[name] = {"buckets": rows}
        elif rows and all(c.startswith(name + ".") for c in rows[0]):
            # top-level metric: strip the agg-name prefix and nest
            # compound sub-fields — ES returns {"count": .., "avg": ..,
            # "std_deviation_bounds": {"upper": ..}} under the agg name
            flat = {c.split(".", 1)[1]: v for c, v in rows[0].items()}
            if request is not None and "percentiles" in request.get(
                    name, {}):
                resp[name] = _percentiles_values(
                    flat, bool(request[name]["percentiles"]
                               .get("keyed", True)))
            else:
                resp[name] = _nest_dotted(flat)
        else:
            resp[name] = rows[0] if rows else {}
    return resp
