"""Event-time windowed text analytics over document streams.

The reference is batch-only (its ingestion loop micro-batches through
IndexWriter commits, ARCHITECTURE.md:31-53); this module is the
Spark-FIRST streaming layer on top of the same analyzer chain: windowed
term frequencies and document stats with WATERMARKED late-data handling
(Structured Streaming windowed aggregation), and a custom stateful
sessionizer via ``applyInPandasWithState``.

Scale shape: the tokenizer is the same codegen'd JVM expression the
index build uses (analyzer.tokens_col — no Python in the hot path);
windowed aggregations are hash-partial per micro-batch with state kept
in the state store keyed by (window, term), so a 1000-executor stream
shards state exactly like a static groupBy would.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tantivy_spark.analyzer import tokens_col


def windowed_term_counts(stream: DataFrame, ts_col: str = "ts",
                         text_col: str = "text",
                         window: str = "1 minute",
                         slide: str | None = None,
                         watermark: str = "2 minutes") -> DataFrame:
    """Term frequencies per event-time window with a watermark: late
    rows inside the watermark still update their window; older ones are
    dropped (exactly-once per window on replayable sources).  Output:
    (window struct, term, tf)."""
    win = (F.window(F.col(ts_col), window, slide) if slide
           else F.window(F.col(ts_col), window))
    return (stream.withWatermark(ts_col, watermark)
            .select(F.col(ts_col),
                    F.explode(tokens_col(F.col(text_col))).alias("term"))
            .groupBy(win.alias("window"), "term")
            .agg(F.count(F.lit(1)).alias("tf")))


def windowed_doc_stats(stream: DataFrame, ts_col: str = "ts",
                       text_col: str = "text",
                       window: str = "1 minute",
                       watermark: str = "2 minutes") -> DataFrame:
    """Per-window document stats (docs, total/avg token count) — the
    streaming twin of pipeline.textstats.token_counts."""
    n_tokens = F.size(tokens_col(F.col(text_col)))
    return (stream.withWatermark(ts_col, watermark)
            .groupBy(F.window(F.col(ts_col), window).alias("window"))
            .agg(F.count(F.lit(1)).alias("docs"),
                 F.sum(n_tokens).alias("total_tokens"),
                 F.avg(n_tokens).alias("avg_tokens")))


#: output schema of :func:`sessionize`
SESSION_SCHEMA = ("key STRING, session_start TIMESTAMP, "
                  "session_end TIMESTAMP, n_events BIGINT")
_STATE_SCHEMA = "start DOUBLE, last DOUBLE, n BIGINT"


def _session_fn(gap_seconds: float):
    """Builds the applyInPandasWithState update function: classic
    gap-timeout sessionization.  State = (start, last, n) per key; a
    batch's events extend the open session or close it and open a new
    one; the processing-time timeout flushes sessions idle past the
    gap."""

    def update(key: tuple, pdfs: Iterable[pd.DataFrame], state) -> \
            Iterable[pd.DataFrame]:
        from pyspark.sql.streaming.state import GroupStateTimeout  # noqa: F401

        closed = []
        if state.hasTimedOut:
            start, last, n = state.get
            closed.append((key[0], start, last, n))
            state.remove()
        else:
            ts = sorted(float(t)
                        for pdf in pdfs
                        for t in pdf["ts_sec"].tolist())
            if ts:
                if state.exists:
                    start, last, n = state.get
                else:
                    start, last, n = ts[0], ts[0], 0
                for t in ts:
                    if t - last > gap_seconds:
                        closed.append((key[0], start, last, n))
                        start, n = t, 0
                    last = t
                    n += 1
                state.update((start, last, n))
                state.setTimeoutDuration(int(gap_seconds * 1000))
        out = pd.DataFrame(closed, columns=["key", "start_sec",
                                            "last_sec", "n_events"])
        out["session_start"] = pd.to_datetime(out["start_sec"], unit="s")
        out["session_end"] = pd.to_datetime(out["last_sec"], unit="s")
        yield out[["key", "session_start", "session_end", "n_events"]]

    return update


def sessionize(stream: DataFrame, key_col: str = "user_id",
               ts_col: str = "ts",
               gap: str = "30 seconds") -> DataFrame:
    """Custom stateful operator (``applyInPandasWithState``): split each
    key's event stream into sessions separated by more than ``gap`` of
    event-time silence.  Emits one row per CLOSED session (idle sessions
    flush on the processing-time timeout).  This is the repo's template
    for stateful operators Spark lacks natively — the state store shards
    by key, so it scales like any keyed aggregation."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_seconds = _parse_duration_seconds(gap)
    prepared = stream.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(ts_col).cast("double").alias("ts_sec"))
    return prepared.groupBy("key").applyInPandasWithState(
        _session_fn(gap_seconds),
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout)


def _parse_duration_seconds(spec: str) -> float:
    qty, unit = spec.split()
    mult = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
            "hour": 3600, "hours": 3600, "millisecond": 0.001,
            "milliseconds": 0.001}[unit]
    return float(qty) * mult
