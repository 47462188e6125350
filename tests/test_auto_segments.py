"""Memory-budgeted auto segment sizing (ref: index_writer.rs:182-195,
274-299 — the reference flushes segments on a per-writer-thread memory
budget, so no corpus size can exhaust a writer's RAM; the Spark
analogue derives n_segments from corpus stats so one segment kernel's
working set stays bounded)."""

import pytest

from tantivy_spark.index.build import (
    DEFAULT_KERNEL_TEXT_BUDGET,
    MIN_AUTO_SEGMENTS,
    IndexConfig,
    build_index,
    resolve_n_segments,
)


def _docs(spark, n, doc_bytes=100):
    return spark.range(n).selectExpr(
        "cast(id as string) as url",
        f"repeat('x', {doc_bytes}) as text")


def test_small_corpus_resolves_to_historical_default(spark):
    cfg = resolve_n_segments(spark, _docs(spark, 200), IndexConfig())
    assert cfg.n_segments == MIN_AUTO_SEGMENTS == 8


def test_explicit_count_passes_through(spark):
    cfg = resolve_n_segments(spark, _docs(spark, 200),
                             IndexConfig(n_segments=3))
    assert cfg.n_segments == 3


def test_budget_scales_segment_count(spark, monkeypatch):
    # 1000 docs x 100 bytes = 100_000 text bytes; 30_000-byte budget
    # -> ceil(100000/30000) = 4, widened/aligned to the local[8] test
    # session width -> 8; 8_000-byte budget -> ceil = 13, wave-aligned
    # up to the next multiple of 8 -> 16 (smaller kernels, full waves)
    monkeypatch.setenv("SPARK_GRAFT_KERNEL_TEXT_BUDGET", "30000")
    cfg = resolve_n_segments(spark, _docs(spark, 1000), IndexConfig())
    assert cfg.n_segments == 8
    monkeypatch.setenv("SPARK_GRAFT_KERNEL_TEXT_BUDGET", "8000")
    cfg = resolve_n_segments(spark, _docs(spark, 1000), IndexConfig())
    assert cfg.n_segments == 16


def test_default_budget_picks_safe_shape_at_probe_scale(spark):
    """The 16M-doc SCALE_PROBE shapes that OOM-killed the box (32
    kernels at ~300 MB text each in r6; ~132 MB each in r7) must not be
    what auto sizing picks: at the measured corpus (16M docs x ~406
    bytes = 6.5 GB text), ceil(6.5e9 / 64 MiB) = 97 segments (~67 MB
    text/kernel, ~165k docs/kernel) — comfortably under the ~250k
    docs/kernel shape the r6 probe showed completes."""
    est = 16_000_000 * 406
    n = -(-est // DEFAULT_KERNEL_TEXT_BUDGET)
    assert n >= 90          # well below the OOM shapes
    assert est / n <= DEFAULT_KERNEL_TEXT_BUDGET
    assert 16_000_000 / n <= 250_000   # docs/kernel under the proven bound


def test_segment_expr_requires_explicit_count(spark):
    with pytest.raises(ValueError, match="segment_expr"):
        resolve_n_segments(spark, _docs(spark, 10),
                           IndexConfig(segment_expr="0"))


def test_auto_build_end_to_end(spark, tmp_path, monkeypatch):
    """Default config (n_segments=None) builds with the derived count
    and records it in the manifest."""
    monkeypatch.setenv("SPARK_GRAFT_KERNEL_TEXT_BUDGET", "2000")
    # 20_000 bytes -> ceil/2000 = 10, wave-aligned to 2x8 = 16
    df = _docs(spark, 200, doc_bytes=100)
    manifest = build_index(spark, df, str(tmp_path / "idx"),
                           IndexConfig(), resume=False)
    assert manifest["config"]["n_segments"] == 16
    assert manifest["totals"]["num_segments"] == 16
    assert manifest["totals"]["num_docs"] == 200


def test_multifield_sizing_sums_all_text_columns(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_KERNEL_TEXT_BUDGET", "10000")
    df = spark.range(500).selectExpr(
        "cast(id as string) as url",
        "repeat('a', 60) as title", "repeat('b', 140) as body")
    cfg = IndexConfig(field_cols={"title": "title", "body": "body"})
    # 500 x 200 = 100_000 -> ceil/10000 = 10, wave-aligned to 16
    assert resolve_n_segments(spark, df, cfg).n_segments == 16


def test_width_floor_fills_cluster(spark, monkeypatch):
    """When the budget count would idle cores and each kernel still
    gets >= budget/8 of text, auto sizing widens to the session width
    (pinnable via SPARK_GRAFT_AUTO_WIDTH)."""
    monkeypatch.setenv("SPARK_GRAFT_KERNEL_TEXT_BUDGET", "8000")
    monkeypatch.setenv("SPARK_GRAFT_AUTO_WIDTH", "16")
    # 1000 x 100 = 100_000 bytes: by_budget = 13 < 16 and
    # 100_000 >= (8000/8) * 16 = 16_000 -> widen to 16
    cfg = resolve_n_segments(spark, _docs(spark, 1000), IndexConfig())
    assert cfg.n_segments == 16
    # slice guard: 100 docs = 10_000 bytes < (8000/8) * 16 = 16_000 ->
    # widening would starve kernels, stays at the MIN floor
    cfg = resolve_n_segments(spark, _docs(spark, 100), IndexConfig())
    assert cfg.n_segments == MIN_AUTO_SEGMENTS
