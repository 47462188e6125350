"""Training-mix operators: canonical selection per dup cluster and
deterministic token-budget sampling (pipeline/mix.py)."""

import pytest
from pyspark.sql import functions as F

from tantivy_spark.pipeline.mix import sample_token_budget, select_canonical


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, "en" if i % 2 == 0 else "de", 100 + (i * 37) % 500)
            for i in range(40)]
    return spark.createDataFrame(rows, "doc_id LONG, lang STRING, "
                                 "n_tokens LONG")


def test_canonical_keeps_best_per_cluster(spark, corpus):
    # clusters {0,1,2} and {10,11}; everything else singleton
    clusters = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (10, 10), (11, 10)],
        "doc_id LONG, cluster_id LONG")
    out = select_canonical(corpus, clusters, quality_col="n_tokens")
    kept = {r["doc_id"]: r["dup_cluster_size"] for r in out.collect()}
    # highest n_tokens in {0,1,2}: ids 0->100, 1->137, 2->174 -> keep 2
    assert kept.get(2) == 3 and 0 not in kept and 1 not in kept
    # {10,11}: 10->470, 11->507 -> keep 11
    assert kept.get(11) == 2 and 10 not in kept
    # singletons all kept with size 1
    assert kept[5] == 1
    assert len(kept) == 40 - 3


def test_canonical_no_quality_breaks_by_min_id(spark, corpus):
    clusters = spark.createDataFrame(
        [(7, 7), (9, 7)], "doc_id LONG, cluster_id LONG")
    out = select_canonical(corpus, clusters)
    kept = {r["doc_id"] for r in out.collect()}
    assert 7 in kept and 9 not in kept


def test_budget_sampling_deterministic_and_covering(spark, corpus):
    budgets = {"en": 800, "de": 400}
    a = sample_token_budget(corpus, budgets).collect()
    b = sample_token_budget(corpus, budgets).collect()
    assert sorted(r["doc_id"] for r in a) == \
        sorted(r["doc_id"] for r in b)          # reproducible
    by_lang = {}
    for r in a:
        by_lang.setdefault(r["lang"], []).append(r["n_tokens"])
    for lang, toks in by_lang.items():
        total = sum(toks)
        # budget reached (last doc may overshoot) but not over-taken:
        # removing the smallest-possible last doc drops below budget
        assert total >= min(budgets[lang], sum(
            r["n_tokens"] for r in corpus.filter(
                F.col("lang") == lang).collect()))
        assert total - max(toks) < budgets[lang]


def test_budget_sampling_seed_changes_sample(spark, corpus):
    budgets = {"en": 800}
    a = {r["doc_id"] for r in sample_token_budget(corpus, budgets,
                                                  seed=0).collect()}
    b = {r["doc_id"] for r in sample_token_budget(corpus, budgets,
                                                  seed=1).collect()}
    assert a != b                    # different seed, different docs


def test_budget_sampling_small_budget_yields_one_doc(spark, corpus):
    out = sample_token_budget(corpus, {"en": 1}).collect()
    assert len(out) == 1 and out[0]["lang"] == "en"


def test_budget_sampling_unlisted_strata_drop(spark, corpus):
    out = sample_token_budget(corpus, {"en": 10_000_000})
    assert out.filter(F.col("lang") == "de").count() == 0
    with pytest.raises(ValueError, match="at least one stratum"):
        sample_token_budget(corpus, {})


# ------------------------------------------------------- line dedup
# (CCNet/RefinedWeb boilerplate removal; pipeline/dedup.py dedup_lines)

def test_line_dedup_removes_corpus_duplicates(spark):
    from tantivy_spark.pipeline.dedup import dedup_lines

    docs = spark.createDataFrame(
        [(1, "COOKIE BANNER\nunique alpha\nfooter"),
         (2, "COOKIE BANNER\nunique beta\nfooter"),
         (3, "only original content here")],
        "doc_id LONG, text STRING")
    out = {r["doc_id"]: r for r in dedup_lines(docs).collect()}
    assert out[1]["text"] == "unique alpha"
    assert out[2]["text"] == "unique beta"
    assert out[3]["text"] == "only original content here"
    assert out[1]["n_lines_removed"] == 2 and out[1]["n_lines_kept"] == 1
    assert out[3]["n_lines_removed"] == 0


def test_line_dedup_order_and_empty_doc(spark):
    from tantivy_spark.pipeline.dedup import dedup_lines

    docs = spark.createDataFrame(
        [(1, "dup\nkeep one\ndup\nkeep two"),
         (2, "dup\ndup")],
        "doc_id LONG, text STRING")
    out = {r["doc_id"]: r for r in dedup_lines(docs).collect()}
    # "dup" occurs 4x corpus-wide -> stripped everywhere, order kept
    assert out[1]["text"] == "keep one\nkeep two"
    assert out[2]["text"] == "" and out[2]["n_lines_kept"] == 0


def test_line_dedup_regex_metachar_separator(spark):
    """The split side quotes the separator (\\Q..\\E) so regex
    metacharacters like '|' split LITERALLY and the array_join rebuild
    is byte-identical — an unquoted '|' would split between every
    character."""
    from tantivy_spark.pipeline.dedup import dedup_lines

    docs = spark.createDataFrame(
        [(1, "dup|keep a|dup"), (2, "dup|keep b|dup")],
        "doc_id LONG, text STRING")
    out = {r["doc_id"]: r for r in dedup_lines(docs, sep="|").collect()}
    assert out[1]["text"] == "keep a"
    assert out[1]["n_lines_removed"] == 2 and out[1]["n_lines_kept"] == 1
    assert out[2]["text"] == "keep b"


def test_line_dedup_threshold(spark):
    from tantivy_spark.pipeline.dedup import dedup_lines

    docs = spark.createDataFrame(
        [(1, "twice\nunique a"), (2, "twice\nunique b")],
        "doc_id LONG, text STRING")
    out = {r["doc_id"]: r["text"]
           for r in dedup_lines(docs, min_count=3).collect()}
    assert out[1] == "twice\nunique a"       # below threshold: kept


def test_temperature_weights_math(spark, corpus):
    from tantivy_spark.pipeline.mix import temperature_mix_weights

    out = temperature_mix_weights(corpus, temperature=2.0).collect()
    got = {r["stratum"]: (r["n_tokens"], r["weight"]) for r in out}
    import math
    sums = {"en": sum(100 + (i * 37) % 500 for i in range(0, 40, 2)),
            "de": sum(100 + (i * 37) % 500 for i in range(1, 40, 2))}
    z = math.sqrt(sums["en"]) + math.sqrt(sums["de"])
    for s in ("en", "de"):
        assert got[s][0] == sums[s]
        assert got[s][1] == pytest.approx(math.sqrt(sums[s]) / z, abs=1e-12)
    assert sum(w for _, w in got.values()) == pytest.approx(1.0)


def test_temperature_extremes(spark, corpus):
    from tantivy_spark.pipeline.mix import temperature_mix_weights

    # T=1: proportional to token counts
    out = {r["stratum"]: r["weight"]
           for r in temperature_mix_weights(corpus, temperature=1.0).collect()}
    sums = {"en": sum(100 + (i * 37) % 500 for i in range(0, 40, 2)),
            "de": sum(100 + (i * 37) % 500 for i in range(1, 40, 2))}
    total = sums["en"] + sums["de"]
    assert out["en"] == pytest.approx(sums["en"] / total)
    # very high T: near-uniform
    out_hi = {r["stratum"]: r["weight"]
              for r in temperature_mix_weights(
                  corpus, temperature=1e9).collect()}
    assert out_hi["en"] == pytest.approx(0.5, abs=1e-6)
    with pytest.raises(ValueError):
        temperature_mix_weights(corpus, temperature=0)
