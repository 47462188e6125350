"""SORTED-index merge (ref: src/indexer/merger.rs sorted doc-id mapping;
test_merge_facets_sort_asc / _desc, :1482-1535): merging a sort_by_field
index k-way-merges the doc orders on the sort key — the merged segment
stays globally sorted — instead of stacking.  The strongest assertion:
wide-build + sorted-merge reproduces a DIRECT sorted single-segment
build byte-for-byte at the postings level."""

import pytest
from pyspark.sql import functions as F

from tantivy_spark.corpus import synthetic_pages
from tantivy_spark.index.build import IndexConfig, build_index
from tantivy_spark.index.merge import merge_segments
from tantivy_spark.index.reader import IndexReader
from tantivy_spark.query import TermQuery
from tantivy_spark.query.exact import ExactSearcher


@pytest.fixture(scope="module")
def sorted_pages(spark):
    return synthetic_pages(spark, 160, seed=33).select(
        "url", "text", F.octet_length("text").alias("tlen"))


@pytest.fixture(scope="module")
def merged_sorted(spark, sorted_pages, tmp_path_factory):
    base = tmp_path_factory.mktemp("smerge")
    src = str(base / "src")
    build_index(spark, sorted_pages, src, IndexConfig(
        key_col="url", text_col="text", n_segments=4,
        sort_col="desc:tlen"))
    out = str(base / "merged")
    merge_segments(spark, src, out, n_target_segments=1)
    return src, out


def test_merged_segment_stays_sorted(spark, sorted_pages, merged_sorted):
    """merger.rs sorted path: doc ids of the MERGED segment follow the
    sort key (descending tlen), not segment stacking order."""
    _src, out = merged_sorted
    dm = IndexReader(spark, out).docmap.join(
        sorted_pages.select(F.col("url").alias("key"), "tlen"), "key")
    lens = [r["tlen"] for r in dm.orderBy("doc_id").collect()]
    assert lens == sorted(lens, reverse=True)
    assert IndexReader(spark, out).manifest["totals"]["num_segments"] == 1


def test_sorted_merge_query_parity(spark, merged_sorted):
    src, out = merged_sorted
    a = ExactSearcher(IndexReader(spark, src)).search(
        TermQuery("the"), k=10).collect()
    b = ExactSearcher(IndexReader(spark, out)).search(
        TermQuery("the"), k=10).collect()
    assert [(r["key"], r["score"]) for r in a] == \
        [(r["key"], r["score"]) for r in b]


def test_sorted_merge_equals_direct_sorted_build(spark, sorted_pages,
                                                 tmp_path_factory):
    """Wide sorted build + sorted merge == direct sorted 1-segment build:
    identical docmap addresses AND identical postings bytes (same doc
    order, same chunking, same codec) — the reference asserts merged
    reads equal direct reads; byte equality is stronger."""
    base = tmp_path_factory.mktemp("sparity")
    direct = str(base / "direct")
    build_index(spark, sorted_pages, direct, IndexConfig(
        key_col="url", text_col="text", n_segments=1,
        sort_col="desc:tlen"))
    wide = str(base / "wide")
    build_index(spark, sorted_pages, wide, IndexConfig(
        key_col="url", text_col="text", n_segments=4,
        sort_col="desc:tlen"))
    merged = str(base / "merged")
    merge_segments(spark, wide, merged, n_target_segments=1)

    dm_a = {(r["key"],): (r["segment_ord"], r["doc_id"])
            for r in IndexReader(spark, direct).docmap.collect()}
    dm_b = {(r["key"],): (r["segment_ord"], r["doc_id"])
            for r in IndexReader(spark, merged).docmap.collect()}
    assert dm_a == dm_b

    def postings_fingerprint(d):
        rows = (spark.read.parquet(f"{d}/postings")
                .select("term", "chunk_id", F.md5(F.col("docs")).alias("h"),
                        F.md5(F.col("tfs")).alias("h2"),
                        F.md5(F.col("fns")).alias("h3"))
                .orderBy("term", "chunk_id").collect())
        return [(r["term"], r["chunk_id"], r["h"], r["h2"], r["h3"])
                for r in rows]

    assert postings_fingerprint(direct) == postings_fingerprint(merged)


def test_build_index_wide_takes_sorted_path(spark, sorted_pages,
                                            tmp_path_factory):
    """build_index_wide with sort_col (r7: no longer a conservative
    fallback) — wide build + sorted merge down to ONE segment is
    byte-identical to the direct sorted build."""
    from tantivy_spark.index.build import build_index_wide

    base = tmp_path_factory.mktemp("swide")
    direct = str(base / "direct")
    build_index(spark, sorted_pages, direct, IndexConfig(
        key_col="url", text_col="text", n_segments=1,
        sort_col="desc:tlen"))
    wide = str(base / "wide_out")
    manifest = build_index_wide(
        spark, sorted_pages, wide,
        IndexConfig(key_col="url", text_col="text", n_segments=1,
                    sort_col="desc:tlen"),
        build_segments=4, resume=False)
    assert manifest["totals"]["num_segments"] == 1

    def fp(d):
        rows = (spark.read.parquet(f"{d}/postings")
                .select("term", "chunk_id", F.md5(F.col("docs")).alias("h"),
                        F.md5(F.col("tfs")).alias("h2"))
                .orderBy("term", "chunk_id").collect())
        return [(r["term"], r["chunk_id"], r["h"], r["h2"]) for r in rows]

    assert fp(direct) == fp(wide)


def test_sorted_merge_with_deletes(spark, sorted_pages, tmp_path_factory):
    """Deleted docs drop and the survivors stay sort-ordered with dense
    new ids (merger.rs sorted path over alive docs)."""
    from tantivy_spark.index.deletes import delete_by_keys

    base = tmp_path_factory.mktemp("sdel")
    src = str(base / "src")
    build_index(spark, sorted_pages, src, IndexConfig(
        key_col="url", text_col="text", n_segments=4,
        sort_col="desc:tlen"))
    victims = [r["url"] for r in sorted_pages.limit(25).collect()]
    delete_by_keys(spark, IndexReader(spark, src), victims)
    out = str(base / "merged")
    merge_segments(spark, src, out, n_target_segments=1)

    reader = IndexReader(spark, out)
    keys = {r["key"] for r in reader.docmap.collect()}
    assert keys.isdisjoint(victims)
    dm = reader.docmap.join(
        sorted_pages.select(F.col("url").alias("key"), "tlen"), "key")
    rows = dm.orderBy("doc_id").collect()
    lens = [r["tlen"] for r in rows]
    assert lens == sorted(lens, reverse=True)
    ids = [r["doc_id"] for r in rows]
    assert ids == list(range(len(ids)))          # dense renumbering
    # postings agree: term search returns only alive docs
    s = ExactSearcher(reader)
    got = {r["key"] for r in s.search(TermQuery("the"), k=200).collect()}
    assert got.isdisjoint(victims)


def test_sorted_merge_two_targets(spark, sorted_pages, tmp_path_factory):
    """n_target_segments=2: each OUTPUT segment is independently
    sort-ordered (the reference sorts per segment)."""
    base = tmp_path_factory.mktemp("s2t")
    src = str(base / "src")
    build_index(spark, sorted_pages, src, IndexConfig(
        key_col="url", text_col="text", n_segments=4,
        sort_col="desc:tlen"))
    out = str(base / "merged")
    merge_segments(spark, src, out, n_target_segments=2)
    dm = IndexReader(spark, out).docmap.join(
        sorted_pages.select(F.col("url").alias("key"), "tlen"), "key")
    by_seg = {}
    for r in dm.orderBy("segment_ord", "doc_id").collect():
        by_seg.setdefault(r["segment_ord"], []).append(r["tlen"])
    assert len(by_seg) == 2
    for seg, lens in by_seg.items():
        assert lens == sorted(lens, reverse=True), seg


def test_merge_facets_on_sorted_index(spark, tmp_path_factory):
    """merger.rs:1482/:1509 test_merge_facets_sort_asc/_desc — facet
    counts survive a SORTED merge, and the merged segment keeps the
    sort order (the reference runs its facet-merge matrix under
    sort-asc and sort-desc IndexSettings)."""
    from tantivy_spark.query import AllQuery
    from tantivy_spark.query.facets import FacetCollector, search_facets

    facets = ["/top/a", "/top/b", "/top/a", "/top/c", "/top/b", "/top/a",
              "/top/d", "/top/b", "/top/a", "/top/c", "/top/d", "/top/a"]
    rows = [(f"f{i:02d}", i, "word%d text" % (i % 5), fc, (i * 31) % 97)
            for i, fc in enumerate(facets)]
    df = spark.createDataFrame(
        rows, "key STRING, i LONG, text STRING, fc STRING, v LONG")
    for direction in ("asc", "desc"):
        base = tmp_path_factory.mktemp(f"fs_{direction}")
        src = str(base / "src")
        build_index(
            spark, df, src,
            IndexConfig(key_col="key", n_segments=3,
                        segment_expr="pmod(i, 3)",
                        field_cols={"text": "text", "fc": "fc"},
                        field_analyzers={"fc": "facet"},
                        fast_field_cols=["v"],
                        sort_col="v" if direction == "asc" else "desc:v"),
            resume=False)
        out = str(base / "merged")
        merge_segments(spark, src, out, n_target_segments=1)

        def counts(d):
            s = ExactSearcher(IndexReader(spark, d))
            return search_facets(s, AllQuery(),
                                 FacetCollector(field="fc")
                                 .add_facet("/top")).get("/top")

        got = counts(out)
        assert got == counts(src)
        assert dict(got) == {"/top/a": 5, "/top/b": 3, "/top/c": 2,
                             "/top/d": 2}
        vs = [r["v"] for r in IndexReader(spark, out).docmap
              .orderBy("doc_id").collect()]
        assert vs == sorted(vs, reverse=(direction == "desc"))


def test_sorted_merge_random_shapes(spark, tmp_path_factory):
    """Randomized invariant sweep (the spirit of merger.rs
    test_merge_columnar_int_proptest): random corpus sizes, segment
    counts, targets, and delete sets -> the merged sorted index is
    always densely renumbered, sort-ordered per output segment, and
    query-identical to the unmerged index."""
    import random

    from tantivy_spark.index.deletes import delete_by_keys

    rng = random.Random(1234)
    pages = synthetic_pages(spark, 180, seed=77).select(
        "url", "text", F.octet_length("text").alias("tlen"))
    for trial in range(3):
        n_seg = rng.choice([2, 3, 5])
        n_target = rng.choice([1, 2])
        n_del = rng.choice([0, 13, 40])
        base = tmp_path_factory.mktemp(f"rs{trial}")
        src = str(base / "src")
        build_index(spark, pages, src, IndexConfig(
            key_col="url", text_col="text", n_segments=n_seg,
            sort_col="desc:tlen"), resume=False)
        if n_del:
            victims = [r["url"] for r in pages.limit(n_del).collect()]
            delete_by_keys(spark, IndexReader(spark, src), victims)
        out = str(base / "merged")
        merge_segments(spark, src, out, n_target_segments=n_target)
        reader = IndexReader(spark, out)
        dm = reader.docmap.join(
            pages.select(F.col("url").alias("key"), "tlen"), "key")
        by_seg = {}
        for r in dm.orderBy("segment_ord", "doc_id").collect():
            by_seg.setdefault(r["segment_ord"], []).append(
                (r["doc_id"], r["tlen"]))
        assert len(by_seg) == min(n_target, n_seg)
        for seg, items in by_seg.items():
            ids = [i for i, _ in items]
            lens = [t for _, t in items]
            assert ids == list(range(len(ids))), (trial, seg)
            assert lens == sorted(lens, reverse=True), (trial, seg)
        s_src = ExactSearcher(IndexReader(spark, src))
        assert s_src.count(TermQuery("the")) == \
            ExactSearcher(reader).count(TermQuery("the")), trial
        if n_del == 0:
            # scores only compare without deletes: a merge RECOMPUTES
            # BM25 stats over alive docs (the reference's deletes also
            # shift scores only at merge time).  Doc addresses change
            # under a sorted merge, so SCORE TIES may reorder (the
            # tie-break is DocAddress in the reference too): assert
            # identical score multisets and identical keys strictly
            # above the k-th score.
            a = s_src.search(TermQuery("the"), k=12).collect()
            b = ExactSearcher(reader).search(
                TermQuery("the"), k=12).collect()
            sa, sb = [r["score"] for r in a], [r["score"] for r in b]
            assert sorted(sa) == sorted(sb), trial
            cut = min(sa[-1], sb[-1])
            assert {r["key"] for r in a if r["score"] > cut} == \
                {r["key"] for r in b if r["score"] > cut}, trial
