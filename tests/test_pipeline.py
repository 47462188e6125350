"""Pipeline operators: dedup (exact / minhash / simhash), similarity
search (brute force + LSH recall), text stats, multimodal plumbing."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_exact_dedup_finds_planted_dupes(spark, docs):
    from tantivy_spark.pipeline.dedup import exact_dedup_groups

    dup = docs.limit(5).withColumn("doc_id", F.col("doc_id") + 10_000)
    g = exact_dedup_groups(docs.unionByName(dup)).collect()
    assert len(g) == 5
    assert all(r["n_dupes"] == 2 and r["keep_id"] < 10_000 for r in g)


def test_minhash_lsh_finds_near_dupes(spark, docs):
    from tantivy_spark.pipeline.dedup import minhash_lsh_candidates, minhash_signatures

    # plant a near-duplicate: the longest doc's text with one word changed
    longest = docs.orderBy(F.desc("n_chars"), F.asc("doc_id")).limit(1).collect()[0]
    words = longest["text"].split()
    words[len(words) // 2] = "CHANGED"
    near = spark.createDataFrame([(9_999, " ".join(words))], "doc_id long, text string")
    corpus = docs.select("doc_id", "text").unionByName(near)
    sigs = minhash_signatures(corpus, num_hashes=32)
    pairs = minhash_lsh_candidates(sigs, bands=16, rows_per_band=2).collect()
    src = int(longest["doc_id"])
    assert any(r["id_a"] == src and r["id_b"] == 9_999 for r in pairs)


def test_jaccard_verify_exact(spark, docs):
    from tantivy_spark.pipeline.dedup import (
        jaccard_verify, minhash_lsh_candidates, minhash_signatures)

    longest = docs.orderBy(F.desc("n_chars"), F.asc("doc_id")).limit(1).collect()[0]
    words = longest["text"].split()
    words[len(words) // 2] = "CHANGED"
    near = spark.createDataFrame([(9_999, " ".join(words))], "doc_id long, text string")
    exact_dup = spark.createDataFrame([(9_998, longest["text"])],
                                      "doc_id long, text string")
    corpus = docs.select("doc_id", "text").unionByName(near).unionByName(exact_dup)
    cands = minhash_lsh_candidates(
        minhash_signatures(corpus, num_hashes=32), bands=16, rows_per_band=2)
    verified = {(r["id_a"], r["id_b"]): r["jaccard"]
                for r in jaccard_verify(corpus, cands).collect()}
    src = int(longest["doc_id"])
    assert verified[(src, 9_998)] == pytest.approx(1.0)
    assert 0.5 < verified[(src, 9_999)] < 1.0


def test_dedup_against_incremental_admission(spark, docs):
    """dedup_against: a NEW batch checks against the EXISTING corpus's
    signature store only — exact copy flags is_dup with est 1.0 and the
    right best_match; an unrelated doc and a sub-k-token doc come back
    clean (and present) in the output."""
    from tantivy_spark.pipeline.dedup import (
        dedup_against, minhash_signatures)

    base = docs.select("doc_id", "text")
    ref_sigs = minhash_signatures(base, num_hashes=32)
    longest = docs.orderBy(F.desc("n_chars"), F.asc("doc_id")).limit(1) \
        .collect()[0]
    new = spark.createDataFrame(
        [(9_001, longest["text"]),                       # exact copy
         (9_002, "zzz qqq completely unrelated words xyzzy plugh"),
         (9_003, "xy")],                                 # < k tokens
        "doc_id long, text string")
    out = {r["id"]: r for r in dedup_against(
        new, ref_sigs, num_hashes=32, bands=8, rows_per_band=4,
        threshold=0.5).collect()}
    assert set(out) == {9_001, 9_002, 9_003}
    assert out[9_001]["is_dup"] is True
    assert out[9_001]["best_match"] == int(longest["doc_id"])
    assert out[9_001]["est_jaccard"] == pytest.approx(1.0)
    assert out[9_002]["is_dup"] is False
    assert out[9_003]["is_dup"] is False
    assert out[9_003]["best_match"] is None

    # a persisted banded store (band_signatures) must admit identically
    from tantivy_spark.pipeline.dedup import band_signatures
    rb = band_signatures(ref_sigs, bands=8, rows_per_band=4)
    out2 = {r["id"]: r for r in dedup_against(
        new, ref_sigs, num_hashes=32, bands=8, rows_per_band=4,
        threshold=0.5, ref_bands=rb).collect()}
    assert {k: (v["is_dup"], v["best_match"], v["est_jaccard"])
            for k, v in out.items()} == \
           {k: (v["is_dup"], v["best_match"], v["est_jaccard"])
            for k, v in out2.items()}


def test_embedding_near_dups(spark, emb):
    from tantivy_spark.pipeline.dedup import embedding_near_dups

    # plant an exact duplicate vector
    dup = emb.filter(F.col("vec_id") == 7).withColumn(
        "vec_id", F.lit(99_999).cast("long"))
    pairs = embedding_near_dups(emb.unionByName(dup), threshold=0.99).collect()
    assert any(r["id_a"] == 7 and r["id_b"] == 99_999
               and r["cos_r"] >= 0.999 for r in pairs)


def test_simhash_near_dupes_close(spark, docs):
    from tantivy_spark.pipeline.dedup import simhash64

    base = docs.filter(F.col("doc_id") == 0).select("doc_id", "text")
    txt = base.collect()[0]["text"]
    words = txt.split()
    words[0] = "changed"
    near = spark.createDataFrame([(9_999, " ".join(words))], "doc_id long, text string")
    far = spark.createDataFrame([(9_998, "zeta quark nimbus vortex ember")],
                                "doc_id long, text string")
    sh = {r["id"]: r["simhash"] for r in
          simhash64(base.unionByName(near).unionByName(far)).collect()}
    ham = lambda a, b: bin((a ^ b) & (2**64 - 1)).count("1")
    assert ham(sh[0], sh[9_999]) < ham(sh[0], sh[9_998])
    assert ham(sh[0], sh[9_999]) <= 8


def test_lsh_ann_recall(spark, emb):
    from tantivy_spark.pipeline.similarity import brute_force_cosine_topk, lsh_cosine_topk

    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    exact = [r["id"] for r in
             brute_force_cosine_topk(emb, q, k=10, exclude_id=0).collect()]
    approx = [r["id"] for r in
              lsh_cosine_topk(emb, q, k=10, n_bits=6, n_tables=6, exclude_id=0,
                              multiprobe_bits=1).collect()]
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.5, (recall, exact, approx)


def test_lsh_prebuilt_tables_identical(spark, emb):
    """A prebuilt (table, id, bucket) frame gives bit-identical results
    to the inline path — repeated queries reuse it and skip the
    embedding scans (the IVF prebuilt-quantizer pattern)."""
    from tantivy_spark.pipeline.similarity import (
        build_lsh_tables, lsh_cosine_topk)

    bt = build_lsh_tables(emb, 64, n_bits=6, n_tables=6).cache()
    try:
        for qid in (0, 3):
            q = [float(x) for x in emb.filter(
                F.col("vec_id") == qid).collect()[0]["embedding"]]
            inline = [(r["id"], r["cos_r"]) for r in lsh_cosine_topk(
                emb, q, k=10, n_bits=6, n_tables=6, exclude_id=qid).collect()]
            prebuilt = [(r["id"], r["cos_r"]) for r in lsh_cosine_topk(
                emb, q, k=10, n_bits=6, n_tables=6, exclude_id=qid,
                bucket_tables=bt).collect()]
            assert inline == prebuilt
    finally:
        bt.unpersist()


def test_lsh_buckets_deterministic(spark, emb):
    from tantivy_spark.pipeline.similarity import hyperplane_lsh_buckets

    a = {r["id"]: r["bucket"] for r in
         hyperplane_lsh_buckets(emb, 64, n_bits=8).collect()}
    b = {r["id"]: r["bucket"] for r in
         hyperplane_lsh_buckets(emb.repartition(7), 64, n_bits=8).collect()}
    assert a == b


def test_multimodal_meta_and_error_isolation(spark, docs):
    from tantivy_spark.corpus import pages_from_documents
    from tantivy_spark.pipeline.multimodal import decode_media_meta

    pages = pages_from_documents(spark, SF).limit(20).select(
        "html", F.substring("url", -10, 10).cast("bigint").alias("doc_id"))
    bad = spark.createDataFrame([(b"", 77_777)], "html binary, doc_id long")
    out = decode_media_meta(pages.unionByName(bad), payload_col="html",
                            id_col="doc_id").collect()
    ok = [r for r in out if r["ok"]]
    err = [r for r in out if not r["ok"]]
    assert len(ok) == 20 and len(err) == 1
    assert err[0]["id"] == 77_777 and "ValueError" in err[0]["error"]
    assert all(r["width"] >= 16 and r["n_bytes"] > 0 for r in ok)


def test_token_counts_and_quality(spark, docs):
    from tantivy_spark.pipeline.textstats import quality_scores, token_counts

    tc = token_counts(docs).filter(F.col("id") == 0).collect()[0]
    assert tc["n_tokens"] > 0 and tc["avg_token_len_r"] > 0
    qs = quality_scores(docs).collect()
    assert all(0.0 <= r["quality_r"] <= 1.0 for r in qs)


def test_media_binary_features(spark):
    """Codec-free multimodal features: format sniff, entropy, fingerprint."""
    from tantivy_spark.pipeline.multimodal import media_binary_features

    rows = [
        (1, b"\x89PNG\r\n\x1a\x0a" + b"abc"),
        (2, b"\xff\xd8\xff\xe0" + b"jfif"),
        (3, b"GIF89a" + b"x" * 10),
        (4, b"OggS" + b"\x00" * 4),
        (5, b"plain text payload"),
        (6, b""),
        (7, b"\x00" * 1024),              # zero entropy
        (8, bytes(range(256)) * 4),       # max entropy (8 bits/byte)
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, payload BINARY")
    got = {r["id"]: r for r in
           media_binary_features(df).collect()}
    assert got[1]["format"] == "png"
    assert got[2]["format"] == "jpeg"
    assert got[3]["format"] == "gif"
    assert got[4]["format"] == "ogg"
    assert got[5]["format"] == "unknown"
    assert got[6]["n_bytes"] == 0 and got[6]["entropy_r"] == 0.0
    assert got[7]["entropy_r"] == 0.0
    assert got[8]["entropy_r"] == 8.0
    assert got[1]["header_hex"] == "89504e47"
    # fingerprints: equal payloads equal, different payloads differ
    df2 = spark.createDataFrame([(10, b"abc"), (11, b"abc"), (12, b"abd")],
                                "doc_id BIGINT, payload BINARY")
    fps = {r["id"]: r["fingerprint"]
           for r in media_binary_features(df2).collect()}
    assert fps[10] == fps[11] != fps[12]
    # plan split: sniff/size/header are JVM expressions (codegen), only
    # the entropy+fingerprint struct goes through the Arrow UDF
    plan = media_binary_features(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "octet_length" in plan and "substring" in plan
    assert plan.count("ArrowEvalPython") == 1


def test_ivf_ann_recall(spark):
    """IVF coarse-quantizer ANN: probing a few lists recovers most of the
    exact top-k; probing ALL lists recovers it exactly."""
    from pyspark.sql import functions as F

    from tantivy_spark.pipeline.similarity import (
        brute_force_cosine_topk, ivf_build, ivf_cosine_topk)

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    qvec = [float(x) for x in
            emb.filter(F.col("vec_id") == 3).select("embedding").collect()[0][0]]
    exact = [r["id"] for r in
             brute_force_cosine_topk(emb, qvec, k=10, exclude_id=3).collect()]

    centroids, assignments = ivf_build(emb, n_lists=16, seed=11)
    assignments = assignments.cache()
    # every vector lands in exactly one list
    assert assignments.count() == emb.count()
    n_lists_used = assignments.select("list_id").distinct().count()
    assert 2 <= n_lists_used <= 16

    approx = [r["id"] for r in
              ivf_cosine_topk(emb, qvec, k=10, nprobe=4, exclude_id=3,
                              assignments=assignments,
                              centroids=centroids).collect()]
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.5, (recall, exact, approx)

    full = [r["id"] for r in
            ivf_cosine_topk(emb, qvec, k=10, nprobe=16, exclude_id=3,
                            assignments=assignments,
                            centroids=centroids).collect()]
    assert full == exact


def test_ivf_kmeans_sample_is_bounded(spark):
    """The k-means fitting sample must stay under the cap on an oversized
    frame — the driver never collects the whole embedding table."""
    from tantivy_spark.pipeline import similarity as sim

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    n = emb.count()
    cap = max(n // 4, 8)
    seen = {}
    orig = sim._kmeans_numpy

    def spy(sample, n_lists, seed=11, n_iter=12):
        seen["n"] = len(sample)
        return orig(sample, n_lists, seed, n_iter)

    sim._kmeans_numpy = spy
    try:
        centroids, assignments = sim.ivf_build(emb, n_lists=4, max_sample=cap)
    finally:
        sim._kmeans_numpy = orig
    assert 0 < seen["n"] <= cap, (seen, cap, n)
    # distributed assignment still covers the FULL table
    assert assignments.count() == n
    assert centroids.shape[0] <= 4


def test_embedding_near_dups_bucket_cap(spark, emb):
    """A degenerate hot bucket (many identical vectors) is dropped by the
    max_bucket guard instead of going O(b^2); normal pairs survive."""
    from tantivy_spark.pipeline.dedup import embedding_near_dups

    base = emb.select("vec_id", "embedding")
    dup = base.filter(F.col("vec_id") == 7).withColumn(
        "vec_id", F.lit(99_999).cast("long"))
    # 50 copies of vector 3 -> one bucket of >= 50 identical vectors
    hot = base.filter(F.col("vec_id") == 3).crossJoin(
        spark.range(100_000, 100_050).select(F.col("id").alias("nid"))
    ).select(F.col("nid").alias("vec_id"), "embedding")
    corpus = base.unionByName(dup).unionByName(hot)
    pairs = embedding_near_dups(corpus, threshold=0.99, max_bucket=20).collect()
    # the seeded normal pair survives; no pair touches the capped hot ids
    assert any(r["id_a"] == 7 and r["id_b"] == 99_999 for r in pairs)
    assert not any(r["id_a"] >= 100_000 or r["id_b"] >= 100_000 for r in pairs)


def test_lsh_dropped_buckets_diagnostics(spark, docs):
    """The max_bucket cap is visible, not silent: seeding 30 identical
    docs creates hot buckets that lsh_dropped_buckets reports, and the
    candidate join with that cap excludes exactly those buckets' pairs."""
    from tantivy_spark.pipeline.dedup import (
        lsh_dropped_buckets, minhash_lsh_candidates, minhash_signatures)

    base = docs.select("doc_id", "text").limit(20)
    boiler = spark.createDataFrame(
        [(100_000 + i, "same boilerplate text repeated here")
         for i in range(30)], "doc_id long, text string")
    sigs = minhash_signatures(base.unionByName(boiler), num_hashes=32)
    dropped = lsh_dropped_buckets(sigs, bands=8, rows_per_band=4,
                                  max_bucket=10).collect()
    assert dropped and all(r["bucket_n"] >= 30 for r in dropped)
    pairs = minhash_lsh_candidates(sigs, bands=8, rows_per_band=4,
                                   max_bucket=10).collect()
    assert not any(r["id_a"] >= 100_000 and r["id_b"] >= 100_000
                   for r in pairs)


def test_dup_clusters_components(spark):
    """dup_clusters: min-label propagation over near-dup pairs — long
    chains (multi-round convergence), stars, and isolated pairs all
    collapse to their component's minimum id."""
    from tantivy_spark.pipeline.dedup import dup_clusters

    pairs = [
        # chain 1-2-3-4-5-6 presented worst-case (descending)
        (6, 5), (5, 4), (4, 3), (3, 2), (2, 1),
        # star centered at 10
        (10, 11), (10, 12), (10, 13),
        # isolated pair, reversed order + duplicate edge
        (21, 20), (20, 21),
    ]
    df = spark.createDataFrame(pairs, "id_a LONG, id_b LONG")
    got = {r["doc_id"]: r["cluster_id"]
           for r in dup_clusters(df).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 1,
                   10: 10, 11: 10, 12: 10, 13: 10,
                   20: 20, 21: 20}


def test_chunk_dedup_groups(spark):
    """Chunk-level dedup: identical 4-token windows across docs group;
    short docs produce one whole-doc chunk; keep = min (id, idx)."""
    from tantivy_spark.pipeline.dedup import chunk_dedup_groups, doc_chunks

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h"),          # chunks: "a b c d", "e f g h"
         (2, "x y a b c d q r"),          # chunk "a b c d" at idx 1? no — windows are strided
         (3, "a b c d e f g h"),          # exact dup of doc 1
         (4, "tiny doc")],                # single short chunk
        "doc_id LONG, text STRING")
    chunks = {(r["doc_id"], r["chunk_idx"]): r["chunk_text"]
              for r in doc_chunks(docs, window=4, stride=4).collect()}
    assert chunks[(1, 0)] == "a b c d" and chunks[(1, 1)] == "e f g h"
    assert chunks[(4, 0)] == "tiny doc"
    groups = chunk_dedup_groups(docs, window=4, stride=4).collect()
    got = {(r["keep_id"], r["keep_chunk_idx"]): r["n_dupes"]
           for r in groups}
    # docs 1 and 3 share both chunks; doc 2's strided windows differ
    assert got == {(1, 0): 2, (1, 1): 2}


def test_resize_and_frame_sample_plumbing(spark):
    """Media transform plumbing (resize 1->1, frame-sample 1->N):
    schemas, determinism across partitionings, per-row error isolation,
    and the frame cap — all with the registry's deterministic fakes."""
    from tantivy_spark.pipeline.multimodal import (
        _deterministic_fake_decode, resize_images, sample_frames)

    rows = [(1, b"\x89PNG....payload-one"), (2, b"payload-two-bytes"),
            (3, b"")]                                    # 3: decode error
    df = spark.createDataFrame(rows, "doc_id LONG, payload BINARY")

    rs = {r["id"]: r for r in
          resize_images(df, width=64, height=32).collect()}
    assert rs[1]["ok"] and rs[2]["ok"] and not rs[3]["ok"]
    assert rs[3]["error"].startswith("ValueError")
    assert rs[1]["n_bytes_out"] == (64 * 32) // 64      # fake bitmap size
    # determinism across partitionings
    rs2 = {r["id"]: r for r in
           resize_images(df.repartition(3), width=64, height=32).collect()}
    assert bytes(rs2[1]["payload"]) == bytes(rs[1]["payload"])

    fr = sample_frames(df, every_ms=1000, max_frames=5).collect()
    by_id: dict = {}
    for r in fr:
        by_id.setdefault(r["id"], []).append(r)
    dur1 = _deterministic_fake_decode(rows[0][1])["duration_ms"]
    assert len(by_id[1]) == min(5, max(1, dur1 // 1000))
    assert [r["frame_idx"] for r in sorted(by_id[1],
                                           key=lambda r: r["frame_idx"])] \
        == list(range(len(by_id[1])))
    assert all(r["ts_ms"] == r["frame_idx"] * 1000 for r in by_id[1])
    assert not by_id[3][0]["ok"]                        # error row, 1->1


def test_pages_from_table_adapter(spark):
    """The catalog-table input seam: a registered table (the sandbox
    stand-in for the Iceberg pages table) reads through pages_from_table
    with the page schema projected; downstream consumes a DataFrame."""
    from tantivy_spark.corpus import pages_from_documents, pages_from_table

    pages = pages_from_documents(spark, "/root/testdata/sf0.001")
    pages.createOrReplaceTempView("cc_pages")
    got = pages_from_table(spark, "cc_pages")
    assert got.columns == ["url", "warc_ts", "html", "text", "lang"]
    assert got.count() == pages.count()


class TestPIIAndContamination:
    def test_pii_counts_and_redaction(self, spark):
        from tantivy_spark.pipeline.pii import pii_counts, pii_redact
        df = spark.createDataFrame(
            [(1, "mail me at a.b+c@test.org or 10.1.2.3 now"),
             (2, "ssn 123-45-6789 card 4111 1111 1111 1111"),
             (3, "call +44 (0)20 7946-0958 thanks"),
             (4, "nothing sensitive here")],
            "doc_id BIGINT, text STRING")
        rows = {r["doc_id"]: r for r in pii_counts(df).collect()}
        assert rows[1]["n_email"] == 1 and rows[1]["n_ipv4"] == 1
        assert rows[2]["n_ssn"] == 1 and rows[2]["n_card"] == 1
        assert rows[3]["n_phone"] == 1
        assert rows[4]["pii_total"] == 0
        red = {r["doc_id"]: r["text"] for r in pii_redact(df).collect()}
        assert "<email>" in red[1] and "<ipv4>" in red[1]
        assert "a.b+c@test.org" not in red[1]
        assert "<ssn>" in red[2] and "<card>" in red[2]
        assert red[4] == "nothing sensitive here"

    def test_decontaminate_flags_overlap_only(self, spark):
        from tantivy_spark.pipeline.contamination import decontaminate
        phrase = "one two three four five six seven eight"
        docs = spark.createDataFrame(
            [(1, f"prefix {phrase} suffix"),
             (2, "totally different words in this training document x y"),
             (3, "short doc")],  # < n tokens: must not error or match
            "doc_id BIGINT, text STRING")
        bench = spark.createDataFrame([(99, phrase)],
                                      "doc_id BIGINT, text STRING")
        hits = {r["doc_id"]: r["n_hits"]
                for r in decontaminate(docs, bench, n=8).collect()}
        assert hits == {1: 1}

    def test_repetition_stats_degenerate_doc(self, spark):
        from tantivy_spark.pipeline.contamination import repetition_stats
        docs = spark.createDataFrame(
            [(1, "spam spam spam spam"),
             (2, "all words here are fully distinct tokens"),
             (3, "x")],  # single token: zero fractions, no error
            "doc_id BIGINT, text STRING")
        rows = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
        assert rows[1]["top_token_frac"] == 1.0
        assert rows[1]["dup_2gram_frac"] > 0.5
        assert rows[2]["dup_2gram_frac"] == 0.0
        assert rows[3]["n_tokens"] == 1
        assert rows[3]["dup_2gram_frac"] == 0.0
        assert rows[3]["top_token_frac"] == 1.0


def test_simhash_near_dups_pigeonhole_exact(spark):
    """Hamming-ball LSH pairs == brute-force popcount pairs, with exact
    distances, incl. negative (bit-63-set) signatures exercising the
    unsigned chunk shift."""
    from tantivy_spark.pipeline.dedup import simhash_near_dups

    sigs = {
        1: 0,
        2: 1,                                  # ham(1,2)=1
        3: (1 << 5) | (1 << 20) | (1 << 40),   # ham(1,3)=3, ham(2,3)=4
        4: 0,                                  # ham(1,4)=0
        5: -1,                                 # all 64 bits
        6: -2,                                 # ham(5,6)=1
    }

    def pop(x):
        return bin(x & 0xFFFFFFFFFFFFFFFF).count("1")

    want = {}
    ids = sorted(sigs)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = ids[i], ids[j]
            h = pop(sigs[a] ^ sigs[b])
            if h <= 3:
                want[(a, b)] = h
    df = spark.createDataFrame(list(sigs.items()), "id long, simhash long")
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in simhash_near_dups(df, max_hamming=3).collect()}
    assert got == want
    # max_hamming=0: identical signatures only
    got0 = {(r["id_a"], r["id_b"]): r["hamming"]
            for r in simhash_near_dups(df, max_hamming=0).collect()}
    assert got0 == {(1, 4): 0}
    import pytest as _pt
    with _pt.raises(ValueError):
        simhash_near_dups(df, max_hamming=16)


def test_simhash_near_dups_bucket_cap(spark):
    """A chunk bucket over max_bucket is dropped: pairs reachable ONLY
    through that bucket vanish (the documented recall trade), pairs with
    another agreeing chunk survive."""
    from tantivy_spark.pipeline.dedup import simhash_near_dups

    # 40 docs share chunks 0/2/3 (= 0) and differ only in chunk1
    # (values 1..40) — every close pair among them is reachable ONLY
    # through the shared over-cap buckets; docs 100/101 (ham=1) use
    # chunk1=41 / chunk2=99, untouched by the flood
    rows = [(i, (i + 1) << 16) for i in range(40)]
    s100 = (41 << 16) | (99 << 32)
    rows += [(100, s100), (101, s100 | 1)]
    df = spark.createDataFrame(rows, "id long, simhash long")
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in simhash_near_dups(df, max_hamming=3,
                                      max_bucket=10).collect()}
    # buckets (chunk0,0)/(chunk2,0)/(chunk3,0) hold 40+ docs -> dropped;
    # i-series near-pairs vanish (documented recall trade); (100, 101)
    # still surfaces via its private chunk1/chunk2 buckets
    assert got == {(100, 101): 1}


def test_simhash_dedup_against_admission(spark):
    """Incremental SimHash admission vs a persisted chunk store: exact
    Hamming verdicts, deterministic min-(hamming, ref_id) best match,
    non-matching docs admitted with null match."""
    from tantivy_spark.pipeline.dedup import (
        simhash_chunks, simhash_dedup_against)

    ref = spark.createDataFrame(
        [(10, 0), (11, (0xABCD << 32) | 0x1234), (12, 0)],
        "id long, simhash long")
    store = simhash_chunks(ref, max_hamming=3)
    new = spark.createDataFrame(
        [(100, 1),                       # ham 1 vs refs 10 and 12
         (101, -1),                      # 64 bits from everything
         (102, (0xABCD << 32) | 0x1236)  # ham 1 vs ref 11
         ], "id long, simhash long")
    got = {r["id"]: (r["is_dup"], r["best_match"], r["hamming"])
           for r in simhash_dedup_against(new, store,
                                          max_hamming=3).collect()}
    assert got[100] == (True, 10, 1)   # tie at ham 1 -> smaller ref id
    assert got[101] == (False, None, None)
    assert got[102] == (True, 11, 1)


def test_simhash_chunks_store_cap(spark):
    """The persisted store drops over-cap buckets at BUILD time, so a
    flooded chunk value cannot fan out an admission join."""
    from tantivy_spark.pipeline.dedup import (
        simhash_chunks, simhash_dedup_against)

    # 30 refs share every chunk (identical sigs) -> all four buckets
    # over the cap of 10 -> empty store -> nothing admits as dup
    ref = spark.createDataFrame([(i, 42) for i in range(30)],
                                "id long, simhash long")
    store = simhash_chunks(ref, max_hamming=3, max_bucket=10)
    assert store.count() == 0
    new = spark.createDataFrame([(100, 42)], "id long, simhash long")
    got = simhash_dedup_against(new, store, max_hamming=3).collect()
    assert [(r["id"], r["is_dup"]) for r in got] == [(100, False)]
