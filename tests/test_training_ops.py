"""Tests for the training-data pipeline operators (text / dedup /
similarity / media) against small hand-built corpora with known answers,
plus pandas-computed oracles where exact values matter."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from sparkcheck import dedup, media, similarity, text


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat on the mat"),            # exact dup of 1
        (3, "the cat sat on the red mat"),        # near dup of 1
        (4, "der hund ist nicht zu hause und der"),  # German-ish
        (5, "completely different words entirely here banana"),
        (6, ""),                                   # empty doc
        (7, "le chat est dans la maison pour une"),  # French-ish
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


# --- text ------------------------------------------------------------------


def test_token_count_and_profile(spark, corpus):
    prof = {r["doc_id"]: r.asDict() for r in text.text_profile(corpus).collect()}
    assert prof[1]["n_tokens"] == 6
    assert prof[6]["n_tokens"] == 0
    assert prof[1]["fingerprint"] == hashlib.md5(
        b"the cat sat on the mat"
    ).hexdigest()
    # exact dup docs share fingerprints; near-dup does not
    assert prof[1]["fingerprint"] == prof[2]["fingerprint"]
    assert prof[1]["fingerprint"] != prof[3]["fingerprint"]
    # stopword ratio of doc 1: the/on/the -> 3 of 6
    assert prof[1]["stopword_ratio"] == pytest.approx(0.5)
    assert 0.0 <= prof[1]["quality"] <= 1.0


def test_langid(spark, corpus):
    pred = {r["doc_id"]: r["lang"] for r in corpus.select(
        "doc_id", text.langid("text").alias("lang")).collect()}
    assert pred[1] == "en"
    assert pred[4] == "de"
    assert pred[7] == "fr"
    assert pred[6] == "und"


def test_shingles(spark, corpus):
    got = corpus.where(F.col("doc_id") == 1).select(
        text.shingles("text", 3).alias("s")
    ).collect()[0]["s"]
    assert got == ["the cat sat", "cat sat on", "sat on the", "on the mat"]
    empty = corpus.where(F.col("doc_id") == 6).select(
        text.shingles("text", 3).alias("s")
    ).collect()[0]["s"]
    assert empty == []


# --- dedup -----------------------------------------------------------------


def test_exact_duplicates(spark, corpus):
    rows = dedup.exact_duplicates(corpus).collect()
    assert len(rows) == 1
    assert rows[0]["doc_ids"] == [1, 2]


def test_jaccard_pairs(spark, corpus):
    rows = {(r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in dedup.jaccard_pairs(corpus, threshold=0.2).collect()}
    assert rows[(1, 2)] == 1.0           # identical shingle sets
    assert (1, 3) in rows and rows[(1, 3)] < 1.0
    assert (1, 5) not in rows


def test_minhash_lsh_finds_exact_and_near(spark, corpus):
    cands = {(r["doc_a"], r["doc_b"])
             for r in dedup.lsh_candidate_pairs(corpus, n_hashes=12,
                                                band_size=3).collect()}
    assert (1, 2) in cands  # identical docs always collide in every band
    verified = {(r["doc_a"], r["doc_b"])
                for r in dedup.near_duplicates(corpus, threshold=0.5).collect()}
    assert (1, 2) in verified
    assert all(a < b for a, b in verified)


def test_simhash_properties(spark, corpus):
    sig = {r["doc_id"]: r["simhash"] for r in dedup.simhash(corpus).collect()}
    assert sig[1] == sig[2]  # identical text -> identical signature
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"]
             for r in dedup.simhash_near_duplicates(corpus, max_hamming=3).collect()}
    assert pairs.get((1, 2)) == 0


def test_simhash_near_vs_far(spark):
    """Near-dup docs land many bits closer than unrelated docs. Uses
    ~20-token docs: with only a handful of shingles the majority votes are
    hash noise and the property does not hold for ANY hash choice."""
    base = ("the quick brown fox jumps over the lazy dog while rain "
            "falls softly on the quiet green hills of the north valley")
    near = base.replace("rain", "snow")
    far = ("completely unrelated banana algebra furnace ocean twelve "
           "kangaroo whisper granite sunset paradox velvet mountain "
           "circuit lantern meadow thunder crystal harbor")
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id long, text string"
    )
    sig = {r["doc_id"]: r["simhash"] for r in dedup.simhash(df).collect()}
    ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")  # noqa: E731
    assert ham(sig[1], sig[2]) + 8 < ham(sig[1], sig[3])
    # the chunk decomposition reassembles to the same 64-bit word
    chunks = {r["doc_id"]: (r["c0"], r["c1"], r["c2"], r["c3"])
              for r in dedup.simhash_chunks(df).collect()}
    for d, cs in chunks.items():
        assembled = sum(c << (16 * i) for i, c in enumerate(cs))
        assert assembled & ((1 << 64) - 1) == sig[d] & ((1 << 64) - 1)


# --- similarity ------------------------------------------------------------


@pytest.fixture(scope="module")
def vectors(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),   # close to 0
        (2, [0.0, 1.0, 0.0, 0.0]),   # orthogonal to 0
        (3, [-1.0, 0.0, 0.0, 0.0]),  # opposite of 0
        (4, [0.5, 0.5, 0.5, 0.5]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_exact(spark, vectors):
    a = vectors.where("vec_id = 0").select(F.col("embedding").alias("a"))
    pairs = a.crossJoin(vectors.select(F.col("vec_id"), F.col("embedding").alias("b")))
    got = {r["vec_id"]: r["c"] for r in pairs.select(
        "vec_id", similarity.cosine(F.col("a"), F.col("b")).alias("c")).collect()}
    assert got[0] == pytest.approx(1.0)
    assert got[2] == pytest.approx(0.0)
    assert got[3] == pytest.approx(-1.0)
    assert got[1] == pytest.approx(0.9 / math.sqrt(0.82), rel=1e-6)


def test_brute_force_topk(spark, vectors):
    out = similarity.brute_force_topk(
        vectors, vectors.where("vec_id = 0"), k=2
    ).collect()
    assert [r["neighbor_id"] for r in sorted(out, key=lambda r: r["rank"])] == [1, 4]


def test_lsh_topk_subset_of_bruteforce(spark, vectors):
    # LSH result must be a subset of candidates with identical signatures;
    # identical vectors share a bucket by construction
    dup = vectors.union(
        vectors.where("vec_id = 0").select(F.lit(10).alias("vec_id"), "embedding")
    )
    out = similarity.lsh_topk(dup, dup.where("vec_id = 10"), k=3, n_planes=8)
    rows = out.collect()
    assert any(r["neighbor_id"] == 0 and r["cos"] == pytest.approx(1.0) for r in rows)


def test_ivf_topk_recalls_identical_vector(spark, vectors):
    out = similarity.ivf_topk(
        vectors, vectors.where("vec_id = 0"), k=2, n_centroids=2, n_probe=2
    ).collect()
    assert [r["neighbor_id"] for r in sorted(out, key=lambda r: r["rank"])][0] == 1


# --- media -----------------------------------------------------------------


def test_media_pipeline_plumbing(spark):
    m = media.synth_media(spark, 64).persist()
    total = m.count()
    assert total == 64
    feats = media.image_features(m, fake=True)
    n_images = m.where("kind = 'image'").count()
    rows = feats.collect()
    assert len(rows) == n_images
    assert all(0.0 <= r["mean_luma"] <= 1.0 for r in rows)
    assert all(64 <= r["width"] <= 256 for r in rows)
    # deterministic: same input -> same features
    again = {r["media_ref"]: r["digest"] for r in media.image_features(m, fake=True).collect()}
    assert all(again[r["media_ref"]] == r["digest"] for r in rows)
    frames = media.sample_frames(m, every_n=5, fake=True)
    n_videos = m.where("kind = 'video'").count()
    assert frames.select("media_ref").distinct().count() == n_videos
    # integrity checks: clean table has no violations
    assert media.media_integrity_violations(m).count() == 0
    m.unpersist()


def test_media_real_decode_raises(spark):
    with pytest.raises(NotImplementedError):
        media.decode_image(b"xx", fake=False)


def test_real_ppm_decode_and_resize(spark):
    import numpy as np

    # hand-built 2x2 P6: known pixels -> exact luma
    pix = bytes([255, 0, 0,  0, 255, 0,  0, 0, 255,  255, 255, 255])
    buf = b"P6\n2 2\n255\n" + pix
    feats = media.decode_image(buf)
    assert (feats["width"], feats["height"]) == (2, 2)
    expected_luma = (0.299 * (255 + 0 + 0 + 255)
                     + 0.587 * (0 + 255 + 0 + 255)
                     + 0.114 * (0 + 0 + 255 + 255)) / 4 / 255.0
    assert feats["mean_luma"] == pytest.approx(expected_luma)
    # comment + PGM handling
    g = media.decode_image(b"P5\n# c\n2 1\n255\n" + bytes([0, 255]))
    assert g["mean_luma"] == pytest.approx(0.5, abs=0.01)
    # resize round-trips through the same decoder
    big = media.resize_image(buf, 4, 4)
    arr, w, h = media.decode_ppm(big)
    assert (w, h) == (4, 4) and arr.shape == (4, 4, 3)
    assert np.array_equal(arr[0, 0], [255, 0, 0])  # nearest-neighbor corners
    assert np.array_equal(arr[3, 3], [255, 255, 255])
    # non-PPM without fake -> explicit stub error
    with pytest.raises(NotImplementedError):
        media.decode_image(b"\x89PNG....")


def test_real_ppm_pipeline(spark):
    m = media.synth_ppm_media(spark, 32)
    feats = media.image_features(m, fake=False).collect()
    assert len(feats) == 32
    assert all(8 <= r["width"] <= 32 and 0.0 <= r["mean_luma"] <= 1.0 for r in feats)
    assert media.media_integrity_violations(m).count() == 0


def test_multi_probe_lsh_recall_lift(spark):
    # 400 deterministic 64-dim vectors; recall@5 vs brute force must not
    # drop — and must strictly rise on this set — as n_probe grows.
    # Measured on this set (near-orthogonal uniform vectors, the HARD case
    # for sign-LSH): recall@5 = 0.15 single-probe -> 0.325 at n_probe=4, a
    # 2.2x lift from probing the three lowest-margin neighbor buckets.
    emb = spark.range(400).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda d: ((F.hash(F.col("id") * 64 + d) % 2001) / 1000.0 - 1.0)
            .cast("float"),
        ).alias("embedding"),
    ).cache()
    queries = emb.where(F.col("vec_id") < 8)
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.brute_force_topk(emb, queries, k=5).collect()
    }

    def recall(n_probe):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in similarity.lsh_topk(
                emb, queries, k=5, n_planes=8, n_probe=n_probe
            ).collect()
        }
        return len(got & truth) / len(truth)

    r1, r4 = recall(1), recall(4)
    assert r4 >= r1
    assert r4 >= 1.5 * r1 or r1 >= 0.9  # documented lift (0.15 -> 0.325 here)

    # driver-computed probe signatures agree bit-for-bit with the
    # executor-side HOF signature fold (single-probe comparison)
    qmap = similarity._collect_query_map(queries, "vec_id", "embedding")
    driver_sigs = {
        qid: s[0]
        for qid, s in similarity.lsh_probe_signatures(qmap, 8).items()
    }
    spark_sigs = {
        r["vec_id"]: r["sig"]
        for r in queries.select(
            "vec_id",
            similarity.sign_lsh_signature(F.col("embedding"), 8).alias("sig"),
        ).collect()
    }
    assert driver_sigs == spark_sigs
    emb.unpersist()


def test_lsh_neardup_multiprobe_recall(spark):
    # seeded near-dup corpus: 150 base vectors + a perturbed copy each
    # (cos ~0.99); ground truth = exact O(n^2) cosine pairs at 0.9.
    # n_probe=1 misses every pair whose perturbation flipped >=1 of the 12
    # sign bits; n_probe=4 re-finds pairs one low-margin bit apart.
    base = spark.range(150).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda d: ((F.hash(F.col("id") * 64 + d) % 2001) / 1000.0)
            .cast("float"),
        ).alias("embedding"),
    )
    pert = base.select(
        (F.col("vec_id") + 1000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x: (x + 0.08).cast("float"),
        ).alias("embedding"),
    )
    emb = base.union(pert).cache()
    truth = {
        (r["id_a"], r["id_b"])
        for r in similarity.cosine_near_duplicates(emb, threshold=0.9).collect()
    }
    assert truth  # the seeding produced real near-dups

    def pairs(n_probe):
        return {
            (r["id_a"], r["id_b"])
            for r in similarity.lsh_near_duplicates(
                emb, threshold=0.9, n_planes=12, n_probe=n_probe
            ).collect()
        }

    p1, p4 = pairs(1), pairs(4)
    # precision is 1.0 by construction (exact cosine filter) -> subsets
    assert p1 <= truth and p4 <= truth
    r1, r4 = len(p1) / len(truth), len(p4) / len(truth)
    assert r4 >= r1
    assert r4 >= min(1.0, 1.2 * r1) or r1 >= 0.95  # documented recall lift
    emb.unpersist()


def test_with_probe_signatures_matches_base_signature(spark, vectors):
    # the probe frame's base signature must agree bit-for-bit with
    # sign_lsh_signature, and the probe list must start with it
    sigp = similarity.with_probe_signatures(
        vectors.select(F.col("vec_id"), F.col("embedding").alias("v")),
        "v", 8, 3, dim=4,
    ).collect()
    direct = {
        r["vec_id"]: r["s"]
        for r in vectors.select(
            "vec_id",
            similarity.sign_lsh_signature(F.col("embedding"), 8, dim=4).alias("s"),
        ).collect()
    }
    for r in sigp:
        assert r["sig"] == direct[r["vec_id"]]
        assert r["probes"][0] == r["sig"]
        assert len(r["probes"]) == 3
        # each extra probe differs from the base by exactly one bit
        for p in r["probes"][1:]:
            assert bin(p ^ r["sig"]).count("1") == 1


def test_duplicate_clusters(spark):
    # two chains + an isolated pair: {a,b,c} via a-b, b-c; {x,y}
    pairs = spark.createDataFrame(
        [("b", "a"), ("b", "c"), ("x", "y"), ("c", "d")],
        "doc_a string, doc_b string",
    )
    got = {r["doc_id"]: r["cluster_id"]
           for r in dedup.duplicate_clusters(pairs).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "d": "a", "x": "x", "y": "x"}
    summary = {r["cluster_id"]: (r["n_docs"], r["doc_ids"]) for r in
               dedup.cluster_summary(dedup.duplicate_clusters(pairs)).collect()}
    assert summary == {"a": (4, ["a", "b", "c", "d"]), "x": (2, ["x", "y"])}


def test_duplicate_clusters_long_chain_converges(spark):
    # a path graph 0-1-2-...-19: diameter 19, min-label needs several
    # rounds (label halves the distance-to-min each round via neighbors'
    # neighbors being one hop)
    pairs = spark.createDataFrame(
        [(f"{i:02d}", f"{i+1:02d}") for i in range(19)],
        "doc_a string, doc_b string",
    )
    got = dedup.duplicate_clusters(pairs).collect()
    assert {r["cluster_id"] for r in got} == {"00"}
    assert len(got) == 20


def test_duplicate_clusters_10k_chain_converges(spark):
    # 10^4-node path graph: diameter 10^4. Min-label propagation needed a
    # round per hop and hard-failed at the 25-round cap; star contraction
    # halves diameter per round, so this converges in ~log2(10^4) ≈ 14
    # rounds under the same default cap.
    n = 10_000
    pairs = spark.createDataFrame(
        [(f"{i:05d}", f"{i+1:05d}") for i in range(n - 1)],
        "doc_a string, doc_b string",
    )
    got = dedup.duplicate_clusters(pairs).collect()
    assert {r["cluster_id"] for r in got} == {"00000"}
    assert len(got) == n
    assert len({r["doc_id"] for r in got}) == n


def test_duplicate_clusters_self_loop_singleton(spark):
    # a self-pair (exact-dup path can emit these) must still label the node
    pairs = spark.createDataFrame(
        [("a", "a"), ("b", "c")], "doc_a string, doc_b string"
    )
    got = {r["doc_id"]: r["cluster_id"]
           for r in dedup.duplicate_clusters(pairs).collect()}
    assert got == {"a": "a", "b": "b", "c": "b"}


def test_bpe_token_count(spark):
    df = spark.createDataFrame(
        [("Hello world, it's 2024!",), ("",), ("  ",)], "text string"
    )
    got = [r["n"] for r in df.select(text.bpe_token_count("text").alias("n")).collect()]
    # Hello| world|,| it|'s| 2024|! -> 7 pre-tokens
    assert got == [7, 0, 1]


def test_simhash_precomputed_signatures_identical(documents):
    """signatures= path (persisted by the caller) must yield the exact
    same near-dup pairs as the internal recompute path."""
    from sparkcheck.dedup import simhash_chunks, simhash_near_duplicates

    base = simhash_near_duplicates(documents).collect()
    sig = simhash_chunks(documents).persist()
    try:
        pre = simhash_near_duplicates(documents, signatures=sig).collect()
    finally:
        sig.unpersist()
    assert sorted(map(repr, base)) == sorted(map(repr, pre))


def test_class_balance(spark):
    import math

    from sparkcheck.text import class_balance

    df = spark.createDataFrame(
        [("a",)] * 6 + [("b",)] * 3 + [(None,)] * 1, "label string"
    )
    rows = {r.label: r for r in class_balance(df, "label").collect()}
    assert set(rows) == {"a", "b", None}
    assert rows["a"].n == 6 and abs(rows["a"].frac - 0.6) < 1e-9
    assert rows[None].n == 1  # NULL labels surface as their own class
    want_ent = -(0.6 * math.log2(0.6) + 0.3 * math.log2(0.3) + 0.1 * math.log2(0.1))
    assert abs(rows["a"].entropy_bits - round(want_ent, 6)) < 1e-6
    assert rows["b"].n_classes == 3
    assert abs(rows["b"].imbalance_ratio - 6.0) < 1e-9


def test_select_canonical_quality_and_ties(spark):
    from sparkcheck.dedup import select_canonical

    docs = spark.createDataFrame(
        [(1, 10.0), (2, 99.0), (3, 99.0), (4, 5.0), (9, 7.0)],
        "doc_id int, q double",
    )
    # cluster {1,2,3} labeled 1; 4 in its own cluster row; 9 unclustered
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4)], "doc_id int, cluster_id int"
    )
    out = {
        r["doc_id"]: (r["cluster_id"], r["is_canonical"])
        for r in select_canonical(docs, clusters, quality_col="q").collect()
    }
    # keeper of {1,2,3}: max q = 99 shared by 2 and 3 -> smallest id (2)
    assert out[1] == (1, False)
    assert out[2] == (1, True)
    assert out[3] == (1, False)
    assert out[4] == (4, True)   # singleton cluster keeps itself
    assert out[9] == (9, True)   # unclustered keeps itself
    # exactly one keeper per cluster
    df = select_canonical(docs, clusters, quality_col="q")
    per = df.where("is_canonical").groupBy("cluster_id").count()
    assert per.where("count != 1").count() == 0


def test_select_canonical_min_id_default(spark):
    from pyspark.sql import functions as F

    from sparkcheck.dedup import select_canonical

    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id int")
    clusters = spark.createDataFrame(
        [(0, 0), (3, 0), (5, 0)], "doc_id int, cluster_id int"
    )
    out = select_canonical(docs, clusters)  # no quality: min-id == label
    keep = {r["doc_id"] for r in out.where("is_canonical").collect()}
    assert keep == {0, 1, 2, 4}
    # no-quality path adds no aggregation: plan is join + project only
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" not in plan


# ---------------------------------------------------------------------------
# int8 embedding quantization (round 5 tail)
# ---------------------------------------------------------------------------


def test_quantize_embeddings_codes_and_scale(spark):
    rows = [
        (0, [1.0, -0.5, 0.25, 0.0]),
        (1, [0.0, 0.0, 0.0, 0.0]),  # zero vector
        (2, [2.0, 2.0, 2.0, 2.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        r["vec_id"]: (list(r["qvec"]), r["qscale"])
        for r in similarity.quantize_embeddings(df).collect()
    }
    # max|x|=1 -> codes round(127*x); round-half-up: -63.5 -> -64
    assert got[0][0] == [127, -64, 32, 0]
    assert got[0][1] == pytest.approx(1.0 / 127.0)
    assert got[1] == ([0, 0, 0, 0], 0.0)  # zero vector: zero codes, scale 0
    assert got[2][0] == [127, 127, 127, 127]
    # reconstruction error bounded by scale/2 per component
    for vid, (codes, scale) in got.items():
        orig = dict(rows)[vid]
        for c, x in zip(codes, orig):
            assert abs(c * scale - x) <= scale / 2 + 1e-12


def test_quantized_topk_differential_and_recall(spark, vectors):
    q = vectors.where("vec_id = 0")
    a = similarity.quantized_topk(vectors, q, k=2, scorer="numpy").collect()
    b = similarity.quantized_topk(vectors, q, k=2, scorer="hof").collect()
    key = lambda r: (r["query_id"], r["rank"])
    assert sorted(map(tuple, a), key=lambda t: (t[0], t[3])) == sorted(
        map(tuple, b), key=lambda t: (t[0], t[3])
    )
    # quantized ranking agrees with the exact float ranking on this corpus
    exact = similarity.brute_force_topk(vectors, q, k=2).collect()
    assert [r["neighbor_id"] for r in sorted(a, key=key)] == [
        r["neighbor_id"] for r in sorted(exact, key=lambda r: (r["query_id"], r["rank"]))
    ]
    # identical vectors still score qcos == 1 after quantization
    assert max(r["qcos"] for r in a) <= 1.0 + 1e-9


def test_pq_codebooks_shapes_and_validation(spark, vectors):
    books = similarity.pq_codebooks(vectors, m=2, k=4, dim=4)
    assert len(books) == 2 and all(len(b) == 4 for b in books)
    assert all(len(c) == 2 for b in books for c in b)
    # seed books are subspace slices of the 4 lowest-id vectors
    assert books[0][0] == [1.0, 0.0] and books[1][0] == [0.0, 0.0]
    with pytest.raises(ValueError, match="not divisible"):
        similarity.pq_codebooks(vectors, m=3, k=4, dim=4)
    with pytest.raises(ValueError, match="need >= 6"):
        similarity.pq_codebooks(vectors, m=2, k=6, dim=4)


def test_pq_encode_codes_and_ties(spark, vectors):
    books = similarity.pq_codebooks(vectors, m=2, k=4, dim=4)
    codes = {
        r["vec_id"]: list(r["pq_code"])
        for r in similarity.pq_encode(vectors, books).collect()
    }
    assert all(len(c) == 2 and all(0 <= x < 4 for x in c) for c in codes.values())
    # a seed vector encodes to its own codebook entries (distance 0)
    assert codes[0] == [0, 0] or codes[0][0] == 0
    # tie-break: duplicate centroids (vec 0 dup'd as seed) -> lowest cid wins
    dup = vectors.union(
        vectors.where("vec_id = 0").select(F.lit(-1).alias("vec_id"), "embedding")
    )
    books_dup = similarity.pq_codebooks(dup, m=2, k=2, dim=4)
    assert books_dup[0][0] == books_dup[0][1]  # ids -1 and 0 are duplicates
    cdup = {
        r["vec_id"]: list(r["pq_code"])
        for r in similarity.pq_encode(dup, books_dup).collect()
    }
    assert cdup[0][0] == 0  # argmin tie -> lowest centroid id


def test_pq_topk_matches_local_reference_and_partitioning(spark, vectors):
    import numpy as np

    books = similarity.pq_codebooks(vectors, m=2, k=4, dim=4)
    q = vectors.where("vec_id = 0")
    got = sorted(
        map(tuple, similarity.pq_topk(vectors, q, books, k=3).collect())
    )
    # local ADC reference with the same sequential fold order
    cbs = [np.asarray(b, dtype=np.float64) for b in books]
    rows = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
            for r in vectors.collect()}
    def enc(v):
        out = []
        for mi in range(2):
            sub = v[mi * 2:(mi + 1) * 2]
            acc = np.zeros(4)
            for i in range(2):
                acc += (sub[i] - cbs[mi][:, i]) ** 2
            out.append(int(np.argmin(acc)))
        return out
    qv = rows[0]
    scored = []
    for nid, v in rows.items():
        if nid == 0:
            continue
        code = enc(v)
        s = 0.0
        for mi in range(2):
            sub = qv[mi * 2:(mi + 1) * 2]
            acc = np.zeros(4)
            for i in range(2):
                acc += (sub[i] - cbs[mi][:, i]) ** 2
            s += acc[code[mi]]
        scored.append((round(s, 6), nid))
    scored.sort()
    want = sorted(
        (0, nid, ad, rk + 1) for rk, (ad, nid) in enumerate(scored[:3])
    )
    assert got == want
    # partitioning-invariant
    got13 = sorted(
        map(tuple, similarity.pq_topk(vectors.repartition(13), q, books, k=3).collect())
    )
    assert got13 == got


def test_pq_topk_rerank_exact_distances_and_recall(spark, vectors):
    import numpy as np

    books = similarity.pq_codebooks(vectors, m=2, k=4, dim=4)
    q = vectors.where("vec_id = 0")
    # rerank_k covering the whole corpus -> output == exact L2 top-k
    out = similarity.pq_topk(vectors, q, books, k=2, rerank_k=4).collect()
    rows = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
            for r in vectors.collect()}
    exact = sorted(
        (round(float(np.sum((rows[0] - v) ** 2)), 6), nid)
        for nid, v in rows.items() if nid != 0
    )[:2]
    got = sorted((r["dist"], r["neighbor_id"]) for r in out)
    assert got == exact
    assert {r["rank"] for r in out} == {1, 2}


def test_ivfpq_full_probe_equals_pq_and_rerank(spark, vectors):
    books = similarity.pq_codebooks(vectors, m=2, k=4, dim=4)
    q = vectors.where("vec_id = 0")
    # with every centroid probed, IVF-PQ degenerates to plain PQ exactly
    a = sorted(map(tuple, similarity.ivfpq_topk(
        vectors, q, books, k=3, n_centroids=4, n_probe=4).collect()))
    b = sorted(map(tuple, similarity.pq_topk(vectors, q, books, k=3).collect()))
    assert a == b
    # partial probe: a SUBSET of the full-probe rows (possibly empty on a
    # tiny corpus when the probed partition holds only the query itself)
    c = similarity.ivfpq_topk(
        vectors, q, books, k=3, n_centroids=4, n_probe=1).collect()
    assert len(c) <= 3
    assert {r["neighbor_id"] for r in c} <= {t[1] for t in a} | {
        r["neighbor_id"] for r in similarity.pq_topk(
            vectors, q, books, k=5).collect()}
    # rerank path emits exact distances
    d = similarity.ivfpq_topk(
        vectors, q, books, k=2, n_centroids=4, n_probe=4, rerank_k=4).collect()
    e = similarity.pq_topk(vectors, q, books, k=2, rerank_k=4).collect()
    assert sorted(map(tuple, d)) == sorted(map(tuple, e))


def test_quantize_arrow_impl_identical_to_hof(spark):
    import numpy as np

    # adversarial values incl. exact-.5 rounding boundaries and a zero vec
    rows = []
    for i in range(200):
        base = [((i * 31 + j * 7) % 255 - 127) / 127.0 for j in range(8)]
        rows.append((i, base))
    rows.append((997, [0.0] * 8))
    rows.append((998, [0.5, -0.5, 0.25, -0.25, 1.0, -1.0, 0.75, -0.75]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    a = {
        r["vec_id"]: (list(r["qvec"]), r["qscale"])
        for r in similarity.quantize_embeddings(df, impl="hof").collect()
    }
    b = {
        r["vec_id"]: (list(r["qvec"]), r["qscale"])
        for r in similarity.quantize_embeddings(df, impl="arrow").collect()
    }
    assert a == b
    # stored arrow codes feed quantized_topk identically to on-the-fly
    codes = similarity.quantize_embeddings(df, impl="arrow").select(
        "vec_id", "qvec"
    )
    q = df.where("vec_id < 3")
    x = sorted(map(tuple, similarity.quantized_topk(df, q, k=3).collect()))
    y = sorted(map(tuple, similarity.quantized_topk(
        df, q, k=3, codes=codes).collect()))
    assert x == y


def test_lsh_design_curve_and_integration(spark, corpus):
    d = similarity  # noqa: F841 — keep module import style consistent
    from sparkcheck.dedup import lsh_design, near_duplicates

    cfg = lsh_design(0.8)
    b, r = cfg["n_bands"], cfg["band_size"]
    # S-curve identity at the threshold, hand-evaluated
    assert cfg["recall_at_threshold"] == round(1 - (1 - 0.8**r) ** b, 6)
    assert cfg["recall_at_threshold"] >= 0.9
    assert cfg["fp_rate_at_half_threshold"] <= 0.05
    assert cfg["n_hashes"] == b * r
    assert cfg["s50"] == round((1 / b) ** (1 / r), 6)
    # cheaper for easier (higher) thresholds
    assert lsh_design(0.9)["n_hashes"] <= cfg["n_hashes"]
    with pytest.raises(ValueError, match="raise n_hashes_max"):
        lsh_design(0.5, n_hashes_max=64)
    with pytest.raises(ValueError, match="threshold"):
        lsh_design(1.5)
    # the designed config drives the real pipeline: exact dups found
    found = {
        (x["doc_a"], x["doc_b"])
        for x in near_duplicates(
            corpus, threshold=0.8, n_hashes=cfg["n_hashes"],
            band_size=cfg["band_size"],
        ).collect()
    }
    assert (1, 2) in found


# ---------------------------------------------------------------------------
# review-fix regression tests (round 5 tail)
# ---------------------------------------------------------------------------


def test_pq_encode_wide_codebooks_no_wraparound(spark):
    # k > 127 centroids per subspace must widen the code type (int8 would
    # silently wrap ids >= 128) — seed vectors must encode to themselves
    rows = [(i, [float(i), float(2 * i), float(3 * i), float(i + 1)])
            for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    books = similarity.pq_codebooks(df, m=2, k=200, dim=4)
    codes = similarity.pq_encode(df, books)
    assert codes.schema["pq_code"].dataType.elementType.typeName() == "short"
    got = {r["vec_id"]: list(r["pq_code"]) for r in codes.collect()}
    assert got[150] == [150, 150] and got[199] == [199, 199]
    with pytest.raises(ValueError, match="int16"):
        similarity.pq_encode(df, [[[0.0]] * 40000])


def test_quantized_topk_zero_vectors_excluded(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),
        (2, [0.0, 0.0, 0.0, 0.0]),   # zero vector: no direction
        (3, [0.5, 0.5, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.where("vec_id <= 2")  # includes the zero vector as a query
    for scorer in ("numpy", "hof"):
        out = similarity.quantized_topk(df, q, k=3, scorer=scorer).collect()
        assert all(r["neighbor_id"] != 2 for r in out), scorer  # never a hit
        assert all(r["query_id"] != 2 for r in out), scorer     # never a query
        assert all(r["qcos"] == r["qcos"] for r in out), scorer  # no NaN
    a = sorted(map(tuple, similarity.quantized_topk(df, q, k=3, scorer="numpy").collect()))
    b = sorted(map(tuple, similarity.quantized_topk(df, q, k=3, scorer="hof").collect()))
    assert a == b
    with pytest.raises(ValueError, match="scorer"):
        similarity.quantized_topk(df, q, k=3, scorer="gemm")


def test_quantize_arrow_null_and_empty(spark):
    rows = [(0, [1.0, -0.5]), (1, None), (2, [0.25, 0.75])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    a = {r["vec_id"]: (r["qvec"] and list(r["qvec"]), r["qscale"])
         for r in similarity.quantize_embeddings(df, impl="hof").collect()}
    b = {r["vec_id"]: (r["qvec"] and list(r["qvec"]), r["qscale"])
         for r in similarity.quantize_embeddings(df, impl="arrow").collect()}
    assert a == b and a[1] == (None, None)
    empty = df.where("vec_id < 0")
    assert similarity.quantize_embeddings(empty, impl="arrow").count() == 0


def test_weighted_sample_large_weights_stay_proportional(spark):
    from sparkcheck.sampling import weighted_sample

    # 1e10/1e13 weights: a fixed-decimal-rounded key would collapse ALL
    # keys into ties and select by id order; full precision keeps the
    # 1000x-heavier rows dominant
    rows = [(i, 1e13 if i % 10 == 0 else 1e10) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    picked = [r["doc_id"] for r in weighted_sample(df, "w", 40, id_col="doc_id").collect()]
    heavy = sum(1 for i in picked if i % 10 == 0)
    assert heavy >= 30, f"only {heavy}/40 heavy rows selected"
    # and NOT simply the lowest ids (the id-tie-break failure signature)
    assert picked != sorted(picked)[:40] or max(picked) > 100


def test_ivfpq_stored_index_matches_recompute(spark, vectors):
    books = similarity.pq_codebooks(vectors, m=2, k=4, dim=4)
    q = vectors.where("vec_id = 0")
    idx = similarity.ivfpq_index(vectors, books, n_centroids=4)
    assert set(idx.columns) == {"vec_id", "centroid_id", "pq_code"}
    a = sorted(map(tuple, similarity.ivfpq_topk(
        vectors, q, books, k=3, n_centroids=4, n_probe=4).collect()))
    b = sorted(map(tuple, similarity.ivfpq_topk(
        vectors, q, books, k=3, n_centroids=4, n_probe=4, index=idx).collect()))
    assert a == b
    c = sorted(map(tuple, similarity.ivfpq_topk(
        vectors, q, books, k=2, n_centroids=4, n_probe=4, rerank_k=4,
        index=idx).collect()))
    d = sorted(map(tuple, similarity.pq_topk(vectors, q, books, k=2, rerank_k=4).collect()))
    assert c == d
