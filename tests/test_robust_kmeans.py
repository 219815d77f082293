"""Round-4 late additions: exact spine quantiles / robust stats,
Lloyd k-means refinement, n-gram novelty, cluster-balanced sampling."""

import pyspark.sql.functions as F

from sparkcheck import ExpectationSuite, sampling, similarity, text, validate_df
from sparkcheck.stats import exact_quantiles, robust_profile


def test_exact_quantiles_ungrouped(spark):
    df = spark.createDataFrame(
        [(float(v),) for v in range(1, 11)] + [(None,)], "x double"
    )
    r = exact_quantiles(df, "x", [0.0, 0.25, 0.5, 0.75, 1.0]).collect()[0]
    # type-1 (lower) quantiles at ranks ceil(p*10); nulls excluded
    assert r["n"] == 10
    assert (r["p0"], r["p25"], r["p50"], r["p75"], r["p100"]) == (
        1.0, 3.0, 5.0, 8.0, 10.0,
    )


def test_exact_quantiles_grouped_and_ties(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 1.0), ("a", 2.0), ("b", 5.0), ("b", 7.0)],
        "g string, x double",
    )
    got = {
        r["g"]: (r["n"], r["p50"])
        for r in exact_quantiles(df, "x", [0.5], by=["g"]).collect()
    }
    # group a: ranks over [1,1,2], ceil(1.5)=2 -> 1.0 (tie mass counted)
    assert got == {"a": (3, 1.0), "b": (2, 5.0)}


def test_robust_profile_hand_computed(spark):
    df = spark.createDataFrame(
        [(float(v),) for v in range(1, 11)] + [(None,)], "x double"
    )
    r = robust_profile(df, "x", trim=0.1).collect()[0]
    assert r["n"] == 10
    assert r["median"] == 5.0
    assert r["mad"] == 2.0  # median of |x-5| over [0,1,1,2,2,3,3,4,4,5]
    assert r["iqr"] == 5.0  # q75=8, q25=3
    # k=1: trim drops {1,10} -> mean(2..9)=5.5; winsor replaces them with
    # the rank-2 / rank-9 values (2 and 9) -> 55/10 = 5.5
    assert r["trimmed_mean"] == 5.5
    assert r["winsorized_mean"] == 5.5


def test_exact_quantiles_integer_rank_arithmetic(spark):
    # float ceil(0.07*100) is 8 (product rounds to 7.000000000000001);
    # the rank must be the true ceil(7) = 7 -> value 7.0
    df = spark.createDataFrame([(float(v),) for v in range(1, 101)], "x double")
    r = exact_quantiles(df, "x", [0.07, 0.29]).collect()[0]
    assert r["p7"] == 7.0
    # floor(0.29*100) on doubles is 28 (28.999999999999996) — the trim
    # arithmetic shares the integer fix; rank ceil(29) -> 29.0
    assert r["p29"] == 29.0


def test_robust_profile_rejects_bad_trim(spark):
    import pytest as _pytest

    df = spark.createDataFrame([(1.0,)], "x double")
    for bad in (0.5, -0.1, 1.0):
        with _pytest.raises(ValueError, match="trim"):
            robust_profile(df, "x", trim=bad)


def test_robust_profile_exposes_quartiles(spark):
    df = spark.createDataFrame([(float(v),) for v in range(1, 11)], "x double")
    r = robust_profile(df, "x").collect()[0]
    assert (r["q25"], r["q75"]) == (3.0, 8.0)


def test_kmeans_rejects_ragged_embeddings(spark):
    import pytest as _pytest

    # every vector null at dim 1 -> the centroid update averages NULL
    rows = [(1, [1.0, None]), (2, [0.5, None])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    with _pytest.raises(ValueError, match="null elements or vectors shorter"):
        similarity.kmeans(df, k=2, iters=1)


def test_robust_profile_all_null(spark):
    df = spark.createDataFrame([(None,), (None,)], "x double")
    r = robust_profile(df, "x").collect()[0]
    assert r["n"] == 0
    assert r["median"] is None and r["mad"] is None


def test_mad_expectation(spark):
    df = spark.createDataFrame([(float(v),) for v in range(1, 11)], "x double")
    suite = ExpectationSuite("mad")
    suite.add(
        "expect_column_median_absolute_deviation_to_be_between",
        column="x", min_value=1.5, max_value=2.5,
    )
    res = validate_df(df, suite)
    evr = res["results"][0]
    assert evr["success"] is True
    assert evr["result"]["observed_value"] == 2.0


def _clustered_vectors():
    a = [1.0, 0.05, 0.0, 0.0]
    b = [0.0, 0.05, 1.0, 0.0]
    rows = []
    for i in range(1, 7):
        base = a if i % 2 == 1 else b  # ids 1,2 (the seeds) straddle both
        vec = [x + 0.01 * i for x in base]
        rows.append((i, vec))
    return rows


def test_kmeans_separates_clusters(spark):
    df = spark.createDataFrame(_clustered_vectors(), "vec_id long, embedding array<float>")
    cents, assigned = similarity.kmeans(df, k=2, iters=2)
    got = {r["vec_id"]: r["centroid_id"] for r in assigned.collect()}
    assert {got[1], got[3], got[5]} == {got[1]}  # odd ids share a cluster
    assert {got[2], got[4], got[6]} == {got[2]}
    assert got[1] != got[2]
    assert len(cents) == 2 and len(cents[0][1]) == 4
    assert all(r["c_cos"] > 0.99 for r in assigned.collect())


def test_kmeans_deterministic(spark):
    df = spark.createDataFrame(_clustered_vectors(), "vec_id long, embedding array<float>")
    _, a1 = similarity.kmeans(df, k=2, iters=2)
    _, a2 = similarity.kmeans(df, k=2, iters=2)
    assert sorted(map(tuple, a1.collect())) == sorted(map(tuple, a2.collect()))


def test_kmeans_empty_cluster_keeps_seed(spark):
    # seed 3 duplicates seed 1's vector: every tie resolves to the lower
    # centroid id, so cluster 2 goes empty and must keep its old centroid
    rows = [
        (1, [1.0, 0.0]),
        (2, [0.0, 1.0]),
        (3, [1.0, 0.0]),
        (4, [0.9, 0.1]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents, assigned = similarity.kmeans(df, k=3, iters=1)
    assert cents[2][1] == [1.0, 0.0]  # kept verbatim, not re-averaged
    # the kept seed stays a live centroid: the final assignment hands the
    # exact-match vectors back to it (cos 1.0 beats the averaged c0)
    got = {r["vec_id"]: r["centroid_id"] for r in assigned.collect()}
    assert got[1] == 2 and got[3] == 2


def test_novelty_scores(spark):
    ref = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id long, text string"
    )
    delivery = spark.createDataFrame(
        [
            (1, "the quick brown fox"),  # both trigrams known -> 0.0
            (2, "completely novel words appear here"),  # all novel -> 1.0
            (3, "hi there"),  # < 3 tokens -> no evidence
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_novel"], r["novelty"])
        for r in text.novelty_scores(delivery, ref).collect()
    }
    assert got[1] == (2, 0, 0.0)
    assert got[2] == (3, 3, 1.0)
    assert got[3] == (0, 0, None)


def test_cluster_balanced_sample_cap_and_determinism(spark):
    rows = []
    for i in range(1, 41):
        # ids 1 and 2 (the deterministic seeds) straddle the two groups;
        # the rest are imbalanced 30/8
        in_a = i == 1 or (i >= 3 and i <= 32)
        base = [1.0, 0.0] if in_a else [0.0, 1.0]
        rows.append((i, [x + 0.001 * i for x in base]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    kept = sampling.cluster_balanced_sample(df, cap=5, n_centroids=2)
    counts = {
        r["centroid_id"]: r["n"]
        for r in kept.groupBy("centroid_id").agg(F.count("*").alias("n")).collect()
    }
    assert all(n <= 5 for n in counts.values())
    assert sum(counts.values()) == 10  # both clusters hit the cap
    ids1 = sorted(r["vec_id"] for r in kept.collect())
    ids2 = sorted(
        r["vec_id"]
        for r in sampling.cluster_balanced_sample(df, cap=5, n_centroids=2).collect()
    )
    assert ids1 == ids2
    assert set(ids1) <= set(range(1, 41))


def test_two_sample_distances_hand_computed(spark):
    from sparkcheck.distribution import two_sample_distances

    a = spark.createDataFrame([(1.0,), (2.0,), (None,)], "x double")
    b = spark.createDataFrame([(2.0,), (3.0,)], "x double")
    r = two_sample_distances(a, b, "x").collect()[0]
    # spine 1,2,3: F_a = .5,1,1; F_b = 0,.5,1 -> KS .5;
    # W1 = .5*(2-1) + .5*(3-2) = 1.0 (each point moves one unit)
    assert (r["n_a"], r["n_b"]) == (2, 2)
    assert r["ks_stat"] == 0.5
    assert r["wasserstein"] == 1.0


def test_two_sample_distances_identical_and_empty(spark):
    from sparkcheck.distribution import two_sample_distances

    a = spark.createDataFrame([(1.0,), (5.0,), (5.0,)], "x double")
    r = two_sample_distances(a, a, "x").collect()[0]
    assert r["ks_stat"] == 0.0 and r["wasserstein"] == 0.0
    empty = spark.createDataFrame([], "x double")
    r2 = two_sample_distances(a, empty, "x").collect()[0]
    assert r2["n_b"] == 0 and r2["ks_stat"] is None and r2["wasserstein"] is None


def test_semantic_dedup_arrow_matches_join(spark):
    import random

    rng = random.Random(7)
    rows = []
    for i in range(1, 81):
        if i % 7 == 0:  # plant near-duplicates of the previous vector
            base = rows[-1][1]
            vec = [x + 0.001 for x in base]
        else:
            vec = [rng.uniform(-1, 1) for _ in range(8)]
        rows.append((i, vec))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    arrow = similarity.semantic_dedup(
        df, threshold=0.9, n_centroids=4, pair_impl="arrow"
    )
    join = similarity.semantic_dedup(
        df, threshold=0.9, n_centroids=4, pair_impl="join"
    )
    a = sorted(map(tuple, arrow.collect()))
    j = sorted(map(tuple, join.collect()))
    assert a == j
    assert any(not kept for _, _, kept in a)  # the planted dups are caught


def test_arrow_assignment_matches_fold(spark):
    import random

    rng = random.Random(11)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(1, 101)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    from sparkcheck.similarity import ivf_assign

    _, fold = ivf_assign(df, n_centroids=8, assign_impl="fold")
    _, arrow = ivf_assign(df, n_centroids=8, assign_impl="arrow")
    f = {r["vec_id"]: r["centroid_id"] for r in fold.collect()}
    a = {r["vec_id"]: r["centroid_id"] for r in arrow.collect()}
    assert f == a
    # kmeans end-to-end too (2 refinement rounds + scored final pass)
    _, kf = similarity.kmeans(df, k=4, iters=2, assign_impl="fold")
    _, ka = similarity.kmeans(df, k=4, iters=2, assign_impl="arrow")
    assert sorted(map(tuple, kf.collect())) == sorted(map(tuple, ka.collect()))


def test_two_sample_distances_grouped(spark):
    from sparkcheck.distribution import two_sample_distances

    a = spark.createDataFrame(
        [("g1", 1.0), ("g1", 2.0), ("g2", 5.0), (None, 9.0)],
        "g string, x double",
    )
    b = spark.createDataFrame(
        [("g1", 2.0), ("g1", 3.0), ("g3", 7.0)], "g string, x double"
    )
    got = {
        r["g"]: (r["n_a"], r["n_b"], r["ks_stat"], r["wasserstein"])
        for r in two_sample_distances(a, b, "x", by=["g"]).collect()
    }
    # g1 replays the ungrouped hand example; g2/g3 are one-sided (NULLs);
    # the NULL-group row is excluded entirely
    assert got["g1"] == (2, 2, 0.5, 1.0)
    assert got["g2"] == (1, 0, None, None)
    assert got["g3"] == (0, 1, None, None)
    assert set(got) == {"g1", "g2", "g3"}
