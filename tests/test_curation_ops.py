"""Tests for round-3 curation operators: repetition metrics, PII
scrubbing, decontamination, deterministic sampling."""

import pyspark.sql.functions as F

from sparkcheck import dedup, sampling, text


def test_repetition_profile(spark):
    df = spark.createDataFrame(
        [(1, "a b a b c"), (2, ""), (3, "x y z")],
        "doc_id int, text string",
    )
    got = {r["doc_id"]: (r["n_tokens"], r["dup_token_frac"],
                         r["dup_2gram_frac"], r["dup_3gram_frac"])
           for r in text.repetition_profile(df).collect()}
    # doc 1: tokens a,b,a,b,c -> 2/5 dups; bigrams "a b","b a","a b","b c"
    # -> 1/4 dups; trigrams all distinct
    assert got[1] == (5, 0.4, 0.25, 0.0)
    assert got[2] == (0, None, None, None)
    assert got[3] == (3, 0.0, 0.0, 0.0)  # 1 trigram, no repeats -> 0.0


def test_repetition_single_trigram(spark):
    df = spark.createDataFrame([(1, "x y z")], "doc_id int, text string")
    r = text.repetition_profile(df).collect()[0]
    assert r["dup_3gram_frac"] == 0.0  # one trigram, no repeats


def test_pii_counts_and_scrub(spark):
    df = spark.createDataFrame(
        [(1, "write bob@x.co or sue@y.org, call +1 555 123 4567, "
             "host 10.0.0.1, ssn 123-45-6789")],
        "doc_id int, text string",
    )
    r = df.select(*text.pii_counts("text"),
                  text.scrub_pii("text").alias("s")).collect()[0]
    assert (r["pii_email"], r["pii_ipv4"], r["pii_phone"], r["pii_ssn"]) == (
        2, 1, 1, 1)
    assert "@" not in r["s"] and "555" not in r["s"] and "10.0.0.1" not in r["s"]
    assert r["s"].count("[PII]") == 5


def test_contamination(spark):
    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps"),   # shares "the quick brown","quick brown fox"
         (2, "totally unrelated words here"),
         (3, "quick brown fox runs far")],   # shares "quick brown fox"
        "doc_id int, text string",
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox")], "doc_id int, text string"
    )
    got = {r["doc_id"]: r["n_overlap"]
           for r in dedup.contamination(corpus, bench, n=3).collect()}
    assert got == {1: 2, 3: 1}
    # threshold filters
    got2 = {r["doc_id"] for r in
            dedup.contamination(corpus, bench, n=3, min_overlap=2).collect()}
    assert got2 == {1}


def test_contamination_broadcasts_benchmark(spark):
    corpus = spark.createDataFrame([(1, "a b c d")], "doc_id int, text string")
    bench = spark.createDataFrame([(9, "a b c")], "doc_id int, text string")
    plan = dedup.contamination(corpus, bench)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_hash_fraction_deterministic_and_uniform(spark):
    df = spark.range(0, 2000).select(
        sampling.hash_fraction(F.col("id"), salt="s").alias("h"))
    rows = [r["h"] for r in df.collect()]
    assert all(0.0 <= h < 1.0 for h in rows)
    # deterministic across evaluations
    rows2 = [r["h"] for r in df.collect()]
    assert rows == rows2
    # roughly uniform
    frac_under_half = sum(1 for h in rows if h < 0.5) / len(rows)
    assert 0.45 < frac_under_half < 0.55


def test_stratified_sample_nested_and_exact(spark):
    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 2 == 0).cast("string").alias("s"))
    small = sampling.stratified_sample(df, "s", {"true": 0.2, "false": 0.5}, "id")
    big = sampling.stratified_sample(df, "s", {"true": 0.4, "false": 0.8}, "id")
    small_ids = {r["id"] for r in small.collect()}
    big_ids = {r["id"] for r in big.collect()}
    assert small_ids <= big_ids  # nested: raising rates only adds rows
    # unknown stratum defaults to 0
    none_kept = sampling.stratified_sample(df, "s", {}, "id").count()
    assert none_kept == 0


def test_sample_to_token_budget(spark):
    df = spark.createDataFrame(
        [(i, "src%d" % (i % 2), 100) for i in range(100)],
        "doc_id int, source string, ntok int",
    )
    # 10k tokens, 2 strata x 5000 each, 5000/stratum budget on 5000 actual
    # tokens... make strata unequal: double stratum-1 token counts
    df = df.withColumn("ntok", F.when(F.col("source") == "src1", 200)
                       .otherwise(F.col("ntok")))
    rates = sampling.token_budget_rates(df, 6000, "source", "ntok")
    assert rates["src0"] == min(1.0, 3000 / 5000)
    assert rates["src1"] == min(1.0, 3000 / 10000)
    out = sampling.sample_to_token_budget(df, 6000, "source", "ntok", "doc_id")
    kept = out.groupBy("source").agg(F.sum("ntok").alias("t")).collect()
    got = {r["source"]: r["t"] for r in kept}
    # each stratum lands near its 3000-token share (hash sampling is
    # exact-in-expectation; 50 docs/stratum -> loose bounds)
    assert 1000 < got["src0"] <= 5000
    assert 1000 < got["src1"] <= 10000


def test_two_sample_drift_identical_and_shifted(spark):
    from sparkcheck.distribution import two_sample_drift

    a = spark.createDataFrame([(float(i % 10),) for i in range(1000)], "x double")
    same = two_sample_drift(a, a, "x", [0, 2, 4, 6, 8, 10]).collect()[0]
    assert same.psi == 0.0 and same.kl_ab == 0.0
    assert same.n_a == same.n_b == 1000

    b = spark.createDataFrame(
        [(float(i % 10) if i % 3 else 9.0,) for i in range(1000)], "x double"
    )
    moved = two_sample_drift(a, b, "x", [0, 2, 4, 6, 8, 10]).collect()[0]
    assert moved.psi > 0.05  # mass shifted into the top bin
    assert moved.kl_ab != 0.0


# ---------------------------------------------------------------------------
# round-4 curation operators: per-group caps, hash splits, boilerplate
# discovery, funnel accounting
# ---------------------------------------------------------------------------


def test_per_group_cap_exact_and_deterministic(spark):
    rows = [(i, f"g{i % 3}") for i in range(30)]
    df = spark.createDataFrame(rows, "k int, g string")
    capped = sampling.per_group_cap(df, "g", 4, "k")
    counts = {r["g"]: r["n"] for r in
              capped.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert counts == {"g0": 4, "g1": 4, "g2": 4}
    # deterministic: same selection twice
    a = sorted(r["k"] for r in capped.collect())
    b = sorted(r["k"] for r in sampling.per_group_cap(df, "g", 4, "k").collect())
    assert a == b
    # groups smaller than the cap are kept whole
    small = spark.createDataFrame([(1, "x"), (2, "x")], "k int, g string")
    assert sampling.per_group_cap(small, "g", 10, "k").count() == 2


def test_per_group_cap_superset_stability(spark):
    # growing the corpus never evicts a kept row unless a smaller-hash row
    # arrives in its group — the kept set is the hash-order prefix, so the
    # cap-4 selection from 20 rows is a subset of the cap-8 one
    df = spark.createDataFrame([(i, "g") for i in range(20)], "k int, g string")
    k4 = {r["k"] for r in sampling.per_group_cap(df, "g", 4, "k").collect()}
    k8 = {r["k"] for r in sampling.per_group_cap(df, "g", 8, "k").collect()}
    assert k4 < k8 and len(k4) == 4 and len(k8) == 8


def test_hash_split_partition_and_balance(spark):
    df = spark.createDataFrame([(i, "l%d" % (i % 2)) for i in range(2000)],
                               "k int, lab string")
    sp = sampling.hash_split(df, {"train": 0.8, "val": 0.1, "test": 0.1}, "k")
    # exhaustive + disjoint: every row gets exactly one split
    assert sp.where(F.col("split").isNull()).count() == 0
    assert sp.count() == 2000
    by = {r["split"]: r["n"] for r in
          sp.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(by) == {"train", "val", "test"}
    assert 1500 < by["train"] < 1750  # ~80% of 2000, hash-uniform
    bal = sampling.split_balance(sp, "split", "lab").collect()
    fr = {(r["split"], r["lab"]): r["frac_of_split"] for r in bal}
    tot = {}
    for (s, _), f in fr.items():
        tot[s] = tot.get(s, 0.0) + f
    for s, f in tot.items():
        assert abs(f - 1.0) < 1e-4, (s, f)


def test_hash_split_join_stable(spark):
    # same key -> same split in two different tables (the leak-safety
    # property)
    a = spark.createDataFrame([(i,) for i in range(300)], "k int")
    b = spark.createDataFrame([(i, i * 2) for i in range(300)], "k int, v int")
    w = {"train": 0.5, "test": 0.5}
    sa = sampling.hash_split(a, w, "k").select("k", F.col("split").alias("s1"))
    sb = sampling.hash_split(b, w, "k").select("k", F.col("split").alias("s2"))
    assert sa.join(sb, "k").where(F.col("s1") != F.col("s2")).count() == 0


def test_boilerplate_ngrams_doc_freq(spark):
    df = spark.createDataFrame(
        [
            (1, "subscribe to our newsletter now please"),
            (2, "subscribe to our newsletter today friends"),
            (3, "subscribe to our newsletter today again"),
            (4, "totally unrelated words here"),
        ],
        "doc_id int, text string",
    )
    got = {r["ngram"]: r["doc_freq"]
           for r in text.boilerplate_ngrams(df, n=3, min_docs=2).collect()}
    assert got["subscribe to our"] == 3
    assert got["to our newsletter"] == 3
    assert got["our newsletter today"] == 2
    assert "totally unrelated words" not in got
    # within-doc repeats count once (doc frequency, not term frequency)
    rep = spark.createDataFrame([(1, "x y z x y z"), (2, "x y z")],
                                "doc_id int, text string")
    got2 = {r["ngram"]: r["doc_freq"]
            for r in text.boilerplate_ngrams(rep, n=3, min_docs=2).collect()}
    assert got2["x y z"] == 2


def test_scrub_boilerplate(spark):
    df = spark.createDataFrame(
        [(1, "real content subscribe to our newsletter more content")],
        "doc_id int, text string",
    )
    out = df.select(text.scrub_boilerplate(
        "text", ["subscribe to our newsletter"]).alias("t")).collect()[0]["t"]
    assert out == "real content more content"


def test_curation_funnel_matches_filters(spark):
    df = spark.createDataFrame(
        [(i, ("the and of to a in " * (i + 1)).strip()) for i in range(8)]
        + [(99, "")],
        "doc_id int, text string",
    ).withColumn("n_chars", F.length("text"))
    stages = [
        ("chars", F.col("n_chars") >= 30),
        ("tokens", text.token_count("text") <= 30),
        ("stop", text.stopword_ratio("text") >= 0.5),
    ]
    fun = {r["stage"]: (r["surviving"], r["dropped_here"])
           for r in text.curation_funnel(df, stages).collect()}
    # each funnel row equals the cumulative .where count
    acc = None
    expect = [("chars", stages[0][1]), ("tokens", stages[1][1]),
              ("stop", stages[2][1])]
    assert fun["input"] == (9, 0)
    prev = 9
    for name, cond in expect:
        acc = cond if acc is None else acc & cond
        n = df.where(acc).count()
        assert fun[name] == (n, prev - n), name
        prev = n
    # curate() applies the whole chain
    assert text.curate(df, stages).count() == prev


def test_curation_funnel_null_counts_as_fail(spark):
    df = spark.createDataFrame([(1, ""), (2, "the and of")],
                               "doc_id int, text string")
    fun = {r["stage"]: r["surviving"] for r in text.curation_funnel(
        df, [("stop", text.stopword_ratio("text") >= 0.5)]).collect()}
    assert fun == {"input": 2, "stop": 1}  # empty doc's NULL ratio fails


def test_split_passages_blocks_and_tail(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "")], "doc_id int, text string"
    )
    rows = {(r["doc_id"], r["idx"]): r["passage"]
            for r in dedup.split_passages(df, block_tokens=3).collect()}
    assert rows == {(1, 0): "a b c", (1, 1): "d e f", (1, 2): "g"}
    # empty doc -> no passages (it comes back via the left join downstream)


def test_drop_duplicate_passages_first_occurrence_wins(spark):
    df = spark.createDataFrame(
        [
            (1, "x y z a b c"),       # blocks: "x y z", "a b c"
            (2, "a b c q r s"),       # "a b c" repeats -> dropped here
            (3, "q r s q r s"),       # cross-doc repeat + within-doc repeat
            (4, "a b c"),             # entirely duplicate -> empty
        ],
        "doc_id int, text string",
    )
    got = {r["doc_id"]: (r["kept_passages"], r["text_dedup"])
           for r in dedup.drop_duplicate_passages(df, block_tokens=3).collect()}
    assert got[1] == (2, "x y z a b c")
    assert got[2] == (1, "q r s")      # "a b c" first seen in doc 1
    assert got[3] == (0, "")           # both blocks repeats of doc 2's
    assert got[4] == (0, "")


def test_drop_duplicate_passages_order_preserved(spark):
    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(20)))], "doc_id int, text string"
    )
    r = dedup.drop_duplicate_passages(df, block_tokens=4).collect()[0]
    assert r["kept_passages"] == 5
    assert r["text_dedup"] == " ".join(f"w{i}" for i in range(20))


def test_mixture_rates_math(spark):
    df = spark.createDataFrame(
        [(i, "a" if i < 80 else "b") for i in range(100)], "k int, s string"
    )
    # counts: a=80, b=20; target 50/50 -> T = min(80/.5, 20/.5) = 40
    rates = sampling.mixture_rates(df, "s", {"a": 0.5, "b": 0.5})
    assert abs(rates["a"] - (0.5 * 40 / 80)) < 1e-12  # 0.25
    assert abs(rates["b"] - 1.0) < 1e-12              # binding stratum
    # zero share -> stratum dropped entirely
    r2 = sampling.mixture_rates(df, "s", {"a": 1.0, "b": 0.0})
    assert r2["b"] == 0.0 and abs(r2["a"] - 1.0) < 1e-12


def test_mixture_rates_missing_share_raises(spark):
    import pytest

    df = spark.createDataFrame([(1, "a"), (2, "b")], "k int, s string")
    with pytest.raises(ValueError, match="without a target share"):
        sampling.mixture_rates(df, "s", {"a": 1.0})


def test_mix_to_shares_hits_target_mix(spark):
    rows = [(i, "big" if i % 10 else "small") for i in range(5000)]
    df = spark.createDataFrame(rows, "k int, s string")  # 4500 / 500
    out = sampling.mix_to_shares(df, "s", {"big": 0.5, "small": 0.5}, "k")
    by = {r["s"]: r["n"] for r in
          out.groupBy("s").agg(F.count("*").alias("n")).collect()}
    # T = min(4500/.5, 500/.5) = 1000 -> ~500 each (hash noise)
    assert by["small"] == 500                 # binding stratum kept whole
    assert 400 < by["big"] < 600
    # nested: a larger 'big' share strictly grows its sample
    bigger = sampling.mix_to_shares(df, "s", {"big": 0.7, "small": 0.3}, "k")
    kb = {r["k"] for r in out.where(F.col("s") == "big").collect()}
    kb2 = {r["k"] for r in bigger.where(F.col("s") == "big").collect()}
    assert kb <= kb2


def test_embedding_drift_detects_shift(spark):
    from sparkcheck import similarity

    dim = 4
    rows_old = [(i, [1.0, 0.0, 0.0, 0.0], "a") for i in range(10)]
    rows_new = [(i, [0.0, 1.0, 0.0, 0.0], "a") for i in range(10)] + [
        (99, [1.0] * 4, "b")  # label only in the new snapshot
    ]
    old = spark.createDataFrame(
        rows_old, "vec_id int, embedding array<float>, lab string")
    new = spark.createDataFrame(
        rows_new, "vec_id int, embedding array<float>, lab string")
    got = {r["label"]: r for r in similarity.embedding_drift(
        old, new, label_col="lab", dim=dim).collect()}
    assert got["a"]["centroid_cos"] == 0.0   # orthogonal centroid swing
    assert got["a"]["norm_ratio"] == 1.0
    # new-only label surfaces with NULL drift (a new label IS drift)
    assert got["b"]["n_old"] is None and got["b"]["centroid_cos"] is None


def test_embedding_drift_identity(spark):
    from sparkcheck import similarity

    df = spark.createDataFrame(
        [(i, [float(i % 3), 1.0, 2.0], None) for i in range(9)],
        "vec_id int, embedding array<float>, lab string",
    )
    r = similarity.embedding_drift(df, df, dim=3).collect()[0]
    assert r["label"] == "__all__"
    assert r["centroid_cos"] == 1.0 and r["norm_ratio"] == 1.0


def test_class_balance_expectation(spark):
    from sparkcheck import ExpectationSuite, validate_df

    df = spark.createDataFrame(
        [(i, "en" if i < 8 else "de") for i in range(10)],
        "k int, lang string",
    )
    s = ExpectationSuite("mix")
    s.add("expect_column_class_balance_to_match", column="lang",
          target_shares={"en": 0.8, "de": 0.2}, tolerance=0.05)
    rep = validate_df(df, s, result_format="SUMMARY")
    r = rep["results"][0]
    assert r["success"], r
    assert r["result"]["observed_value"] == {"de": 0.2, "en": 0.8}
    # drift past tolerance fails, with the offending label named
    s2 = ExpectationSuite("mix2")
    s2.add("expect_column_class_balance_to_match", column="lang",
           target_shares={"en": 0.5, "de": 0.5}, tolerance=0.1)
    r2 = validate_df(df, s2, result_format="SUMMARY")["results"][0]
    assert not r2["success"]
    assert "en" in r2["result"]["details"]["out_of_tolerance"]
    # an unexpected label fails unless explicitly allowed
    s3 = ExpectationSuite("mix3")
    s3.add("expect_column_class_balance_to_match", column="lang",
           target_shares={"en": 0.8}, tolerance=0.05)
    r3 = validate_df(df, s3, result_format="SUMMARY")["results"][0]
    assert not r3["success"]
    assert r3["result"]["details"]["unexpected_labels"] == ["de"]
    s4 = ExpectationSuite("mix4")
    s4.add("expect_column_class_balance_to_match", column="lang",
           target_shares={"en": 0.8}, tolerance=0.05,
           allow_unexpected_labels=True)
    assert validate_df(df, s4, result_format="SUMMARY")["results"][0]["success"]


def test_lm_quality_ranks_junk_above_common(spark):
    import math

    # corpus dominated by "the cat sat"; one rare-token doc must score a
    # strictly higher mean NLL (rarer tokens = less likely under the LM)
    rows = [(i, "the cat sat") for i in range(20)] + [(99, "zyx qwv jkl")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r["doc_id"]: r["mean_nll"] for r in text.lm_quality(df).collect()}
    assert got[99] > got[0]
    # hand-check doc 0: tokens each appear 20x (+1 from nowhere else),
    # N=63, V=4 (the/cat/sat + zyx? no: vocab = 6 tokens)
    # -> just verify against a direct python recompute
    counts = {"the": 20, "cat": 20, "sat": 20, "zyx": 1, "qwv": 1, "jkl": 1}
    n, v = float(sum(counts.values())), float(len(counts))
    denom = n + 0.5 * (v + 1.0)
    lp = {t: math.log((c + 0.5) / denom) for t, c in counts.items()}
    want0 = round(-(lp["the"] + lp["cat"] + lp["sat"]) / 3, 4)
    assert got[0] == want0


def test_lm_quality_oov_and_empty(spark):
    train = spark.createDataFrame([(1, "a b c")], "doc_id int, text string")
    model = text.unigram_model(train)
    score = spark.createDataFrame(
        [(10, "a b"), (11, "zz zz"), (12, "")], "doc_id int, text string"
    )
    got = {r["doc_id"]: (r["n_tokens"], r["mean_nll"])
           for r in text.lm_quality(score, model=model).collect()}
    assert got[12] == (0, None)              # empty doc: no tokens, NULL nll
    assert got[11][1] > got[10][1]           # OOV-only doc scores worst
    import math
    denom = 3.0 + 0.5 * (3.0 + 1.0)
    assert got[11][1] == round(-math.log(0.5 / denom), 4)


def test_containment_catches_embedded_doc(spark):
    # short doc fully inside a long one: containment 1.0 but tiny jaccard
    short = "alpha beta gamma delta epsilon"
    long_ = short + " " + " ".join(f"w{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, short), (2, long_), (3, "unrelated text entirely here")],
        "doc_id int, text string",
    )
    rows = {(r["doc_inner"], r["doc_outer"]):
            (r["containment"], r["jaccard"])
            for r in dedup.containment_pairs(df, n=3, threshold=0.9).collect()}
    assert (1, 2) in rows
    c, j = rows[(1, 2)]
    assert c == 1.0 and j < 0.1   # Jaccard would never have flagged this
    assert (2, 1) not in rows     # the long doc is NOT inside the short one
    assert not any(3 in k for k in rows)


def test_containment_mutual_pair_both_directions(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e f")], "doc_id int, text string"
    )
    rows = {(r["doc_inner"], r["doc_outer"]) for r in
            dedup.containment_pairs(df, n=3, threshold=0.9).collect()}
    assert rows == {(1, 2), (2, 1)}


def test_per_group_cap_null_keys_excluded_explicitly(spark):
    df = spark.createDataFrame(
        [(1, "g"), (2, "g"), (None, "g"), (None, "g")], "k int, g string"
    )
    out = sampling.per_group_cap(df, "g", 10, "k").collect()
    # both real keys kept (cap not binding); NULL-key rows excluded by
    # the documented explicit filter, not silently by join mechanics
    assert sorted(r["k"] for r in out) == [1, 2]


def test_hash_split_null_keys_fall_to_last_split(spark):
    df = spark.createDataFrame([(1,), (None,), (None,)], "k int")
    got = {r["k"]: r["split"] for r in sampling.hash_split(
        df, {"train": 0.5, "test": 0.5}, "k").collect()}
    assert got[None] == "test"  # documented: NULL hash -> last split


# ---------------------------------------------------------------------------
# review-finding regressions
# ---------------------------------------------------------------------------


def test_per_group_cap_shared_key_across_groups(spark):
    # the same key value in two groups must not smuggle rows past the cap
    df = spark.createDataFrame(
        [(1, "A"), (1, "B"), (2, "B"), (3, "B")], "k int, g string"
    )
    out = sampling.per_group_cap(df, "g", 1, "k").collect()
    by = {}
    for r in out:
        by.setdefault(r["g"], []).append(r["k"])
    assert len(by["A"]) == 1 and len(by["B"]) == 1


def test_curation_funnel_empty_input_is_zero_not_null(spark):
    df = spark.createDataFrame([], "doc_id int, text string")
    rows = text.curation_funnel(
        df, [("any", F.length("text") > 0)]).collect()
    assert [(r["surviving"], r["dropped_here"]) for r in rows] == [(0, 0), (0, 0)]


def test_mixture_rates_absent_stratum_raises(spark):
    import pytest

    df = spark.createDataFrame([(1, "en")], "k int, s string")
    with pytest.raises(ValueError, match="zero rows"):
        sampling.mixture_rates(df, "s", {"en": 0.5, "zh": 0.5})
    with pytest.raises(ValueError, match="empty mixture"):
        sampling.mixture_rates(df, "s", {"en": 0.0})


def test_class_balance_expectation_int_labels_roundtrip(spark):
    # suite JSON round-trips stringify dict keys; int-labeled columns must
    # still match their targets
    import json

    from sparkcheck import ExpectationSuite, validate_df

    df = spark.createDataFrame([(i, i % 2) for i in range(10)],
                               "k int, lab int")
    s = ExpectationSuite("m")
    s.add("expect_column_class_balance_to_match", column="lab",
          target_shares={0: 0.5, 1: 0.5}, tolerance=0.01)
    s2 = ExpectationSuite.from_json(json.dumps(json.loads(s.to_json())))
    r = validate_df(df, s2, result_format="SUMMARY")["results"][0]
    assert r["success"], r


def test_revalidate_delta_refuses_stat_parameterized(spark):
    from sparkcheck import ExpectationSuite

    old = spark.createDataFrame([(i, float(i)) for i in range(50)],
                                "k int, v double")
    # delta = 5 extreme outliers; delta-local mean/std would normalize
    # them away, so the engine must refuse rather than mislead
    new = old.union(spark.createDataFrame(
        [(100 + i, 1e9 + i) for i in range(5)], "k int, v double"))
    s = ExpectationSuite("z")
    s.add("expect_column_value_z_scores_to_be_less_than", column="v",
          threshold=3, double_sided=True)
    s.add("expect_column_values_to_not_be_null", column="v")
    rep, skipped = diffing_revalidate(old, new, s)
    labels = [r["expectation"] for r in rep.collect()]
    assert labels == ["expect_column_values_to_not_be_null:v"]
    assert any("statistic-parameterized" in v for v in skipped.values())


def diffing_revalidate(old, new, s):
    from sparkcheck import diffing

    return diffing.revalidate_delta(old, new, ["k"], s)


def test_domain_quality_report_ranks_and_counts_dups(spark):
    good = "the cat and the dog sat on a mat in the sun and the rain it is"
    df = spark.createDataFrame(
        [
            (1, "siteA", good),
            (2, "siteA", good),                # exact dup within siteA
            (3, "siteB", "zz zz zz zz"),       # repetitive junk
            (4, "siteB", "mail me bob@x.co"),  # PII doc
        ],
        "doc_id int, source string, text string",
    )
    rep = {r["source"]: r for r in text.domain_quality_report(df).collect()}
    a, b = rep["siteA"], rep["siteB"]
    assert a["n_docs"] == 2 and a["exact_dup_docs"] == 1
    assert b["n_docs"] == 2 and b["exact_dup_docs"] == 0
    assert a["mean_quality"] > b["mean_quality"]   # junk site ranks worse
    assert b["pii_doc_rate"] == 0.5 and a["pii_doc_rate"] == 0.0
    assert b["mean_dup_2gram"] > a["mean_dup_2gram"]
    # worst-first ordering
    order = [r["source"] for r in text.domain_quality_report(df).collect()]
    assert order == ["siteB", "siteA"]


def test_bigram_lm_flags_word_salad(spark):
    # same unigram distribution, different co-occurrence: the shuffled doc
    # must score a strictly higher bigram NLL while its unigram NLL ties
    rows = [(i, "the cat sat on the mat") for i in range(20)] + [
        (99, "mat the on cat the sat")  # same words, novel bigrams
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    big = {r["doc_id"]: r["mean_nll"]
           for r in text.bigram_lm_quality(df).collect()}
    uni = {r["doc_id"]: r["mean_nll"] for r in text.lm_quality(df).collect()}
    assert big[99] > big[0]
    assert uni[99] == uni[0]  # unigram filter is blind to the shuffle


def test_bigram_lm_short_and_heldout(spark):
    train = spark.createDataFrame([(1, "a b c a b")], "doc_id int, text string")
    model = text.bigram_model(train)
    score = spark.createDataFrame(
        [(10, "a b"), (11, "z q"), (12, "a")], "doc_id int, text string"
    )
    got = {r["doc_id"]: (r["n_bigrams"], r["mean_nll"])
           for r in text.bigram_lm_quality(score, model=model).collect()}
    assert got[12] == (0, None)         # <2 tokens: no bigrams
    assert got[10][0] == 1 and got[11][0] == 1
    assert got[11][1] > got[10][1]      # unseen context + pair scores worst
    import math
    # "a b": c12=2, c1(a)=2, V=3 -> ln(2.5 / (2 + 0.5*4))
    assert got[10][1] == round(-math.log(2.5 / 4.0), 4)
    # "z q": c12=0, c1(z)=0 -> ln(0.5 / (0 + 2.0))
    assert got[11][1] == round(-math.log(0.5 / 2.0), 4)


def test_incremental_dedup_against_store(spark):
    seen_docs = spark.createDataFrame(
        [(1, "old content here")], "doc_id int, text string"
    )
    store = seen_docs.select(text.fingerprint("text").alias("fingerprint"))
    new = spark.createDataFrame(
        [
            (10, "old content here"),    # already in the store -> dropped
            (11, "fresh content one"),
            (12, "fresh content one"),   # batch dup of 11 -> dropped
            (13, "fresh content two"),
        ],
        "doc_id int, text string",
    )
    kept, new_fps = dedup.incremental_dedup(new, store)
    ids = sorted(r["doc_id"] for r in kept.collect())
    assert ids == [11, 13]
    # the returned fingerprints close the loop: appending them makes a
    # second identical delivery come back empty
    store2 = store.union(new_fps)
    kept2, _ = dedup.incremental_dedup(new, store2)
    assert kept2.count() == 0


def test_pack_sequences_contiguous_layout(spark):
    df = spark.createDataFrame(
        [(i, (i % 7) + 1) for i in range(200)], "k int, n int"
    ).repartition(16)  # force the prefix sum across many partitions
    out = sampling.pack_sequences(df, 10, "n", "k").collect()
    rows = sorted(out, key=lambda r: r["start_offset"])
    pos = 0
    for r in rows:
        # contiguous, gap-free global stream — the partition-offset fold
        # is exact across an arbitrary partitioning
        assert r["start_offset"] == pos, (r, pos)
        assert r["bin_id"] == pos // 10
        assert r["offset_in_bin"] == pos % 10
        pos += r["n_tokens"]
    assert pos == sum(r["n_tokens"] for r in rows)
    # deterministic independent of input partitioning
    again = sampling.pack_sequences(df.repartition(3), 10, "n", "k").collect()
    assert {(r["k"], r["start_offset"]) for r in again} == {
        (r["k"], r["start_offset"]) for r in out}


def test_pack_sequences_zero_token_docs(spark):
    df = spark.createDataFrame([(1, 0), (2, 5), (3, 0)], "k int, n int")
    out = {r["k"]: r for r in
           sampling.pack_sequences(df, 4, "n", "k").collect()}
    # zero-token docs occupy a position but consume no stream
    starts = sorted(r["start_offset"] for r in out.values())
    assert starts[0] == 0 and starts[-1] <= 5
    assert sum(r["n_tokens"] for r in out.values()) == 5


def test_pack_sequences_empty_and_null_inputs(spark):
    # an empty delivery (a normal day-N batch) returns an empty layout,
    # not an AnalysisException from an untyped empty offsets map
    empty = spark.createDataFrame([], "k int, n int")
    assert sampling.pack_sequences(empty, 4, "n", "k").collect() == []
    # NULL token counts occupy zero stream positions instead of poisoning
    # the partition running sum (or the driver fold) with None
    df = spark.createDataFrame(
        [(1, None), (2, 3), (3, None), (4, 2)], "k int, n int"
    )
    out = sorted(
        sampling.pack_sequences(df, 4, "n", "k").collect(),
        key=lambda r: r["start_offset"],
    )
    pos = 0
    for r in out:
        assert r["start_offset"] == pos
        pos += r["n_tokens"]
    assert pos == 5


def test_pack_sequences_duplicate_keys_disjoint(spark):
    # duplicate key values tie on the (hash, key) order; the explicit ROWS
    # frame must still hand each row a disjoint token range
    df = spark.createDataFrame(
        [(1, 5), (1, 3), (1, 4), (2, 2), (2, 6)], "k int, n int"
    )
    out = sorted(
        sampling.pack_sequences(df, 4, "n", "k").collect(),
        key=lambda r: r["start_offset"],
    )
    pos = 0
    for r in out:
        assert r["start_offset"] == pos, out
        pos += r["n_tokens"]
    assert pos == 20


def test_incremental_dedup_kept_batch_feeds_back(spark):
    # the kept output carries a 'fingerprint' column; feeding such a batch
    # back in must not produce a duplicate column name
    store = spark.createDataFrame([], "fingerprint string")
    new = spark.createDataFrame(
        [(1, "some text"), (2, "other text")], "doc_id int, text string"
    )
    kept, fps = dedup.incremental_dedup(new, store)
    assert kept.columns.count("fingerprint") == 1
    kept2, _ = dedup.incremental_dedup(kept, store.union(fps))
    assert kept2.columns.count("fingerprint") == 1
    assert kept2.count() == 0  # all already in the store


def test_semantic_dedup_within_cluster(spark):
    from sparkcheck import similarity
    # 4-dim toy space: ids 0,1 seed two centroids along orthogonal axes;
    # 10 is a near-copy of 0's direction, 11 is orthogonal to everything
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (10, [0.99, 0.05, 0.0, 0.0]),   # near-dup of 0 -> dropped
        (11, [0.0, 0.0, 1.0, 0.0]),     # lone direction -> kept
        (12, [0.0, 0.98, 0.1, 0.0]),    # near-dup of 1 -> dropped
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    got = {r["vec_id"]: r for r in similarity.semantic_dedup(
        df, threshold=0.9, n_centroids=2).collect()}
    assert len(got) == 5  # full corpus comes back flagged
    assert got[0]["kept"] and got[1]["kept"] and got[11]["kept"]
    assert not got[10]["kept"] and not got[12]["kept"]
    # canonical keeper is the LOWEST id of the near-dup set
    assert got[10]["centroid_id"] == got[0]["centroid_id"]


def test_semantic_dedup_max_cluster_guard(spark):
    import warnings

    from sparkcheck import similarity
    # every vector bit-identical -> one unsplittable cluster of 6 (every
    # re-cluster seed ties); after the split-depth cap the members are
    # kept whole WITH a warning (the honest residue of the guard)
    rows = [(i, [1.0, 0.0]) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = similarity.semantic_dedup(df, threshold=0.9, n_centroids=1,
                                        max_cluster=5).collect()
    assert all(r["kept"] for r in out)
    assert any("unsplittable" in str(x.message) for x in w)
    # without the guard the near-dups collapse to the single lowest id
    out2 = similarity.semantic_dedup(df, threshold=0.9, n_centroids=1,
                                     max_cluster=None).collect()
    assert sorted(r["vec_id"] for r in out2 if r["kept"]) == [0]


def test_importance_resample_directionality(spark):
    # target model trained on "clean prose"; docs resembling it must get
    # weight > 1 relative to the mixed corpus model, junk weight < 1
    target = spark.createDataFrame(
        [(i, "the cat sat on the mat") for i in range(20)],
        "doc_id int, text string",
    )
    corpus = spark.createDataFrame(
        [(1, "the cat sat on the mat"),
         (2, "zzz qqq xxx vvv kkk jjj"),
         (3, "the cat sat on the mat"),
         (4, "")],
        "doc_id int, text string",
    )
    tmodel = text.unigram_model(target)
    got = {r["doc_id"]: r for r in
           sampling.importance_resample(corpus, tmodel).collect()}
    assert got[1]["weight"] > 1.0 > got[2]["weight"]
    assert got[1]["weight"] == got[3]["weight"]
    # empty doc: NULL NLLs, never sampled, weight NULL
    assert got[4]["weight"] is None and got[4]["sampled"] is False
    # determinism: same inputs, same decisions
    again = {r["doc_id"]: r["sampled"] for r in
             sampling.importance_resample(corpus, tmodel).collect()}
    assert again == {k: v["sampled"] for k, v in got.items()}


def test_cluster_safe_split_no_leakage(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(300)], "doc_id int, text string"
    )
    # chain 0-1-2 ... every triple (3k, 3k+1, 3k+2) is one near-dup cluster
    pairs = spark.createDataFrame(
        [(3 * k, 3 * k + 1) for k in range(100)]
        + [(3 * k + 1, 3 * k + 2) for k in range(100)],
        "doc_a int, doc_b int",
    )
    clusters = dedup.duplicate_clusters(pairs)
    out = sampling.cluster_safe_split(
        docs, clusters, {"train": 0.8, "val": 0.1, "test": 0.1}, "doc_id"
    ).collect()
    split = {r["doc_id"]: r["split"] for r in out}
    assert len(split) == 300
    for k in range(100):
        assert split[3 * k] == split[3 * k + 1] == split[3 * k + 2], k
    # singleton docs (none here) would match plain hash_split; check the
    # representative rule: the cluster splits by its min id's hash
    ref = {r["doc_id"]: r["split"] for r in sampling.hash_split(
        docs, {"train": 0.8, "val": 0.1, "test": 0.1}, "doc_id").collect()}
    for k in range(100):
        assert split[3 * k] == ref[3 * k]  # rep IS the min id


def test_semantic_dedup_oversize_cluster_recluster(spark):
    # round-5: a dense mode larger than max_cluster used to be silently
    # kept whole -- exactly where the duplicates live. It must now be
    # re-clustered at higher k and its near-dups caught.
    import random

    from sparkcheck import similarity

    rng = random.Random(7)

    def jitter(base, eps):
        return [b + rng.uniform(-eps, eps) for b in base]

    rows = []
    # dense mode: 120 tiny perturbations of one direction (cos ~ 1.0)
    for i in range(120):
        rows.append((i, jitter([1.0, 0.0, 0.0, 0.0], 0.01)))
    # plus a scattering of genuinely distinct directions
    rows.append((200, [0.0, 1.0, 0.0, 0.0]))
    rows.append((201, [0.0, 0.0, 1.0, 0.0]))
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")

    # n_centroids=1 puts the whole mode in one cluster of 122 > max_cluster
    out = {r["vec_id"]: r for r in similarity.semantic_dedup(
        df, threshold=0.99, n_centroids=1, max_cluster=50).collect()}
    assert len(out) == 122
    dropped = [v for v, r in out.items() if not r["kept"]]
    # the mode's duplicates are caught (kept-whole would give dropped == [])
    assert len(dropped) >= 100
    # distinct directions survive
    assert out[200]["kept"] and out[201]["kept"]
    # every sub-cluster kept at least one canonical representative
    assert len([v for v in out if out[v]["kept"]]) >= 3


# ---------------------------------------------------------------------------
# exact duplicated-substring spans (Lee et al. ExactSubstr)
# ---------------------------------------------------------------------------


def _ref_dup_spans(rows, L):
    """Brute-force reference: every position whose L-gram occurs >1 time
    corpus-wide, merged into maximal (overlap-or-adjacent) spans."""
    from collections import Counter

    c = Counter()
    for _, t in rows:
        for p in range(len(t) - L + 1):
            c[t[p : p + L]] += 1
    out = {}
    for did, t in rows:
        spans = []
        for p in range(len(t) - L + 1):
            if c[t[p : p + L]] > 1:
                if spans and p <= spans[-1][1]:
                    spans[-1] = (spans[-1][0], p + L)
                else:
                    spans.append((p, p + L))
        if spans:
            out[did] = spans
    return out


def _rand_corpus(seed, n=40):
    """Deterministic corpus with planted repeats: shared sentences pasted
    into random-ish filler at varying offsets."""
    import hashlib

    def h(s):
        return hashlib.md5(s.encode()).hexdigest()

    shared = ["the quick brown fox jumps over the lazy dog tail",
              "lorem ipsum dolor sit amet consectetur adipiscing"]
    rows = []
    for i in range(n):
        filler = h(f"{seed}:{i}:a") + h(f"{seed}:{i}:b")
        k = int(h(f"{seed}:{i}:c")[0], 16) % 4
        t = filler[: 10 + i % 7]
        if k in (1, 3):
            t += shared[0]
        t += filler[20:40]
        if k in (2, 3):
            t += shared[1]
        t += filler[40 : 40 + i % 13]
        rows.append((f"d{i:03d}", t))
    return rows


def test_duplicate_spans_matches_bruteforce(spark):
    rows = _rand_corpus(7)
    df = spark.createDataFrame(rows, "doc_id string, text string")
    for L in (12, 30):
        exp = _ref_dup_spans(rows, L)
        got = {}
        for r in dedup.duplicate_spans(df, min_len=L).collect():
            got.setdefault(r["doc_id"], []).append(
                (r["span_start"], r["span_end"])
            )
        for v in got.values():
            v.sort()
        assert got == exp, f"L={L}"


def test_duplicate_spans_exact_text_keys_agree(spark):
    rows = _rand_corpus(11, n=25)
    df = spark.createDataFrame(rows, "doc_id string, text string")
    a = sorted(map(tuple, dedup.duplicate_spans(df, 15).collect()))
    b = sorted(map(tuple, dedup.duplicate_spans(df, 15, exact=True).collect()))
    assert a == b


def test_scrub_duplicate_spans_rebuild(spark):
    rows = [
        ("full", "AAAA unique middle text here BBBB shared tail sentence x"),
        ("copy", "AAAA unique middle text here BBBB shared tail sentence x"),
        ("mid", "zz BBBB shared tail sentence x yy"),
        ("tiny", "short"),
        ("clean", "nothing here repeats anywhere at all, honest"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    L = 10
    exp = _ref_dup_spans(rows, L)
    out = {
        r["doc_id"]: r.asDict()
        for r in dedup.scrub_duplicate_spans(df, min_len=L).collect()
    }
    assert set(out) == {d for d, _ in rows}
    for did, t in rows:
        spans = exp.get(did, [])
        cut, cur = [], 0
        for s, e in spans:
            cut.append(t[cur:s])
            cur = e
        cut.append(t[cur:])
        assert out[did]["text_clean"] == "".join(cut), did
        assert out[did]["n_dup_spans"] == len(spans)
        assert out[did]["dup_chars"] == sum(e - s for s, e in spans)
    # exact duplicates scrub to empty; untouched docs come back whole
    assert out["full"]["text_clean"] == "" and out["copy"]["text_clean"] == ""
    assert out["clean"]["text_clean"] == rows[4][1]
    assert out["tiny"]["text_clean"] == "short" and out["tiny"]["n_dup_spans"] == 0


def test_scrub_duplicate_spans_same_id_rows_independent(spark):
    """Rows are identified by content (xxhash64(id, text)), so two rows
    sharing an id but differing in text each get their own correct
    rebuild — the grouping/join-back never conflates them."""
    shared = "shared core sentence repeated verbatim here"
    rows = [
        ("a", "completely unique prefix one 123 " + shared),
        ("c", "same id different text case x"),
        ("c", "same id different text case y9999 " + shared),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    by_id = {}
    for r in dedup.scrub_duplicate_spans(df, min_len=20).collect():
        by_id.setdefault(r["doc_id"], []).append(r.asDict())
    assert len(by_id["c"]) == 2
    cs = sorted(by_id["c"], key=lambda d: d["dup_chars"])
    # the 28-char "same id different text case " prefix is duplicated
    # ACROSS the two c rows -> scrubbed from both; the rest is per-row
    assert cs[0]["dup_chars"] == 28 and cs[0]["text_clean"] == "x"
    assert shared not in cs[1]["text_clean"] and "y9999" in cs[1]["text_clean"]
    # identical (id, text) rows collapse to ONE span set but BOTH rows
    # come back from scrub
    twin = df.union(spark.createDataFrame([rows[0]], df.schema))
    spans = dedup.duplicate_spans(twin, min_len=20)
    assert spans.where("doc_id = 'a'").count() == 1
    assert dedup.scrub_duplicate_spans(twin, 20).where("doc_id='a'").count() == 2


def test_duplicate_spans_min_len_guard(spark):
    df = spark.createDataFrame([("a", "xx")], "doc_id string, text string")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        dedup.duplicate_spans(df, min_len=1)


def test_duplicate_span_stats_multiplicity_exact(spark):
    shared = "shared core sentence repeated verbatim here!"  # 45 chars
    rows = [
        ("a", "completely unique prefix one 123 " + shared),
        ("b", "another unique prefix two 456 " + shared),
        ("c", "totally novel text with no repeats at all xyz"),
        ("d", None),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    # an identical physical copy of row a: its dup_chars must count TWICE
    twin = df.union(spark.createDataFrame([rows[0]], df.schema))
    one = dedup.duplicate_span_stats(df, min_len=20).collect()[0]
    two = dedup.duplicate_span_stats(twin, min_len=20).collect()[0]
    assert one["total_docs"] == 4 and two["total_docs"] == 5
    assert one["docs_with_dups"] == 2
    # the whole of row a duplicates once twinned -> strictly more dup mass
    assert two["docs_with_dups"] == 3
    assert two["dup_chars"] > one["dup_chars"]
    # reconcile against the per-row scrub: stats == sum over scrub rows
    for frame, st in ((df, one), (twin, two)):
        sc = dedup.scrub_duplicate_spans(frame, min_len=20).collect()
        assert st["dup_chars"] == sum(r["dup_chars"] for r in sc)
        assert st["dup_spans"] == sum(r["n_dup_spans"] for r in sc)
    assert one["total_chars"] == sum(len(t) for _, t in rows if t)
    assert abs(one["dup_fraction"] - one["dup_chars"] / one["total_chars"]) < 1e-6


def test_expect_duplicate_span_fraction(spark):
    from sparkcheck import ExpectationSuite, validate_df

    shared = "shared core sentence repeated verbatim here!"
    rows = [
        ("a", "completely unique prefix one 123 " + shared),
        ("b", "another unique prefix two 456 " + shared),
        ("c", "totally novel text with no repeats at all xyz"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    s = ExpectationSuite("spans")
    s.add(
        "expect_column_duplicate_span_fraction_to_be_less_than",
        column="text",
        threshold=0.9,
        min_len=20,
    )
    s.add(
        "expect_column_duplicate_span_fraction_to_be_less_than",
        column="text",
        threshold=0.05,
        min_len=20,
    )
    rep = validate_df(df, s, result_format="SUMMARY")
    r_loose, r_tight = rep["results"]
    assert r_loose["success"] and not r_tight["success"]
    obs = r_loose["result"]["observed_value"]
    assert obs == r_tight["result"]["observed_value"]
    det = r_loose["result"]["details"]
    assert det["docs_with_dups"] == 2 and det["total_docs"] == 3
    assert 0.0 < obs < 0.9 and det["dup_chars"] > 0

    # all-NULL text: rows are in domain, nothing duplicated -> 0.0,
    # NOT a vacuous None (a feed that lost its text column must be
    # distinguishable from an empty table)
    nulls = spark.createDataFrame(
        [("a", None), ("b", None)], "doc_id string, text string"
    )
    s_nulls = ExpectationSuite("nulls")
    s_nulls.add(
        "expect_column_duplicate_span_fraction_to_be_less_than",
        column="text",
        threshold=0.1,
    )
    rep_n = validate_df(nulls, s_nulls, result_format="SUMMARY")
    rn = rep_n["results"][0]
    assert rn["success"] and rn["result"]["observed_value"] == 0.0
    assert rn["result"]["details"]["total_docs"] == 2

    # missing threshold fails BEFORE the corpus scan (config error)
    s_nothr = ExpectationSuite("nothr")
    s_nothr.add(
        "expect_column_duplicate_span_fraction_to_be_less_than",
        column="text",
    )
    rep_t = validate_df(nulls, s_nothr, result_format="SUMMARY")
    assert not rep_t["results"][0]["success"]
    assert "threshold" in str(rep_t["results"][0].get("exception_info", ""))

    # empty domain -> vacuous success with observed None
    empty = spark.createDataFrame([], "doc_id string, text string")
    s2 = ExpectationSuite("empty")
    s2.add(
        "expect_column_duplicate_span_fraction_to_be_less_than",
        column="text",
        threshold=0.1,
    )
    rep2 = validate_df(empty, s2, result_format="SUMMARY")
    assert rep2["results"][0]["success"]
    assert rep2["results"][0]["result"]["observed_value"] is None

    # missing id column -> loud error (not a silent wrong answer)
    s3 = ExpectationSuite("noid")
    s3.add(
        "expect_column_duplicate_span_fraction_to_be_less_than",
        column="text",
        threshold=0.1,
        id_column="nope",
    )
    rep3 = validate_df(df, s3, result_format="SUMMARY")
    assert not rep3["results"][0]["success"]
    assert "nope" in str(rep3["results"][0].get("exception_info", ""))


# ---------------------------------------------------------------------------
# span-level benchmark decontamination
# ---------------------------------------------------------------------------


def _ref_contaminated_spans(corpus_rows, bench_rows, L):
    """Brute-force reference: every corpus position whose L-gram occurs
    anywhere in the benchmark, merged into maximal spans."""
    bench = set()
    for _, t in bench_rows:
        for p in range(len(t) - L + 1):
            bench.add(t[p : p + L])
    out = {}
    for did, t in corpus_rows:
        spans = []
        for p in range(len(t) - L + 1):
            if t[p : p + L] in bench:
                if spans and p <= spans[-1][1]:
                    spans[-1] = (spans[-1][0], p + L)
                else:
                    spans.append((p, p + L))
        if spans:
            out[did] = spans
    return out


def test_contaminated_spans_matches_bruteforce(spark):
    corpus_rows = _rand_corpus(3, n=30)
    # benchmark shares the planted sentences plus one corpus doc verbatim
    bench_rows = [
        ("q1", "the quick brown fox jumps over the lazy dog tail"),
        ("q2", corpus_rows[5][1]),
        ("q3", "never appears in the corpus anywhere at all ok"),
    ]
    cdf = spark.createDataFrame(corpus_rows, "doc_id string, text string")
    bdf = spark.createDataFrame(bench_rows, "doc_id string, text string")
    for L in (12, 25):
        exp = _ref_contaminated_spans(corpus_rows, bench_rows, L)
        got = {}
        for r in dedup.contaminated_spans(cdf, bdf, min_len=L).collect():
            got.setdefault(r["doc_id"], []).append(
                (r["span_start"], r["span_end"])
            )
        for v in got.values():
            v.sort()
        assert got == exp, f"L={L}"
    # the verbatim-shared doc is fully covered at L=12
    full = dict(got).get("d005")
    assert full == [(0, len(corpus_rows[5][1]))]


def test_scrub_contaminated_spans_rebuild(spark):
    corpus_rows = [
        ("a", "intro text then THE SECRET EVAL ANSWER IS FORTY TWO and more"),
        ("b", "completely clean document with nothing leaked at all"),
        ("c", "THE SECRET EVAL ANSWER IS FORTY TWO"),
    ]
    bench_rows = [("q", "THE SECRET EVAL ANSWER IS FORTY TWO")]
    cdf = spark.createDataFrame(corpus_rows, "doc_id string, text string")
    bdf = spark.createDataFrame(bench_rows, "doc_id string, text string")
    L = 15
    exp = _ref_contaminated_spans(corpus_rows, bench_rows, L)
    out = {
        r["doc_id"]: r.asDict()
        for r in dedup.scrub_contaminated_spans(cdf, bdf, min_len=L).collect()
    }
    assert set(out) == {"a", "b", "c"}
    for did, t in corpus_rows:
        spans = exp.get(did, [])
        cut, cur = [], 0
        for st, e in spans:
            cut.append(t[cur:st])
            cur = e
        cut.append(t[cur:])
        assert out[did]["text_clean"] == "".join(cut), did
        assert out[did]["n_contaminated_spans"] == len(spans)
        assert out[did]["contaminated_chars"] == sum(e - s for s, e in spans)
    assert "SECRET" not in out["a"]["text_clean"]
    assert "intro text" in out["a"]["text_clean"]
    assert out["b"]["text_clean"] == corpus_rows[1][1]
    assert out["c"]["text_clean"] == ""
    # corpus-internal duplication alone is NOT contamination: two corpus
    # docs sharing text that is absent from the benchmark stay whole
    cdf2 = spark.createDataFrame(
        [("x", "corpus shared sentence present twice ok"),
         ("y", "corpus shared sentence present twice ok")],
        "doc_id string, text string",
    )
    out2 = dedup.scrub_contaminated_spans(cdf2, bdf, min_len=L).collect()
    assert all(r["n_contaminated_spans"] == 0 for r in out2)


def test_contaminated_spans_exact_and_hash_agree(spark):
    corpus_rows = _rand_corpus(9, n=20)
    bench_rows = [("q", "lorem ipsum dolor sit amet consectetur adipiscing")]
    cdf = spark.createDataFrame(corpus_rows, "doc_id string, text string")
    bdf = spark.createDataFrame(bench_rows, "doc_id string, text string")
    a = sorted(map(tuple, dedup.contaminated_spans(cdf, bdf, 14).collect()))
    b = sorted(
        map(tuple, dedup.contaminated_spans(cdf, bdf, 14, exact=True).collect())
    )
    assert a == b and len(a) > 0


# ---------------------------------------------------------------------------
# cohens_kappa / concentration_profile / weighted_sample (round 5 tail)
# ---------------------------------------------------------------------------


def test_cohens_kappa_perfect_and_independent(spark):
    from sparkcheck.infotheory import cohens_kappa

    same = spark.createDataFrame(
        [("a", "a")] * 6 + [("b", "b")] * 4, "x string, y string"
    )
    r = cohens_kappa(same, "x", "y").collect()[0]
    assert r["kappa"] == 1.0 and r["p_observed"] == 1.0
    assert r["n"] == 10 and r["n_categories"] == 2
    # independent: p_o == p_e by construction -> kappa 0
    rows = [(a, b) for a in ("a", "b") for b in ("a", "b") for _ in range(5)]
    ind = spark.createDataFrame(rows, "x string, y string")
    r = cohens_kappa(ind, "x", "y").collect()[0]
    assert r["kappa"] == 0.0 and r["p_observed"] == 0.5 == r["p_expected"]


def test_cohens_kappa_hand_value_and_nulls(spark):
    from sparkcheck.infotheory import cohens_kappa

    # classic 2x2: diag 20+15, off-diag 5+10, n=50
    rows = (
        [("yes", "yes")] * 20 + [("no", "no")] * 15
        + [("yes", "no")] * 5 + [("no", "yes")] * 10
        + [(None, "yes")] * 3 + [("yes", None)] * 2  # excluded
    )
    df = spark.createDataFrame(rows, "x string, y string")
    r = cohens_kappa(df, "x", "y").collect()[0]
    po = 35 / 50
    pe = (25 * 30 + 25 * 20) / 50**2
    assert r["n"] == 50
    assert abs(r["kappa"] - (po - pe) / (1 - pe)) < 1e-9


def test_cohens_kappa_degenerate_and_column_input(spark):
    import pytest as _pytest

    import pyspark.sql.functions as F
    from sparkcheck.infotheory import cohens_kappa

    const = spark.createDataFrame([("a", "a")] * 3, "x string, y string")
    r = cohens_kappa(const, "x", "y").collect()[0]
    assert r["kappa"] is None and r["p_expected"] == 1.0  # 0/0 undefined
    # Column-valued side works with a name, raises without
    df = spark.createDataFrame([("a", 1), ("b", 2)], "x string, v int")
    derived = F.when(F.col("v") > 1, "b").otherwise("a")
    r = cohens_kappa(df, "x", derived, name_b="bucket(v)").collect()[0]
    assert r["kappa"] == 1.0 and r["column_b"] == "bucket(v)"
    with _pytest.raises(ValueError, match="name_b"):
        cohens_kappa(df, "x", derived)


def test_concentration_even_and_skewed(spark):
    from sparkcheck.text import concentration_profile

    even = spark.createDataFrame(
        [(s,) for s in ("a", "b", "c", "d") for _ in range(5)], "src string"
    )
    r = concentration_profile(even, "src").collect()[0]
    assert r["gini"] == 0.0 and r["hhi"] == 0.25 and r["top1_share"] == 0.25
    assert r["n"] == 20 and r["n_groups"] == 4
    # one group holds 97 of 100 rows across 4 groups
    skew = spark.createDataFrame(
        [("big",)] * 97 + [("s1",), ("s2",), ("s3",)], "src string"
    )
    r = concentration_profile(skew, "src").collect()[0]
    # exact rank identity: x = [1,1,1,97], G = (2*(1+2+3+4*97)-5*100)/(4*100)
    assert abs(r["gini"] - (2 * (1 + 2 + 3 + 4 * 97) - 5 * 100) / 400) < 1e-9
    assert r["top1_share"] == 0.97
    assert abs(r["hhi"] - (97**2 + 3) / 100**2) < 1e-9


def test_concentration_null_is_a_group(spark):
    from sparkcheck.text import concentration_profile

    df = spark.createDataFrame([("a",), ("a",), (None,)], "src string")
    r = concentration_profile(df, "src").collect()[0]
    assert r["n"] == 3 and r["n_groups"] == 2


def test_weighted_sample_deterministic_and_filters(spark):
    import pyspark.sql.functions as F
    from sparkcheck.sampling import weighted_sample

    df = spark.createDataFrame(
        [(i, float(i % 7) if i % 11 else None) for i in range(1, 200)],
        "doc_id bigint, w double",
    )
    # NULL and zero weights never selected; k > eligible returns all
    all_rows = weighted_sample(df, "w", 10_000, id_col="doc_id").collect()
    eligible = df.where(F.col("w").isNotNull() & (F.col("w") > 0)).count()
    assert len(all_rows) == eligible
    assert all(r["w"] and r["w"] > 0 for r in all_rows)
    a = [r["doc_id"] for r in weighted_sample(df, "w", 25, id_col="doc_id").collect()]
    b = [r["doc_id"] for r in weighted_sample(df, "w", 25, id_col="doc_id").collect()]
    assert a == b and len(a) == 25
    # a different salt draws a different sample (same size)
    c = [
        r["doc_id"]
        for r in weighted_sample(df, "w", 25, id_col="doc_id", salt="other").collect()
    ]
    assert len(c) == 25 and set(c) != set(a)


def test_weighted_sample_weight_bias(spark):
    from sparkcheck.sampling import weighted_sample

    # one row with overwhelming weight is (essentially) always selected:
    # P(miss) = (1 - w_big/W)^... astronomically small under A-ES
    rows = [(i, 1.0) for i in range(1, 401)] + [(999, 1e12)]
    df = spark.createDataFrame(rows, "doc_id bigint, w double")
    picked = {
        r["doc_id"] for r in weighted_sample(df, "w", 5, id_col="doc_id").collect()
    }
    assert 999 in picked
    with __import__("pytest").raises(ValueError, match="positive"):
        weighted_sample(df, "w", 0, id_col="doc_id")


def test_concentration_expectation_bounds_and_vacuous(spark):
    from sparkcheck import ExpectationSuite, validate_df

    df = spark.createDataFrame(
        [("big",)] * 97 + [("s1",), ("s2",), ("s3",)] + [(None,)] * 5,
        "src string",
    )
    s = ExpectationSuite("conc")
    s.add("expect_column_concentration_to_be_below", column="src",
          max_top_share=0.99)                      # 0.97 < 0.99 -> pass
    s.add("expect_column_concentration_to_be_below", column="src",
          max_top_share=0.9)                       # 0.97 >= 0.9 -> fail
    s.add("expect_column_concentration_to_be_below", column="src",
          max_gini=0.8, max_hhi=0.95)              # gini 0.7275, hhi 0.9412
    r = validate_df(df, s, result_format="SUMMARY")
    assert [e["success"] for e in r["results"]] == [True, False, True], r
    obs = r["results"][0]["result"]["observed_value"]
    # NULL labels are excluded (value_counts domain): n = 100
    assert obs["top_share"] == 0.97
    assert obs["gini"] == round((2 * (1 + 2 + 3 + 4 * 97) - 5 * 100) / 400, 6)
    assert r["results"][0]["result"]["details"]["n_rows"] == 100

    # no bounds -> error; empty domain -> vacuous pass
    s_bad = ExpectationSuite("bad")
    s_bad.add("expect_column_concentration_to_be_below", column="src")
    rb = validate_df(df, s_bad, result_format="SUMMARY")
    assert rb["results"][0]["success"] is False
    assert rb["results"][0]["exception_info"]["raised_exception"]
    empty = spark.createDataFrame([(None,), (None,)], "src string")
    s3 = ExpectationSuite("conc3")
    s3.add("expect_column_concentration_to_be_below", column="src",
           max_gini=0.1)
    r3 = validate_df(empty, s3, result_format="SUMMARY")
    assert r3["results"][0]["success"] is True
    assert r3["results"][0]["result"]["observed_value"]["gini"] is None


def test_zipf_profile_recovers_power_law(spark):
    import math

    from sparkcheck.text import zipf_profile

    # exact Zipf corpus: token t<i> appears floor(600/i) times
    words = []
    for i in range(1, 151):
        words += [f"t{i}"] * (600 // i)
    docs = spark.createDataFrame(
        [(1, " ".join(words))], "doc_id long, text string"
    )
    r = zipf_profile(docs).collect()[0]
    assert r["vocab_size"] == 150 and r["n_tokens"] == len(words)
    assert r["top_n"] == 150
    assert -1.1 < r["alpha"] < -0.9  # slope ~ -1 by construction
    assert r["r2"] > 0.99

    # flat distribution: slope exactly 0, r2 undefined (no y variance)
    flat = spark.createDataFrame(
        [(1, "a a b b c c d d")], "doc_id long, text string"
    )
    rf = zipf_profile(flat).collect()[0]
    assert rf["alpha"] == 0.0 and rf["r2"] is None

    # <3 distinct tokens: no regression
    tiny = spark.createDataFrame([(1, "x x y")], "doc_id long, text string")
    rt = zipf_profile(tiny).collect()[0]
    assert rt["alpha"] is None and rt["r2"] is None

    # top_n caps the fitted head
    rcap = zipf_profile(docs, top_n=50).collect()[0]
    assert rcap["top_n"] == 50 and rcap["vocab_size"] == 150
