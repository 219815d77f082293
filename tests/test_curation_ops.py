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
