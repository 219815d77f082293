"""diffing.dataset_diff / diff_summary / diff_rows and
segments.segment_validation / violating_segments."""

from pyspark.sql import functions as F

from sparkcheck import diffing, segments


def _versions(spark):
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, None, 40.0)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [(2, "b", 20.0),        # unchanged
         (3, "c", 31.0),        # changed (v)
         (4, None, 40.0),       # unchanged (null-safe: None == None)
         (5, "e", 50.0)],       # added
        "k long, s string, v double",
    )
    return old, new


def test_dataset_diff_statuses(spark):
    old, new = _versions(spark)
    got = {r["k"]: r["status"]
           for r in diffing.dataset_diff(old, new, ["k"]).collect()}
    assert got == {1: "removed", 3: "changed", 5: "added"}
    full = {r["k"]: r["status"]
            for r in diffing.dataset_diff(
                old, new, ["k"], include_unchanged=True).collect()}
    assert full[2] == "unchanged" and full[4] == "unchanged"


def test_dataset_diff_null_to_value_is_changed(spark):
    old = spark.createDataFrame([(1, None)], "k long, s string")
    new = spark.createDataFrame([(1, "x")], "k long, s string")
    got = diffing.dataset_diff(old, new, ["k"]).collect()
    assert [(r["k"], r["status"]) for r in got] == [(1, "changed")]


def test_diff_summary_counts(spark):
    old, new = _versions(spark)
    row = diffing.diff_summary(old, new, ["k"]).collect()[0]
    assert (row["n_added"], row["n_removed"], row["n_changed"],
            row["n_unchanged"]) == (1, 1, 1, 2)


def test_diff_rows_returns_new_side_width(spark):
    old, new = _versions(spark)
    rows = diffing.diff_rows(old, new, ["k"]).collect()
    got = {r["k"]: (r["s"], r["v"], r["status"]) for r in rows}
    assert got == {3: ("c", 31.0, "changed"), 5: ("e", 50.0, "added")}


def test_dataset_diff_compare_subset(spark):
    old, new = _versions(spark)
    # only compare s: row 3's v-change becomes invisible
    got = {r["k"]: r["status"]
           for r in diffing.dataset_diff(old, new, ["k"],
                                         compare_cols=["s"]).collect()}
    assert 3 not in got
    assert got == {1: "removed", 5: "added"}


def test_dataset_diff_narrow_shuffle_plan(spark):
    old, new = _versions(spark)
    plan = diffing.dataset_diff(old, new, ["k"])._jdf.queryExecution() \
        .optimizedPlan().toString()
    # the wide payload columns must be pruned before the join: hashes join,
    # not rows
    assert "xxhash64" in plan
    assert plan.count("'s") == 0  # no raw payload column past the project


def test_segment_validation_flags(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 100.0), ("b", 200.0)],
        "seg string, v double",
    )
    out = segments.segment_validation(
        df, ["seg"],
        [("n", F.count(F.lit(1)), 2.0, None),
         ("avg_v", F.avg("v"), 0.0, 10.0)],
    )
    got = {r["seg"]: (r["n"], r["avg_v"], r["n_ok"], r["avg_v_ok"],
                      r["segment_success"]) for r in out.collect()}
    assert got["a"] == (2, 1.5, True, True, True)
    assert got["b"] == (2, 150.0, True, False, False)


def test_violating_segments_only_failures(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("b", 100.0)], "seg string, v double")
    bad = segments.violating_segments(
        df, ["seg"], [("avg_v", F.avg("v"), 0.0, 10.0)]).collect()
    assert [r["seg"] for r in bad] == ["b"]


def test_segment_validation_null_metric_fails(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("b", None)], "seg string, v double")
    out = {r["seg"]: r["segment_success"]
           for r in segments.segment_validation(
               df, ["seg"], [("avg_v", F.avg("v"), 0.0, 10.0)]).collect()}
    assert out == {"a": True, "b": False}  # NULL aggregate -> check fails


def test_segment_validation_single_shuffle(spark):
    df = spark.createDataFrame([("a", 1.0)], "seg string, v double")
    plan = segments.segment_validation(
        df, ["seg"],
        [("n", F.count(F.lit(1)), 1.0, None),
         ("avg_v", F.avg("v"), 0.0, 10.0),
         ("max_v", F.max("v"), None, 100.0)],
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1  # all checks share one groupBy


def test_suite_diff():
    from sparkcheck import ExpectationSuite
    from sparkcheck.diffing import suite_diff

    old = ExpectationSuite("v1")
    old.add("expect_column_values_to_not_be_null", column="a")
    old.add("expect_column_values_to_be_between", column="b",
            min_value=0, max_value=10)
    old.add("expect_column_values_to_match_regex", column="c", regex="^x")

    new = ExpectationSuite("v2")
    new.add("expect_column_values_to_not_be_null", column="a")           # same
    new.add("expect_column_values_to_be_between", column="b",
            min_value=0, max_value=20)                                   # loosened
    new.add("expect_column_values_to_be_unique", column="d")             # added
    # regex on c removed

    d = suite_diff(old, new)
    assert [a["expectation_type"] for a in d["added"]] == [
        "expect_column_values_to_be_unique"]
    assert [r["expectation_type"] for r in d["removed"]] == [
        "expect_column_values_to_match_regex"]
    assert len(d["changed"]) == 1
    ch = d["changed"][0]
    assert ch["expectation"] == "expect_column_values_to_be_between"
    assert ch["kwargs"] == {"max_value": {"old": 10, "new": 20}}


def test_suite_diff_column_list_domains_not_collapsed():
    # the pair tuple (None, None) is truthy — a naive `or` chain would
    # collapse every column_list expectation into one "(None, None)" domain
    # and report changed instead of added+removed
    from sparkcheck import ExpectationSuite
    from sparkcheck.diffing import suite_diff

    old = ExpectationSuite("v1")
    old.add("expect_compound_columns_to_be_unique", column_list=["a", "b"])
    new = ExpectationSuite("v2")
    new.add("expect_compound_columns_to_be_unique", column_list=["c", "d"])

    d = suite_diff(old, new)
    assert d["changed"] == []
    assert [a["kwargs"]["column_list"] for a in d["added"]] == [["c", "d"]]
    assert [r["kwargs"]["column_list"] for r in d["removed"]] == [["a", "b"]]


def test_suite_diff_identical_is_empty():
    from sparkcheck import ExpectationSuite
    from sparkcheck.diffing import suite_diff

    s = ExpectationSuite("same")
    s.add("expect_column_values_to_not_be_null", column="a")
    d = suite_diff(s, s)
    assert d == {"added": [], "removed": [], "changed": []}


def test_revalidate_delta_counts_only_churn(spark):
    from sparkcheck import ExpectationSuite

    old = spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "b"), (3, 30, "c")], "k int, v int, s string"
    )
    # key 2 changed (v 20 -> -5, violates between), key 4 added (null s,
    # violates not_null), keys 1/3 untouched, key 3 removed? no — keep 3
    new = spark.createDataFrame(
        [(1, 10, "a"), (2, -5, "b"), (3, 30, "c"), (4, 40, None)],
        "k int, v int, s string",
    )
    suite = ExpectationSuite("d")
    suite.add("expect_column_values_to_be_between", column="v",
              min_value=0, max_value=100)
    suite.add("expect_column_values_to_not_be_null", column="s")
    rep, skipped = diffing.revalidate_delta(old, new, ["k"], suite)
    rows = {r["expectation"]: (r["delta_rows"], r["unexpected"])
            for r in rep.collect()}
    # delta = {2 (changed), 4 (added)}: v=-5 violates between; s=None
    # violates not_null; the untouched keys contribute nothing
    assert rows == {
        "expect_column_values_to_be_between:v": (2, 1),
        "expect_column_values_to_not_be_null:s": (2, 1),
    }
    assert skipped == {}


def test_revalidate_delta_skips_cross_row(spark):
    from sparkcheck import ExpectationSuite

    old = spark.createDataFrame([(1, "x")], "k int, s string")
    new = spark.createDataFrame([(1, "x"), (2, "x")], "k int, s string")
    suite = ExpectationSuite("d")
    suite.add("expect_column_values_to_be_unique", column="s")
    suite.add("expect_column_values_to_not_be_null", column="s")
    rep, skipped = diffing.revalidate_delta(old, new, ["k"], suite)
    assert rep.collect()[0]["delta_rows"] == 1  # only the added key 2
    assert any("unique" in k for k in skipped)  # refused, not silently wrong
    # an all-cross-row suite yields an empty (typed) report, never a crash
    only_unique = ExpectationSuite("u")
    only_unique.add("expect_column_values_to_be_unique", column="s")
    rep2, skipped2 = diffing.revalidate_delta(old, new, ["k"], only_unique)
    assert rep2.count() == 0 and skipped2


def test_revalidate_delta_no_churn_zero_cost(spark):
    from sparkcheck import ExpectationSuite

    df = spark.createDataFrame([(1, 5), (2, 6)], "k int, v int")
    suite = ExpectationSuite("d")
    suite.add("expect_column_values_to_be_between", column="v",
              min_value=0, max_value=100)
    rep, _ = diffing.revalidate_delta(df, df, ["k"], suite)
    assert [tuple(r) for r in rep.collect()] == [
        ("expect_column_values_to_be_between:v", 0, 0)
    ]
