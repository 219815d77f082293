"""End-to-end spine test (SURVEY.md §7 step 1): suite parsing -> resolver
bundling -> mostly-success -> EVR shaping, cross-checked against a pandas
oracle on the same rows."""

from __future__ import annotations

import pytest

from sparkcheck import ExpectationSuite, Validator, validate_df
from sparkcheck.metrics import MetricResolver, MetricConfiguration, Domain


def make_df(spark, rows, schema):
    return spark.createDataFrame(rows, schema=schema)


def test_not_be_null_end_to_end(spark):
    df = make_df(
        spark,
        [(1, "a"), (2, None), (3, "c"), (None, "d")],
        "x int, y string",
    )
    suite = ExpectationSuite("spine")
    suite.add("expect_column_values_to_not_be_null", column="y")
    suite.add("expect_column_values_to_not_be_null", column="x", mostly=0.5)
    out = validate_df(df, suite, result_format="BASIC")
    r0, r1 = out["results"]
    assert r0["success"] is False
    assert r0["result"]["element_count"] == 4
    assert r0["result"]["unexpected_count"] == 1
    assert r0["result"]["unexpected_percent"] == 25.0
    assert r0["result"]["missing_count"] == 0  # nullity check: nulls are violations
    assert r1["success"] is True  # 3/4 >= 0.5
    assert out["statistics"]["evaluated_expectations"] == 2
    assert out["statistics"]["successful_expectations"] == 1


def test_vacuous_truth_on_empty_and_all_null(spark):
    # reference: expectation.py:2900-2903 — empty/all-null domain -> success
    df = make_df(spark, [(None,), (None,)], "x string")
    suite = ExpectationSuite("s")
    suite.add("expect_column_values_to_be_in_set", column="x", value_set=["a"])
    out = validate_df(df, suite)
    assert out["results"][0]["success"] is True
    assert out["results"][0]["result"]["missing_count"] == 2

    empty = spark.createDataFrame([], "x string")
    out2 = validate_df(empty, suite)
    assert out2["results"][0]["success"] is True


def test_bundling_single_job_per_domain(spark):
    """All agg metrics for one domain must resolve in ONE df.agg pass."""
    df = make_df(spark, [(1.0, "a"), (2.0, "b"), (3.0, None)], "v double, s string")
    resolver = MetricResolver(df)
    dom_v = Domain(column="v")
    dom_s = Domain(column="s")
    reqs = [
        MetricConfiguration("table.row_count", dom_v),
        MetricConfiguration("column.mean", dom_v),
        MetricConfiguration("column.max", dom_v),
        MetricConfiguration("column.nonnull_count", dom_s),
    ]
    # same compute domain (no filters) -> one bundle
    compute_ids = {r.domain.compute_id for r in reqs}
    assert len(compute_ids) == 1
    resolved = resolver.resolve(reqs)
    assert resolved[reqs[0].id] == 3
    assert resolved[reqs[1].id] == 2.0
    assert resolved[reqs[2].id] == 3.0
    assert resolved[reqs[3].id] == 2


def test_row_condition_domain(spark):
    df = make_df(spark, [(1, 10), (2, 20), (3, 30)], "k int, v int")
    suite = ExpectationSuite("s")
    suite.add(
        "expect_column_values_to_be_between",
        column="v",
        min_value=15,
        row_condition="k >= 2",
    )
    out = validate_df(df, suite)
    assert out["results"][0]["success"] is True
    assert out["results"][0]["result"]["element_count"] == 2


def test_result_formats(spark):
    df = make_df(spark, [("a",), ("b",), ("q",), ("q",), (None,)], "x string")
    suite = ExpectationSuite("s")
    suite.add(
        "expect_column_values_to_be_in_set", column="x", value_set=["a", "b"]
    )

    boolean = validate_df(df, suite, result_format="BOOLEAN_ONLY")["results"][0]
    assert set(boolean.keys()) == {"success", "exception_info", "expectation_config"}

    summary = validate_df(df, suite, result_format="SUMMARY")["results"][0]
    assert summary["result"]["partial_unexpected_counts"] == [
        {"value": "q", "count": 2}
    ]

    complete = validate_df(df, suite, result_format="COMPLETE")["results"][0]
    assert sorted(complete["result"]["unexpected_list"]) == ["q", "q"]
    assert complete["result"]["element_count"] == 5
    assert complete["result"]["missing_count"] == 1
    assert complete["result"]["unexpected_percent"] == 50.0
    assert complete["result"]["unexpected_percent_total"] == 40.0


def test_catch_exceptions_failed_evr(spark):
    df = make_df(spark, [(1,)], "x int")
    suite = ExpectationSuite("s")
    suite.add("expect_column_values_to_match_regex", column="nope", regex="a")
    out = validate_df(df, suite)
    r = out["results"][0]
    assert r["success"] is False
    assert r["exception_info"]["raised_exception"] is True


def test_pandas_oracle_cross_check(spark, lineitem):
    """Aggregate metrics vs a pandas oracle on the sf0.001 lineitem table."""
    pdf = lineitem.toPandas()
    suite = ExpectationSuite("oracle")
    suite.add(
        "expect_column_mean_to_be_between",
        column="l_quantity",
        min_value=float(pdf.l_quantity.mean()) - 1e-9,
        max_value=float(pdf.l_quantity.mean()) + 1e-9,
    )
    suite.add(
        "expect_column_stdev_to_be_between",
        column="l_extendedprice",
        min_value=float(pdf.l_extendedprice.std(ddof=1)) - 1e-6,
        max_value=float(pdf.l_extendedprice.std(ddof=1)) + 1e-6,
    )
    suite.add("expect_table_row_count_to_equal", value=len(pdf))
    out = validate_df(lineitem, suite)
    assert out["success"], out
