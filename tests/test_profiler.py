"""Profiler: one fused pass -> a suite the same batch passes, and that
catches shape drift on a different batch."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkcheck import validate_df
from sparkcheck.profiler import profile_suite


def test_profiled_suite_passes_on_its_own_batch(spark, orders):
    suite = profile_suite(orders, slack=0.2)
    types = [e.expectation_type for e in suite.expectations]
    assert "expect_table_row_count_to_be_between" in types
    assert "expect_table_columns_to_match_set" in types
    assert "expect_column_values_to_be_in_set" in types  # o_orderstatus etc.
    assert "expect_column_mean_to_be_between" in types
    rep = validate_df(orders, suite)
    bad = [r for r in rep["results"] if not r["success"]]
    assert not bad, [
        (r["expectation_config"]["expectation_type"],
         r["expectation_config"]["kwargs"].get("column"),
         r.get("result"), r.get("exception_info"))
        for r in bad
    ]


def test_profiled_suite_catches_drift(spark, orders):
    suite = profile_suite(orders, slack=0.1)
    drifted = orders.withColumn(
        "o_totalprice", F.col("o_totalprice") * 100
    ).withColumn("o_orderstatus", F.lit("X"))
    rep = validate_df(drifted, suite)
    failed_types = {
        (r["expectation_config"]["expectation_type"],
         r["expectation_config"]["kwargs"].get("column"))
        for r in rep["results"] if not r["success"]
    }
    assert ("expect_column_mean_to_be_between", "o_totalprice") in failed_types
    assert ("expect_column_values_to_be_in_set", "o_orderstatus") in failed_types


def test_profiler_handles_nulls_and_nan(spark):
    df = spark.createDataFrame(
        [(1.0, "a"), (float("nan"), "b"), (None, None), (4.0, "a"), (5.0, "b")],
        "x double, s string",
    )
    suite = profile_suite(df, slack=0.2)
    rep = validate_df(df, suite)
    assert rep["success"], [
        (r["expectation_config"], r.get("result")) for r in rep["results"]
        if not r["success"]
    ]
    # NaN/None -> nonnull rate 0.5 -> a mostly-relaxed nullity expectation
    nn = [e for e in suite.expectations
          if e.expectation_type == "expect_column_values_to_not_be_null"
          and e.kwargs.get("column") == "x"]
    assert nn and 0 < nn[0].kwargs["mostly"] < 1


def test_profiler_empty_df(spark):
    df = spark.createDataFrame([], "x int, s string")
    suite = profile_suite(df)
    assert validate_df(df, suite)["success"]
