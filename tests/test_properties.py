"""Property-based tests: engine EVRs vs a pandas-computed oracle on
randomized small columns (hypothesis). Complements the fixed fixtures by
sweeping null placement, bounds, value sets, and mostly thresholds."""

from __future__ import annotations

import math

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sparkcheck import ExpectationConfiguration, ExpectationSuite, validate_df

SET = st.sampled_from(["a", "b", "c", "d"])
VALS = st.lists(st.one_of(st.none(), SET), min_size=1, max_size=30)
NUMS = st.lists(
    st.one_of(st.none(), st.integers(min_value=-50, max_value=50)),
    min_size=1, max_size=30,
)

_settings = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _run(spark, values, ddl, cfg):
    df = spark.createDataFrame([(v,) for v in values], ddl)
    suite = ExpectationSuite("p", [ExpectationConfiguration(*cfg)])
    return validate_df(df, suite, result_format="COMPLETE")["results"][0]


@_settings
@given(values=VALS, value_set=st.lists(SET, max_size=3), mostly=st.sampled_from([0.3, 0.7, 1.0]))
def test_in_set_matches_pandas(spark, values, value_set, mostly):
    s = pd.Series(values, dtype=object)
    nonnull = s.notna()
    unexpected = s[nonnull & ~s.isin(value_set)]
    evr = _run(spark, values, "c string",
               ("expect_column_values_to_be_in_set",
                {"column": "c", "value_set": value_set, "mostly": mostly}))
    res = evr["result"]
    assert res["unexpected_count"] == len(unexpected)
    assert sorted(res["unexpected_list"]) == sorted(unexpected.tolist())
    n = int(nonnull.sum())
    expected_success = (n == 0) or ((n - len(unexpected)) / n >= mostly)
    assert evr["success"] == expected_success


@_settings
@given(values=NUMS,
       lo=st.integers(min_value=-60, max_value=60),
       span=st.integers(min_value=0, max_value=60),
       strict=st.booleans())
def test_between_matches_pandas(spark, values, lo, span, strict):
    hi = lo + span
    s = pd.Series(values, dtype="float64")
    nonnull = s.notna()
    if strict:
        ok = (s > lo) & (s < hi)
    else:
        ok = (s >= lo) & (s <= hi)
    unexpected = s[nonnull & ~ok]
    evr = _run(spark, values, "c int",
               ("expect_column_values_to_be_between",
                {"column": "c", "min_value": lo, "max_value": hi,
                 "strict_min": strict, "strict_max": strict}))
    res = evr["result"]
    assert res["unexpected_count"] == len(unexpected)
    n = int(nonnull.sum())
    expected_success = (n == 0) or (len(unexpected) == 0)
    assert evr["success"] == expected_success


@_settings
@given(values=NUMS)
def test_aggregates_match_pandas(spark, values):
    s = pd.Series(values, dtype="float64")
    evr = _run(spark, values, "c int",
               ("expect_column_mean_to_be_between",
                {"column": "c", "min_value": -1000, "max_value": 1000}))
    observed = evr["result"]["observed_value"]
    if s.notna().sum() == 0:
        assert observed is None and not evr["success"]
    else:
        assert math.isclose(observed, float(s.mean()), rel_tol=1e-9)
        assert evr["success"]


@_settings
@given(values=VALS)
def test_unique_matches_pandas(spark, values):
    s = pd.Series(values, dtype=object)
    nonnull = s.dropna()
    counts = nonnull.value_counts()
    dup_rows = int(counts[counts > 1].sum()) if len(counts) else 0
    evr = _run(spark, values, "c string",
               ("expect_column_values_to_be_unique", {"column": "c"}))
    assert evr["result"]["unexpected_count"] == dup_rows
