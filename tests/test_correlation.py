"""Correlation profiling (stats.correlation_profile / spearman_correlation)
and the expect_column_pair_correlation_to_be_between extension — differential
against numpy; plus asof_join differential against pandas.merge_asof."""

import random

import numpy as np
import pandas as pd
import pytest

from sparkcheck import temporal
from sparkcheck.stats import correlation_profile, spearman_correlation
from sparkcheck.suite import ExpectationConfiguration, ExpectationSuite
from sparkcheck.validator import validate_df


def _frame(seed=7, n=400, null_every=0):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        a = rng.gauss(0, 1)
        b = 0.6 * a + rng.gauss(0, 0.8)
        c = rng.uniform(-2, 2)
        if null_every and i % null_every == 0:
            b = None
        rows.append((float(a), b, float(c)))
    return rows


def test_correlation_profile_matches_numpy(spark):
    rows = _frame()
    df = spark.createDataFrame(rows, "a double, b double, c double")
    got = {(r["col_a"], r["col_b"]): (r["n_pairs"], r["pearson_r"])
           for r in correlation_profile(df, ["a", "b", "c"]).collect()}
    arr = np.array(rows, dtype=float)
    for (i, x), (j, y) in [((0, "a"), (1, "b")), ((0, "a"), (2, "c")),
                           ((1, "b"), (2, "c"))]:
        n, r = got[(x, y)]
        assert n == len(rows)
        assert r == pytest.approx(np.corrcoef(arr[:, i], arr[:, j])[0, 1],
                                  abs=1e-6)


def test_correlation_profile_pairwise_complete_nulls(spark):
    rows = _frame(null_every=5)
    df = spark.createDataFrame(rows, "a double, b double, c double")
    got = {(r["col_a"], r["col_b"]): (r["n_pairs"], r["pearson_r"])
           for r in correlation_profile(df, ["a", "b", "c"]).collect()}
    mask = [r[1] is not None for r in rows]
    sub = np.array([r for r, m in zip(rows, mask) if m], dtype=float)
    n, r = got[("a", "b")]
    assert n == len(sub)
    assert r == pytest.approx(np.corrcoef(sub[:, 0], sub[:, 1])[0, 1], abs=1e-6)
    # a/c pair unaffected by b's nulls
    full = np.array(rows, dtype=float)
    assert got[("a", "c")][0] == len(rows)
    assert got[("a", "c")][1] == pytest.approx(
        np.corrcoef(full[:, 0], full[:, 2])[0, 1], abs=1e-6)


def test_correlation_profile_single_aggregate(spark):
    df = spark.createDataFrame(_frame(n=50), "a double, b double, c double")
    plan = correlation_profile(df, ["a", "b", "c"])._jdf.queryExecution() \
        .executedPlan().toString()
    # one fused aggregation pass over the data (final+partial = 2 nodes),
    # no join/exchange fan-out per pair
    assert plan.count("HashAggregate") <= 2
    assert "Join" not in plan


def _spearman_ref(x, y):
    """Midrank Spearman without scipy."""
    def ranks(v):
        order = sorted(range(len(v)), key=lambda i: v[i])
        r = [0.0] * len(v)
        i = 0
        while i < len(order):
            j = i
            while j + 1 < len(order) and v[order[j + 1]] == v[order[i]]:
                j += 1
            avg = (i + j) / 2.0 + 1.0
            for k in range(i, j + 1):
                r[order[k]] = avg
            i = j + 1
        return r
    return float(np.corrcoef(ranks(x), ranks(y))[0, 1])


def test_spearman_matches_midrank_reference(spark):
    rng = random.Random(3)
    # integer-ish data → many ties → midranks actually exercised
    rows = [(float(rng.randint(0, 9)), float(rng.randint(0, 9) + 0.5 * rng.randint(0, 1)))
            for _ in range(300)]
    df = spark.createDataFrame(rows, "a double, b double")
    got = spearman_correlation(df, "a", "b").collect()[0]
    want = _spearman_ref([r[0] for r in rows], [r[1] for r in rows])
    assert got["n_pairs"] == 300
    assert got["spearman_r"] == pytest.approx(want, abs=1e-6)


def test_spearman_null_exclusion(spark):
    rows = [(1.0, 1.0), (2.0, None), (3.0, 2.0), (4.0, 8.0), (None, 5.0)]
    df = spark.createDataFrame(rows, "a double, b double")
    got = spearman_correlation(df, "a", "b").collect()[0]
    assert got["n_pairs"] == 3
    sub = [(a, b) for a, b in rows if a is not None and b is not None]
    want = _spearman_ref([r[0] for r in sub], [r[1] for r in sub])
    assert got["spearman_r"] == pytest.approx(want, abs=1e-6)


def test_expect_column_pair_correlation_between(spark):
    df = spark.createDataFrame(_frame(), "a double, b double, c double")
    suite = ExpectationSuite(
        name="corr",
        expectations=[
            ExpectationConfiguration.from_dict({
                "expectation_type":
                    "expect_column_pair_correlation_to_be_between",
                "kwargs": {"column_A": "a", "column_B": "b",
                           "min_value": 0.3, "max_value": 0.9},
            }),
            ExpectationConfiguration.from_dict({
                "expectation_type":
                    "expect_column_pair_correlation_to_be_between",
                "kwargs": {"column_A": "a", "column_B": "c",
                           "min_value": 0.5},
            }),
        ],
    )
    rep = validate_df(df, suite)
    by_pair = {tuple(sorted((r["expectation_config"]["kwargs"]["column_A"],
                             r["expectation_config"]["kwargs"]["column_B"]))): r
               for r in rep["results"]}
    assert by_pair[("a", "b")]["success"] is True
    arr = np.array(_frame(), dtype=float)
    assert by_pair[("a", "b")]["result"]["observed_value"] == pytest.approx(
        np.corrcoef(arr[:, 0], arr[:, 1])[0, 1], abs=1e-9)
    assert by_pair[("a", "c")]["success"] is False  # near-zero correlation


# ---------------------------------------------------------------------------
# asof_join differential vs pandas.merge_asof
# ---------------------------------------------------------------------------


def test_asof_join_differential_vs_pandas(spark):
    rng = random.Random(11)
    base = pd.Timestamp("2024-01-01")
    left_rows = [(i, rng.randint(0, 4),
                  base + pd.Timedelta(seconds=rng.randint(0, 5000)))
                 for i in range(250)]
    right_rows = [(1000 + i, rng.randint(0, 4),
                   base + pd.Timedelta(seconds=rng.randint(0, 5000)),
                   float(i))
                  for i in range(120)]
    lpdf = pd.DataFrame(left_rows, columns=["event_id", "k", "ts"])
    rpdf = pd.DataFrame(right_rows, columns=["rid", "k", "ts", "v"])
    # pandas merge_asof: backward inclusive, same semantics; requires sort.
    # On exact (k, ts) collisions merge_asof takes the LAST right row in
    # sort order, so pre-sort right by rid to mirror right_tiebreak="rid".
    want = pd.merge_asof(
        lpdf.sort_values("ts", kind="stable"),
        rpdf.sort_values(["ts", "rid"], kind="stable"),
        on="ts", by="k", direction="backward",
    ).set_index("event_id")

    ldf = spark.createDataFrame(lpdf, "event_id long, k long, ts timestamp")
    rdf = spark.createDataFrame(
        rpdf, "rid long, k long, ts timestamp, v double")
    got = {r["event_id"]: (r["asof_rid"], r["asof_v"])
           for r in temporal.asof_join(
               ldf, rdf, "k", "ts", ("rid", "v"),
               right_tiebreak="rid").collect()}
    assert len(got) == len(lpdf)
    for eid, row in want.iterrows():
        grid, gv = got[eid]
        if pd.isna(row["rid"]):
            assert grid is None and gv is None
        else:
            assert grid == int(row["rid"]) and gv == row["v"]


def test_asof_join_tolerance_differential_vs_pandas(spark):
    rng = random.Random(23)
    base = pd.Timestamp("2024-01-01")
    left_rows = [(i, rng.randint(0, 2),
                  base + pd.Timedelta(seconds=rng.randint(0, 2000)))
                 for i in range(120)]
    right_rows = [(1000 + i, rng.randint(0, 2),
                   base + pd.Timedelta(seconds=rng.randint(0, 2000)),
                   float(i))
                  for i in range(60)]
    lpdf = pd.DataFrame(left_rows, columns=["event_id", "k", "ts"])
    rpdf = pd.DataFrame(right_rows, columns=["rid", "k", "ts", "v"])
    want = pd.merge_asof(
        lpdf.sort_values("ts", kind="stable"),
        rpdf.sort_values(["ts", "rid"], kind="stable"),
        on="ts", by="k", direction="backward",
        tolerance=pd.Timedelta(seconds=300),
    ).set_index("event_id")

    ldf = spark.createDataFrame(lpdf, "event_id long, k long, ts timestamp")
    rdf = spark.createDataFrame(
        rpdf, "rid long, k long, ts timestamp, v double")
    got = {r["event_id"]: r["asof_rid"]
           for r in temporal.asof_join(
               ldf, rdf, "k", "ts", ("rid", "v"),
               right_tiebreak="rid", tolerance_seconds=300).collect()}
    for eid, row in want.iterrows():
        if pd.isna(row["rid"]):
            assert got[eid] is None
        else:
            assert got[eid] == int(row["rid"])
