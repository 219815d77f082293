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


# --- round-2 parsers -------------------------------------------------------


@_settings
@given(
    col=st.sampled_from(["foo", "pk_2", "a-b.c"]),
    op=st.sampled_from([">", "<", ">=", "<=", "==", "!="]),
    num=st.one_of(
        st.integers(min_value=-1000, max_value=1000),
        st.floats(min_value=-100, max_value=100, allow_nan=False,
                  allow_infinity=False),
    ),
)
def test_ge_dsl_numeric_matches_pandas(spark, col, op, num):
    """Random col/op/number DSL conditions filter identically to pandas."""
    import operator as _op

    from sparkcheck.row_conditions import parse_condition_to_spark_sql

    values = [-500.0, -1.0, 0.0, 1.0, 2.0, 50.0, 999.0, None]
    sql = parse_condition_to_spark_sql(f'col("{col}") {op} {num!r}')
    df = spark.createDataFrame([(v,) for v in values], f"`{col}` double")
    got = sorted(
        r[col] for r in df.filter(sql).collect() if r[col] is not None
    )
    ops = {">": _op.gt, "<": _op.lt, ">=": _op.ge, "<=": _op.le,
           "==": _op.eq, "!=": _op.ne}
    want = sorted(
        float(v) for v in values if v is not None and ops[op](float(v), num)
    )
    assert got == want


@_settings
@given(
    a=st.integers(min_value=-50, max_value=50),
    b=st.integers(min_value=1, max_value=20),
    c=st.integers(min_value=-10, max_value=10),
)
def test_eval_param_arithmetic_matches_python(spark, a, b, c):
    from sparkcheck.evaluation_parameters import parse_evaluation_parameter

    params = {"a": a, "b": b, "c": c}
    for expr, want in [
        ("a + b * c", a + b * c),
        ("(a + b) * c", (a + b) * c),
        ("a - b / b", a - b / b),
        ("trunc(a / b) + c", int(a / b) + c),
        ("abs(c) ^ 2", abs(c) ** 2),
        ("-a + b", -a + b),
    ]:
        got = parse_evaluation_parameter(expr, params)
        assert got == want, (expr, got, want)


# ---------------------------------------------------------------------------
# round-4 curation-operator invariants
# ---------------------------------------------------------------------------

_TEXTS = st.lists(
    st.text(alphabet="ab ", min_size=0, max_size=30), min_size=1, max_size=12
)


@_settings
@given(texts=_TEXTS, block=st.sampled_from([1, 2, 3]))
def test_passage_dedup_invariants(spark, texts, block):
    from pyspark.sql import functions as F

    from sparkcheck import dedup

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    out = dedup.drop_duplicate_passages(df, block_tokens=block)
    rows = {r["doc_id"]: r for r in out.collect()}
    # every doc accounted for
    assert set(rows) == set(range(len(texts)))
    # exactly one survivor per distinct passage, corpus-wide
    p = dedup.split_passages(df, block)
    kept = sum(r["kept_passages"] for r in rows.values())
    assert kept == p.select("passage").distinct().count()
    # each doc's rebuilt text is its original passage sequence minus cuts
    originals = {
        d: [r["passage"] for r in grp]
        for d, grp in __import__("itertools").groupby(
            sorted(p.collect(), key=lambda r: (r["doc_id"], r["idx"])),
            key=lambda r: r["doc_id"],
        )
    }
    for d, r in rows.items():
        got = r["text_dedup"].split(" ") if r["text_dedup"] else []
        orig = " ".join(originals.get(d, [])).split(" ") if originals.get(d) else []
        # survivors appear in original order (subsequence check on tokens)
        it = iter(orig)
        assert all(tok in it for tok in got), (d, got, orig)


@_settings
@given(
    keys=st.lists(st.integers(0, 10_000), min_size=1, max_size=40, unique=True),
    cap=st.integers(1, 5),
)
def test_per_group_cap_invariants(spark, keys, cap):
    from sparkcheck import sampling

    df = spark.createDataFrame(
        [(k, f"g{k % 3}") for k in keys], "k int, g string"
    )
    out = sampling.per_group_cap(df, "g", cap, "k").collect()
    by = {}
    for r in out:
        by.setdefault(r["g"], set()).add(r["k"])
    sizes = {}
    for k in keys:
        sizes[f"g{k % 3}"] = sizes.get(f"g{k % 3}", 0) + 1
    for g, n in sizes.items():
        # exactly min(cap, |group|) kept per group
        assert len(by.get(g, set())) == min(cap, n), (g, cap, n)


@_settings
@given(
    keys=st.lists(st.integers(0, 10_000), min_size=1, max_size=50, unique=True),
    w=st.sampled_from([{"a": 0.5, "b": 0.5}, {"a": 0.7, "b": 0.2, "c": 0.1}]),
)
def test_hash_split_invariants(spark, keys, w):
    from sparkcheck import sampling

    df = spark.createDataFrame([(k,) for k in keys], "k int")
    got = {r["k"]: r["split"] for r in sampling.hash_split(df, w, "k").collect()}
    # total cover, names from the weight dict
    assert set(got) == set(keys)
    assert set(got.values()) <= set(w)
    # deterministic: a second run assigns identically
    again = {r["k"]: r["split"] for r in sampling.hash_split(df, w, "k").collect()}
    assert got == again


@given(vals=NUMS, p=st.sampled_from([0.0, 0.07, 0.25, 0.29, 0.5, 0.75, 0.93, 1.0]))
@_settings
def test_exact_quantiles_match_numpy_type1(spark, vals, p):
    """exact_quantiles == numpy's 'inverted_cdf' (type-1) quantile on any
    int/null mix — sweeps the float-rank hazard zone (0.07, 0.29, ...)."""
    import numpy as np

    from sparkcheck.stats import exact_quantiles

    df = spark.createDataFrame(
        [(float(v) if v is not None else None,) for v in vals], "x double"
    )
    nonnull = sorted(v for v in vals if v is not None)
    row = exact_quantiles(df, "x", [p]).collect()[0]
    name = "p" + ("%g" % (p * 100)).replace(".", "_")
    if not nonnull:
        assert row[name] is None
        return
    n = len(nonnull)
    from fractions import Fraction

    f = Fraction(str(p))
    k = max((f.numerator * n + f.denominator - 1) // f.denominator, 1)
    assert row[name] == float(nonnull[k - 1])
    if 0 < p <= 1:
        # numpy's inverted_cdf agrees with the type-1 definition for p>0
        assert row[name] == float(
            np.quantile(np.array(nonnull, dtype=float), p, method="inverted_cdf")
        )


@given(
    a_vals=st.lists(st.integers(min_value=0, max_value=12), min_size=1, max_size=25),
    b_vals=st.lists(st.integers(min_value=0, max_value=12), min_size=1, max_size=25),
)
@_settings
def test_two_sample_distances_match_scipy_formulas(spark, a_vals, b_vals):
    """KS == max ECDF gap; W1 == mean absolute difference of sorted
    quantile functions (computed here by the integral definition on the
    merged support) — verified against a direct python computation."""
    from sparkcheck.distribution import two_sample_distances

    a = spark.createDataFrame([(float(v),) for v in a_vals], "x double")
    b = spark.createDataFrame([(float(v),) for v in b_vals], "x double")
    r = two_sample_distances(a, b, "x").collect()[0]
    support = sorted(set(a_vals) | set(b_vals))
    na, nb = len(a_vals), len(b_vals)
    ks = 0.0
    w1 = 0.0
    for i, v in enumerate(support):
        fa = sum(1 for x in a_vals if x <= v) / na
        fb = sum(1 for x in b_vals if x <= v) / nb
        ks = max(ks, abs(fa - fb))
        if i + 1 < len(support):
            w1 += abs(fa - fb) * (support[i + 1] - v)
    assert abs(r["ks_stat"] - ks) < 1e-6
    assert abs(r["wasserstein"] - w1) < 1e-6
