"""Data profiler: generate an expectation suite from observed data.

The reference ships profilers that build suites from a batch
(great_expectations/profile/basic_suite_builder_profiler.py and the
rule_based_profiler/ subsystem, ~20k LoC of rule machinery). Ours keeps the
capability — look at a sample batch, emit a suite that encodes its shape —
as ONE fused aggregation pass over the DataFrame:

  - every column:        expect_column_values_to_not_be_null (observed
                         null rate, relaxed by ``slack``)
  - numeric columns:     mean/min/max between (range widened by slack),
                         quantiles between
  - string columns:      value_length between; low-cardinality columns
                         (distinct <= categorical_threshold) get
                         expect_column_values_to_be_in_set
  - table:               row_count between (half .. double)

All statistics come from a single ``df.agg(...)`` job (the same bundling
machinery the validator uses — approx sketches, no per-column jobs),
plus one small value_counts job per detected categorical column.

The output is a plain ExpectationSuite: inspect it, prune it, check it
into git — profile once on a golden batch, then validate every future
partition against it.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .metrics import VALUE_COUNTS_MAX_GROUPS, float_columns
from .suite import ExpectationSuite

_NUMERIC_TYPES = ("int", "bigint", "smallint", "tinyint", "float", "double",
                  "decimal")
_STRING_TYPES = ("string",)


def _is_numeric(dtype: str) -> bool:
    return any(dtype.startswith(t) for t in _NUMERIC_TYPES)


def profile_suite(
    df: DataFrame,
    name: str = "profiled",
    slack: float = 0.1,
    categorical_threshold: int = 50,
    mostly: float | None = None,
) -> ExpectationSuite:
    """Build a suite describing ``df``'s observed shape.

    ``slack`` widens numeric bounds by that fraction of the observed range
    (so natural drift does not trip the suite); ``mostly`` defaults to the
    observed nonnull rate minus slack for columns that contain nulls."""
    dtypes = dict(df.dtypes)
    floats = float_columns(df)
    aggs: list = [F.count(F.lit(1)).alias("__n")]
    for c, t in dtypes.items():
        col = F.col(c)
        if c in floats:
            col = F.when(~F.isnan(col), col)  # NaN == missing (engine-wide)
        aggs.append(F.count(col).alias(f"nn__{c}"))
        aggs.append(
            F.approx_count_distinct(col, rsd=0.02).alias(f"nd__{c}")
        )
        if _is_numeric(t):
            aggs += [
                F.min(col).alias(f"min__{c}"),
                F.max(col).alias(f"max__{c}"),
                F.mean(col).alias(f"mean__{c}"),
                F.percentile_approx(
                    col, F.array(F.lit(0.05), F.lit(0.5), F.lit(0.95)), F.lit(10000)
                ).alias(f"q__{c}"),
            ]
        elif t in _STRING_TYPES:
            aggs += [
                F.min(F.length(col)).alias(f"lmin__{c}"),
                F.max(F.length(col)).alias(f"lmax__{c}"),
            ]
    stats = df.agg(*aggs).collect()[0].asDict()
    n = int(stats["__n"] or 0)

    suite = ExpectationSuite(name)
    if n == 0:
        suite.add("expect_table_row_count_to_be_between", min_value=0)
        return suite
    suite.add(
        "expect_table_row_count_to_be_between",
        min_value=max(1, int(n * 0.5)),
        max_value=int(n * 2),
    )
    suite.add(
        "expect_table_columns_to_match_set",
        column_set=sorted(dtypes),
        exact_match=True,
    )

    for c, t in dtypes.items():
        nn = int(stats[f"nn__{c}"] or 0)
        null_rate = 1.0 - nn / n
        if null_rate == 0:
            suite.add("expect_column_values_to_not_be_null", column=c)
        elif null_rate < 0.5:
            m = mostly if mostly is not None else max(
                0.0, round(1.0 - null_rate - slack, 4)
            )
            suite.add("expect_column_values_to_not_be_null", column=c, mostly=m)
        if nn == 0:
            continue
        if _is_numeric(t):
            lo, hi = stats[f"min__{c}"], stats[f"max__{c}"]
            if lo is not None and hi is not None:
                pad = (float(hi) - float(lo)) * slack
                suite.add(
                    "expect_column_values_to_be_between",
                    column=c,
                    min_value=float(lo) - pad,
                    max_value=float(hi) + pad,
                )
                mean = float(stats[f"mean__{c}"])
                mpad = max(abs(mean) * slack, pad / 2, 1e-9)
                suite.add(
                    "expect_column_mean_to_be_between",
                    column=c, min_value=mean - mpad, max_value=mean + mpad,
                )
                q = stats[f"q__{c}"]
                if q and all(v is not None for v in q):
                    suite.add(
                        "expect_column_quantile_values_to_be_between",
                        column=c,
                        quantile_ranges={
                            "quantiles": [0.05, 0.5, 0.95],
                            "value_ranges": [
                                [float(v) - pad, float(v) + pad] for v in q
                            ],
                        },
                        exact=False,
                    )
        elif t in _STRING_TYPES:
            lmin, lmax = stats[f"lmin__{c}"], stats[f"lmax__{c}"]
            if lmin is not None:
                suite.add(
                    "expect_column_value_lengths_to_be_between",
                    column=c,
                    min_value=0,
                    max_value=int(lmax) * 2,
                )
            nd = int(stats[f"nd__{c}"] or 0)
            if 0 < nd <= categorical_threshold:
                values = [
                    r[c]
                    for r in df.where(F.col(c).isNotNull())
                    .select(c).distinct()
                    .limit(min(categorical_threshold * 2, VALUE_COUNTS_MAX_GROUPS))
                    .collect()
                ]
                suite.add(
                    "expect_column_values_to_be_in_set",
                    column=c, value_set=sorted(values),
                )
    return suite
