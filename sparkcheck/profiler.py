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

For the reference's configurable-rule surface (rule_based_profiler/: a
rule = DomainBuilder picking columns + ParameterBuilders computing stats
with knobs + ExpectationConfigurationBuilders choosing families),
``profile_suite_with_rules`` accepts the same split as a plain dict —
each rule names a column domain (by type / include / exclude / regex),
the expectation FAMILIES to emit over it, and per-rule parameters (slack
factors, cardinality thresholds, quantile lists). The stats still come
from one fused pass shared by every rule.

The output is a plain ExpectationSuite: inspect it, prune it, check it
into git — profile once on a golden batch, then validate every future
partition against it.
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .metrics import VALUE_COUNTS_MAX_GROUPS, float_columns
from .suite import ExpectationSuite

_NUMERIC_TYPES = ("int", "bigint", "smallint", "tinyint", "float", "double",
                  "decimal")
_STRING_TYPES = ("string",)
_VECTOR_TYPES = ("array<float>", "array<double>")


def _is_numeric(dtype: str) -> bool:
    return any(dtype.startswith(t) for t in _NUMERIC_TYPES)


def _collect_stats(
    df: DataFrame, quantiles: list[float]
) -> tuple[dict[str, str], set, dict[str, Any]]:
    """ONE fused agg over every column: count, nonnull, approx-distinct,
    numeric min/max/mean/percentiles, string length min/max. Every profiling
    rule shares this pass — the reference's parameter builders each run
    their own metric; bundling them is the Spark-native shape."""
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
                    col, F.array(*[F.lit(q) for q in quantiles]), F.lit(10000)
                ).alias(f"q__{c}"),
            ]
        elif t in _STRING_TYPES:
            aggs += [
                F.min(F.length(col)).alias(f"lmin__{c}"),
                F.max(F.length(col)).alias(f"lmax__{c}"),
            ]
        elif t in _VECTOR_TYPES:
            # embedding-shaped columns: dimension range + the observed
            # L2-norm envelope over FINITE norms (a NaN/Inf component
            # would otherwise poison max() — those rows are exactly what
            # the emitted norm expectation will catch)
            raw = F.col(c)
            norm = F.sqrt(
                F.aggregate(
                    raw,
                    F.lit(0.0),
                    lambda acc, x: acc + x.cast("double") * x.cast("double"),
                )
            )
            finite = F.when(
                ~F.isnan(norm) & (norm < F.lit(float("inf"))), norm
            )
            aggs += [
                F.min(F.size(raw)).alias(f"vlmin__{c}"),
                F.max(F.size(raw)).alias(f"vlmax__{c}"),
                F.min(finite).alias(f"vnmin__{c}"),
                F.max(finite).alias(f"vnmax__{c}"),
            ]
    stats = df.agg(*aggs).collect()[0].asDict()
    return dtypes, floats, stats


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
    dtypes, floats, stats = _collect_stats(df, [0.05, 0.5, 0.95])
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
        elif t in _VECTOR_TYPES:
            vlmin, vlmax = stats[f"vlmin__{c}"], stats[f"vlmax__{c}"]
            if vlmin is not None and vlmin == vlmax:
                # fixed-dimension embedding column: pin the dimension —
                # a ragged delivery breaks every downstream ANN stage
                suite.add(
                    "expect_column_vector_lengths_to_equal",
                    column=c, value=int(vlmin),
                )
            nmin, nmax = stats[f"vnmin__{c}"], stats[f"vnmax__{c}"]
            if nmin is not None and nmax is not None:
                # relative floor like the mean bound: unit-normalized
                # corpora have nmin == nmax and still deserve slack
                pad = max(
                    (float(nmax) - float(nmin)) * slack,
                    abs(float(nmax)) * slack / 2,
                    1e-6,
                )
                suite.add(
                    "expect_column_vector_norms_to_be_between",
                    column=c,
                    min_value=round(max(0.0, float(nmin) - pad), 6),
                    max_value=round(float(nmax) + pad, 6),
                )
    return suite


# ---------------------------------------------------------------------------
# Rule-based profiling (reference: rule_based_profiler/ — domain builder +
# parameter builders + expectation-configuration builders, as plain config)
# ---------------------------------------------------------------------------

#: families a rule can emit; the profiler's analog of the reference's
#: ExpectationConfigurationBuilder classes
FAMILIES = (
    "row_count", "columns_set",                      # table-domain
    "not_null", "unique", "between", "mean",         # column-domain
    "quantiles", "value_length", "in_set",
    "regex", "datetime_format",                      # inferred patterns
    "vector",                                        # embedding columns
)

DEFAULT_RULE_CONFIG: dict[str, Any] = {
    "rules": [
        {"name": "table", "families": ["row_count", "columns_set"]},
        {"name": "nulls", "domain": {"column_types": ["any"]},
         "families": ["not_null"]},
        {"name": "numeric", "domain": {"column_types": ["numeric"]},
         "families": ["between", "mean", "quantiles"]},
        {"name": "strings", "domain": {"column_types": ["string"]},
         "families": ["value_length", "in_set"]},
        {"name": "vectors", "domain": {"column_types": ["vector"]},
         "families": ["vector"]},
    ]
}


def _resolve_domain(dom: dict[str, Any] | None, dtypes: dict[str, str]) -> list[str]:
    """DomainBuilder: pick the columns a rule applies to, by type
    (numeric/string/any), explicit include/exclude lists, and a name regex —
    the reference's ColumnDomainBuilder knob set
    (rule_based_profiler/domain_builder/column_domain_builder.py)."""
    dom = dom or {}
    types = dom.get("column_types", ["any"])
    include = dom.get("include")
    exclude = set(dom.get("exclude") or ())
    pattern = dom.get("name_regex")
    cols = []
    for c, t in dtypes.items():
        type_ok = (
            "any" in types
            or ("numeric" in types and _is_numeric(t))
            or ("string" in types and t in _STRING_TYPES)
            or ("vector" in types and t in _VECTOR_TYPES)
        )
        if not type_ok:
            continue
        if include is not None and c not in include:
            continue
        if c in exclude:
            continue
        if pattern and not re.search(pattern, c):
            continue
        cols.append(c)
    return cols


_VARIABLES_PREFIX = "$variables."


def _substitute_variables(node: Any, variables: dict[str, Any]) -> Any:
    """Reference semantics (rule_based_profiler/parameter_container.py):
    a param whose WHOLE value is ``"$variables.<dotted.path>"`` resolves
    from the config's ``variables`` map; unknown names raise. Strings
    merely containing the prefix mid-text pass through unchanged, as do
    all non-string leaves."""
    if isinstance(node, dict):
        return {k: _substitute_variables(v, variables) for k, v in node.items()}
    if isinstance(node, list):
        return [_substitute_variables(v, variables) for v in node]
    if isinstance(node, str) and node.startswith(_VARIABLES_PREFIX):
        cur: Any = variables
        for part in node[len(_VARIABLES_PREFIX):].split("."):
            if not isinstance(cur, dict) or part not in cur:
                raise ValueError(
                    f"unresolved profiler variable {node!r}; defined: "
                    f"{sorted(variables)}"
                )
            cur = cur[part]
        return cur
    return node


def profile_suite_with_rules(
    df: DataFrame,
    config: dict[str, Any] | None = None,
    name: str = "profiled",
) -> ExpectationSuite:
    """Config-driven profiling: the reference's rule_based_profiler split
    (domain / parameters / expectation families) as one dict.

    ``config["rules"]`` is a list of rules; each has

      name:      label (diagnostics only)
      domain:    {"column_types": ["numeric"|"string"|"any"],
                  "include": [cols], "exclude": [cols],
                  "name_regex": str} — omitted for table-domain families
      families:  subset of FAMILIES to emit over the domain
      params:    per-rule knobs —
                   slack (default 0.1)          bound widening fraction
                   mostly (fixed float) / mostly_slack (default = slack)
                   max_null_rate (default 0.5)  skip not_null above it
                   categorical_threshold (50)   in_set cardinality gate
                   quantiles ([0.05, 0.5, 0.95])
                   row_count_factor (2.0)       row_count in [n/f, n*f]
                   length_factor (2.0)          value_length max multiplier
                   unique_min_ratio (0.95)      emit unique when
                                                approx_distinct/nonnull >= it

    Different configs over the same batch produce different suites from the
    SAME single stats pass (the union of every rule's quantile list rides
    one percentile_approx).

    ``config["variables"]`` holds shared values any param/domain field can
    reference as the string ``"$variables.<name>"`` (dotted paths reach
    nested maps) — the reference's variable-substitution mechanism
    (rule_based_profiler: VariablesConfig + "$variables." lookups), so one
    knob (e.g. slack) is set once and reused across rules. Unknown
    variable names raise ValueError up front.

    The returned suite's ``meta["rule_diagnostics"]`` records, per rule,
    the resolved domain columns, families, and how many expectations it
    emitted — the reference profiler's self_check surface, enough to see
    why a rule matched nothing without re-running."""
    config = config or DEFAULT_RULE_CONFIG
    variables = config.get("variables") or {}
    rules = [
        _substitute_variables(r, variables) for r in (config.get("rules") or [])
    ]
    unknown = {
        f for r in rules for f in r.get("families", []) if f not in FAMILIES
    }
    if unknown:
        raise ValueError(f"unknown expectation families {sorted(unknown)}; "
                         f"known: {list(FAMILIES)}")

    # union of quantile requests -> one fused percentile_approx
    all_q: list[float] = []
    for r in rules:
        for q in (r.get("params") or {}).get("quantiles", [0.05, 0.5, 0.95]):
            if q not in all_q:
                all_q.append(float(q))
    all_q = sorted(all_q) or [0.05, 0.5, 0.95]
    dtypes, floats, stats = _collect_stats(df, all_q)
    n = int(stats["__n"] or 0)

    suite = ExpectationSuite(name)
    if n == 0:
        suite.add("expect_table_row_count_to_be_between", min_value=0)
        return suite

    diagnostics: dict[str, dict[str, Any]] = {}
    for ri, rule in enumerate(rules):
        params = rule.get("params") or {}
        slack = float(params.get("slack", 0.1))
        fams = rule.get("families") or []
        cols = _resolve_domain(rule.get("domain"), dtypes)
        n_before = len(suite.expectations)

        # inferred-pattern families: candidate evaluation is its own fused
        # agg per rule (all domain columns x all candidates in one pass) —
        # reference: RegexPatternString / SimpleDateFormatString builders
        str_cols = [c for c in cols if dtypes[c] in _STRING_TYPES]
        if "regex" in fams and str_cols:
            inferred = infer_regex_patterns(
                df, str_cols,
                candidates=params.get("candidate_regexes"),
                threshold=float(params.get("pattern_threshold", 1.0)),
            )
            for c in str_cols:
                if inferred[c]["best"]:
                    suite.add(
                        "expect_column_values_to_match_regex",
                        column=c, regex=inferred[c]["best"],
                    )
        if "datetime_format" in fams and str_cols:
            inferred = infer_datetime_formats(
                df, str_cols,
                candidates=params.get("candidate_date_formats"),
                threshold=float(params.get("pattern_threshold", 1.0)),
            )
            for c in str_cols:
                if inferred[c]["best"]:
                    suite.add(
                        "expect_column_values_to_match_strftime_format",
                        column=c, strftime_format=inferred[c]["best"],
                    )

        if "row_count" in fams:
            f = float(params.get("row_count_factor", 2.0))
            suite.add(
                "expect_table_row_count_to_be_between",
                min_value=max(1, int(n / f)), max_value=int(n * f),
            )
        if "columns_set" in fams:
            suite.add(
                "expect_table_columns_to_match_set",
                column_set=sorted(dtypes), exact_match=True,
            )

        for c in cols:
            t = dtypes[c]
            nn = int(stats[f"nn__{c}"] or 0)
            nd = int(stats[f"nd__{c}"] or 0)
            null_rate = 1.0 - nn / n
            if "not_null" in fams:
                if null_rate == 0:
                    suite.add("expect_column_values_to_not_be_null", column=c)
                elif null_rate < float(params.get("max_null_rate", 0.5)):
                    m = params.get("mostly")
                    if m is None:
                        ms = float(params.get("mostly_slack", slack))
                        m = max(0.0, round(1.0 - null_rate - ms, 4))
                    suite.add(
                        "expect_column_values_to_not_be_null", column=c, mostly=m
                    )
            if nn == 0:
                continue
            if "unique" in fams and nd / nn >= float(
                params.get("unique_min_ratio", 0.95)
            ):
                suite.add("expect_column_values_to_be_unique", column=c)
            if _is_numeric(t):
                lo, hi = stats[f"min__{c}"], stats[f"max__{c}"]
                if lo is None or hi is None:
                    continue
                pad = (float(hi) - float(lo)) * slack
                if "between" in fams:
                    suite.add(
                        "expect_column_values_to_be_between", column=c,
                        min_value=float(lo) - pad, max_value=float(hi) + pad,
                    )
                if "mean" in fams:
                    mean = float(stats[f"mean__{c}"])
                    mpad = max(abs(mean) * slack, pad / 2, 1e-9)
                    suite.add(
                        "expect_column_mean_to_be_between", column=c,
                        min_value=mean - mpad, max_value=mean + mpad,
                    )
                if "quantiles" in fams:
                    want = [float(q) for q in params.get("quantiles", [0.05, 0.5, 0.95])]
                    got = stats[f"q__{c}"]
                    if got is not None and all(v is not None for v in got):
                        by_q = dict(zip(all_q, got))
                        suite.add(
                            "expect_column_quantile_values_to_be_between",
                            column=c,
                            quantile_ranges={
                                "quantiles": want,
                                "value_ranges": [
                                    [float(by_q[q]) - pad, float(by_q[q]) + pad]
                                    for q in want
                                ],
                            },
                            exact=False,
                        )
            elif t in _STRING_TYPES:
                if "value_length" in fams and stats[f"lmin__{c}"] is not None:
                    lf = float(params.get("length_factor", 2.0))
                    suite.add(
                        "expect_column_value_lengths_to_be_between", column=c,
                        min_value=0,
                        max_value=int(int(stats[f"lmax__{c}"]) * lf),
                    )
                cat = int(params.get("categorical_threshold", 50))
                if "in_set" in fams and 0 < nd <= cat:
                    values = [
                        r[c]
                        for r in df.where(F.col(c).isNotNull())
                        .select(c).distinct()
                        .limit(min(cat * 2, VALUE_COUNTS_MAX_GROUPS))
                        .collect()
                    ]
                    suite.add(
                        "expect_column_values_to_be_in_set",
                        column=c, value_set=sorted(values),
                    )
            elif t in _VECTOR_TYPES and "vector" in fams:
                # same emission as profile_suite's vector branch, from
                # the shared stats pass
                vlmin, vlmax = stats[f"vlmin__{c}"], stats[f"vlmax__{c}"]
                if vlmin is not None and vlmin == vlmax:
                    suite.add(
                        "expect_column_vector_lengths_to_equal",
                        column=c, value=int(vlmin),
                    )
                nmin, nmax = stats[f"vnmin__{c}"], stats[f"vnmax__{c}"]
                if nmin is not None and nmax is not None:
                    npad = max(
                        (float(nmax) - float(nmin)) * slack,
                        abs(float(nmax)) * slack / 2,
                        1e-6,
                    )
                    suite.add(
                        "expect_column_vector_norms_to_be_between",
                        column=c,
                        min_value=round(max(0.0, float(nmin) - npad), 6),
                        max_value=round(float(nmax) + npad, 6),
                    )
        diagnostics[str(rule.get("name", f"rule_{ri}"))] = {
            "columns": cols,
            "families": list(fams),
            "expectations_emitted": len(suite.expectations) - n_before,
        }
    suite.meta["rule_diagnostics"] = diagnostics
    return suite


# ---------------------------------------------------------------------------
# Multi-batch profiling (reference: rule_based_profiler/parameter_builder/
# numeric_metric_range_multi_batch_parameter_builder.py — per-batch metric
# samples -> range estimator at a false_positive_rate;
# value_set_multi_batch_parameter_builder.py — union of per-batch sets)
# ---------------------------------------------------------------------------

ESTIMATORS = ("exact", "quantiles", "bootstrap", "kde")


def _range_estimate(
    vals: list[float],
    estimator: str,
    false_positive_rate: float,
    n_resamples: int,
    seed: int,
) -> tuple[float, float]:
    """Bounds for a numeric metric from its per-batch sample, per the
    reference's estimator taxonomy. ``exact`` = observed min/max;
    ``quantiles`` = empirical [fpr/2, 1-fpr/2] quantiles; ``bootstrap`` =
    mean of those quantiles over resamples (deterministic seed);
    ``kde`` = gaussian-smoothed resampling (Scott's-rule bandwidth).
    The sample is ONE value per batch — tiny — so estimation is plain
    driver-side numpy; the distributed work happened in the single
    grouped-stats pass."""
    import numpy as np

    a = np.asarray(vals, dtype=np.float64)
    if estimator == "exact" or len(a) < 2:
        return float(a.min()), float(a.max())
    qs = [false_positive_rate / 2, 1 - false_positive_rate / 2]
    if estimator == "quantiles":
        lo, hi = np.quantile(a, qs)
        return float(lo), float(hi)
    rng = np.random.RandomState(seed)
    if estimator == "bootstrap":
        idx = rng.randint(0, len(a), size=(n_resamples, len(a)))
        los, his = np.quantile(a[idx], qs, axis=1)
        return float(los.mean()), float(his.mean())
    if estimator == "kde":
        bw = a.std(ddof=1) * len(a) ** (-1 / 5) or 1e-9  # Scott's rule
        samples = rng.choice(a, size=n_resamples) + rng.normal(
            0, bw, size=n_resamples
        )
        lo, hi = np.quantile(samples, qs)
        return float(lo), float(hi)
    raise ValueError(
        f"unknown estimator {estimator!r}; known: {list(ESTIMATORS)}"
    )


def profile_suite_multibatch(
    batches: list[DataFrame] | DataFrame,
    batch_col: str | None = None,
    name: str = "profiled_multibatch",
    estimator: str = "bootstrap",
    false_positive_rate: float = 0.05,
    n_resamples: int = 999,
    random_seed: int = 0,
    categorical_threshold: int = 50,
) -> ExpectationSuite:
    """Suite whose numeric bounds are ESTIMATED FROM BATCH-TO-BATCH
    VARIATION, not a single batch's observed range — the reference's
    NumericMetricRangeMultiBatchParameterBuilder semantics: compute each
    metric once per batch, treat the per-batch values as a sample, and set
    [lower, upper] at the configured ``false_positive_rate`` with the
    chosen ``estimator`` (exact | quantiles | bootstrap | kde).

    Spark-native execution: the reference resolves every (metric, batch)
    pair as its own request against its own batch; here the batches are
    tagged and unioned (or an existing ``batch_col`` — e.g. an ingest-date
    partition column — is used directly) and ALL per-batch statistics for
    ALL columns come from ONE grouped aggregation. B batches x M metrics =
    one shuffle of B rows per group, not B x M jobs.

    Emitted families: table row_count range; per numeric column min/max
    (bounds for expect_column_values_to_be_between from the batch minima /
    maxima samples) and mean range; per low-cardinality string column the
    UNION of per-batch value sets (ValueSetMultiBatchParameterBuilder).
    """
    if isinstance(batches, DataFrame):
        if batch_col is None:
            raise ValueError(
                "pass batch_col with a single DataFrame, or a list of "
                "per-batch DataFrames"
            )
        tagged = batches.withColumnRenamed(batch_col, "__batch")
    else:
        if len(batches) < 1:
            raise ValueError("need at least one batch")
        tagged = batches[0].select(F.lit(0).alias("__batch"), "*")
        for i, b in enumerate(batches[1:], start=1):
            tagged = tagged.unionByName(
                b.select(F.lit(i).alias("__batch"), "*")
            )

    dtypes = {c: t for c, t in tagged.dtypes if c != "__batch"}
    aggs: list = [F.count(F.lit(1)).alias("__n")]
    numeric = [c for c, t in dtypes.items() if _is_numeric(t)]
    strings = [c for c, t in dtypes.items() if t in _STRING_TYPES]
    for c in numeric:
        col = F.col(c)
        aggs += [
            F.min(col).alias(f"min__{c}"),
            F.max(col).alias(f"max__{c}"),
            F.mean(col).alias(f"mean__{c}"),
        ]
    for c in strings:
        # slice caps what ships to the driver; approx_count_distinct (same
        # agg, no extra pass) tells us whether the slice truncated — a
        # truncated set means the column is not categorical, so the in_set
        # family is dropped rather than emitted too-narrow. (The agg buffer
        # itself still holds each batch's set executor-side: profile
        # sampled batches for very-high-cardinality string columns.)
        aggs += [
            F.slice(
                F.array_sort(F.collect_set(c)), 1, categorical_threshold + 1
            ).alias(f"set__{c}"),
            F.approx_count_distinct(c).alias(f"nd__{c}"),
        ]
    rows = tagged.groupBy("__batch").agg(*aggs).collect()
    if not rows:
        suite = ExpectationSuite(name)
        suite.add("expect_table_row_count_to_be_between", min_value=0)
        return suite

    def est(vals):
        return _range_estimate(
            vals, estimator, false_positive_rate, n_resamples, random_seed
        )

    suite = ExpectationSuite(name)
    n_lo, n_hi = est([r["__n"] for r in rows])
    suite.add(
        "expect_table_row_count_to_be_between",
        min_value=max(0, int(n_lo)), max_value=int(n_hi) or 1,
    )
    for c in numeric:
        mins = [r[f"min__{c}"] for r in rows if r[f"min__{c}"] is not None]
        maxs = [r[f"max__{c}"] for r in rows if r[f"max__{c}"] is not None]
        means = [r[f"mean__{c}"] for r in rows if r[f"mean__{c}"] is not None]
        if not mins:
            continue
        lo, _ = est([float(v) for v in mins])
        _, hi = est([float(v) for v in maxs])
        suite.add(
            "expect_column_values_to_be_between", column=c,
            min_value=lo, max_value=hi,
        )
        m_lo, m_hi = est([float(v) for v in means])
        if m_lo == m_hi:  # zero batch-to-batch variance: keep a real band
            pad = max(abs(m_lo) * 1e-6, 1e-9)
            m_lo, m_hi = m_lo - pad, m_hi + pad
        suite.add(
            "expect_column_mean_to_be_between", column=c,
            min_value=m_lo, max_value=m_hi,
        )
    for c in strings:
        if any(int(r[f"nd__{c}"] or 0) > categorical_threshold for r in rows):
            continue  # some batch's set was truncated: not categorical
        union: set = set()
        for r in rows:
            union.update(r[f"set__{c}"] or [])
        if 0 < len(union) <= categorical_threshold:
            suite.add(
                "expect_column_values_to_be_in_set",
                column=c, value_set=sorted(union),
            )
    return suite


# ---------------------------------------------------------------------------
# Pattern inference (reference: rule_based_profiler/parameter_builder/
# regex_pattern_string_parameter_builder.py — candidate regexes scored by
# match rate; simple_date_format_string_parameter_builder.py — candidate
# strftime formats scored by parse rate). Both run ALL candidates for ALL
# requested columns in ONE fused aggregation; the reference resolves one
# metric per (candidate, column).
# ---------------------------------------------------------------------------

#: universal string shapes, Java-regex ∩ RE2 subset (no backrefs or
#: lookaround) so DuckDB oracles can run them verbatim. ORDERED
#: most-specific-first: ties at equal match rate resolve to the earliest
#: entry, so a column matching both "alphabetic" and the looser "slug"
#: reports the tighter pattern.
DEFAULT_CANDIDATE_REGEXES = (
    r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$",  # UUID
    r"^(25[0-5]|2[0-4]\d|[01]?\d?\d)(\.(25[0-5]|2[0-4]\d|[01]?\d?\d)){3}$",  # IPv4
    r"^\d{4}-\d{2}-\d{2}$",                    # ISO date shape
    r"^https?://\S+$",                         # URL
    r"^\S+@\S+\.\S+$",                         # email-ish
    r"^\d+$",                                  # digits only
    r"^-?\d+$",                                # signed integer
    r"^-?\d+(\.\d+)?$",                        # decimal
    r"^[0-9a-fA-F]+$",                         # hex
    r"^[A-Za-z][A-Za-z0-9]*\d+$",              # word+number code (src7)
    r"^[A-Za-z]+$",                            # alphabetic
    r"^[A-Za-z0-9_]+$",                        # identifier
    r"^[A-Za-z0-9_-]+$",                       # slug
)

#: strftime candidates restricted to directives the engine's JVM-side
#: translation supports (conditions.strftime_to_spark_patterns)
DEFAULT_CANDIDATE_DATE_FORMATS = (
    "%Y-%m-%d",
    "%Y/%m/%d",
    "%d-%m-%Y",
    "%d/%m/%Y",
    "%m/%d/%Y",
    "%Y%m%d",
    "%Y-%m-%d %H:%M:%S",
    "%Y-%m-%d %H:%M:%S.%f",
    "%Y-%m-%dT%H:%M:%S",
    "%Y/%m/%d %H:%M:%S",
    "%m/%d/%Y %H:%M:%S",
    "%H:%M:%S",
)


def _best(rates: dict[str, float], threshold: float) -> str | None:
    """Deterministic winner: highest rate above threshold; ties resolve
    to the EARLIEST candidate (``rates`` preserves candidate order, and
    candidate lists are ordered most-specific-first)."""
    ok = [
        (r, i, p)
        for i, (p, r) in enumerate(rates.items())
        if r >= threshold
    ]
    if not ok:
        return None
    ok.sort(key=lambda t: (-t[0], t[1]))
    return ok[0][2]


def infer_regex_patterns(
    df: DataFrame,
    columns: list[str] | str,
    candidates: tuple[str, ...] | None = None,
    threshold: float = 1.0,
) -> dict[str, dict[str, Any]]:
    """Per column: {"rates": {pattern: nonnull match rate}, "best":
    winning pattern or None}. One df.agg for every (column, candidate)
    pair — C columns x K candidates = C*K sum(when(rlike)) expressions in
    a single whole-stage-codegen pass, zero Python in the loop."""
    cols = [columns] if isinstance(columns, str) else list(columns)
    cands = list(candidates or DEFAULT_CANDIDATE_REGEXES)
    aggs: list = []
    for c in cols:
        col = F.col(c)
        aggs.append(F.count(col).alias(f"nn__{c}"))
        aggs += [
            F.sum(F.when(col.rlike(p), 1).otherwise(0)).alias(f"m__{c}__{i}")
            for i, p in enumerate(cands)
        ]
    row = df.agg(*aggs).collect()[0]
    out: dict[str, dict[str, Any]] = {}
    for c in cols:
        nn = int(row[f"nn__{c}"] or 0)
        counts = {
            p: int(row[f"m__{c}__{i}"] or 0) for i, p in enumerate(cands)
        }
        rates = {p: (m / nn if nn else 0.0) for p, m in counts.items()}
        out[c] = {
            "rates": rates,
            "counts": counts,
            "nonnull": nn,
            "best": _best(rates, threshold),
        }
    return out


def infer_datetime_formats(
    df: DataFrame,
    columns: list[str] | str,
    candidates: tuple[str, ...] | None = None,
    threshold: float = 1.0,
) -> dict[str, dict[str, Any]]:
    """Per column: parse rate for each candidate strftime format via the
    SAME JVM try_to_timestamp expression the match_strftime_format
    expectation compiles to — so an inferred format is green by
    construction when re-validated. Candidates whose directives the
    translation does not support are skipped. One fused agg."""
    from .conditions import strftime_to_spark_patterns

    cols = [columns] if isinstance(columns, str) else list(columns)
    cands = []
    for fmt in candidates or DEFAULT_CANDIDATE_DATE_FORMATS:
        try:
            cands.append((fmt, strftime_to_spark_patterns(fmt)))
        except ValueError:
            continue
    aggs: list = []
    for c in cols:
        col = F.col(c)
        aggs.append(F.count(col).alias(f"nn__{c}"))
        for i, (_fmt, pats) in enumerate(cands):
            probe = F.coalesce(
                *[F.try_to_timestamp(col, F.lit(p)) for p in pats]
            ) if len(pats) > 1 else F.try_to_timestamp(col, F.lit(pats[0]))
            aggs.append(
                F.sum(
                    F.when(probe.isNotNull(), 1).otherwise(0)
                ).alias(f"m__{c}__{i}")
            )
    row = df.agg(*aggs).collect()[0]
    out: dict[str, dict[str, Any]] = {}
    for c in cols:
        nn = int(row[f"nn__{c}"] or 0)
        counts = {
            fmt: int(row[f"m__{c}__{i}"] or 0)
            for i, (fmt, _p) in enumerate(cands)
        }
        rates = {fmt: (m / nn if nn else 0.0) for fmt, m in counts.items()}
        out[c] = {
            "rates": rates,
            "counts": counts,
            "nonnull": nn,
            "best": _best(rates, threshold),
        }
    return out
