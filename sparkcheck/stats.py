"""Statistical-test expectations, Spark-native.

The reference implements these Pandas-only (scipy on a collected column):
  - chisquare test  (expect_column_chisquare_test_p_value_to_be_greater_than,
    reference expectations/core/...chisquare...py — @column_aggregate_value
    engine=PandasExecutionEngine)
  - KS tests (column_bootstrapped_ks_test_p_value.py:22-25,
    column_parameterized_distribution_ks_test_p_value.py:21-24)
  - Cramér's φ (expect_column_pair_cramers_phi_value_to_be_less_than.py:42)

Ours computes the *sufficient statistics* distributed (value counts /
crosstab via groupBy with map-side combine, ECDF via the mergeable
percentile sketch) and evaluates the test math driver-side with
numpy/math — no scipy dependency:
  - regularized incomplete gamma (series + continued fraction, the
    standard gammp/gammq construction) for the chi-square p-value;
  - the asymptotic Kolmogorov distribution Q(λ) = 2 Σ (-1)^{k-1} e^{-2k²λ²}
    for the KS p-value;
  - Φ via math.erf for the normal CDF.

Scale notes: chi-square/Cramér's φ collect only the contingency table
(low-cardinality by construction — same assumption the reference makes);
the KS statistic uses a g-point quantile grid from percentile_approx, so
its cost is one fused agg regardless of row count, with D accurate to
O(1/g + sketch error).
"""

from __future__ import annotations

import math
from typing import Any

import numpy as np
from pyspark.sql import functions as F

from .expectations import (
    Expectation,
    build_domain,
    register_expectation,
    validate_value_between,
)
from .metrics import (
    Domain,
    MetricConfiguration,
    eager_metric,
    freeze_kwargs,
)

# ---------------------------------------------------------------------------
# Driver-side special functions (no scipy)
# ---------------------------------------------------------------------------


def _gammp(a: float, x: float) -> float:
    """Regularized lower incomplete gamma P(a, x)."""
    if x < 0 or a <= 0:
        raise ValueError("bad args to gammp")
    if x == 0:
        return 0.0
    if x < a + 1.0:
        # series expansion
        ap, summ, delta = a, 1.0 / a, 1.0 / a
        for _ in range(500):
            ap += 1.0
            delta *= x / ap
            summ += delta
            if abs(delta) < abs(summ) * 1e-15:
                break
        return summ * math.exp(-x + a * math.log(x) - math.lgamma(a))
    # continued fraction for Q(a,x), Lentz's algorithm
    tiny = 1e-300
    b = x + 1.0 - a
    c = 1.0 / tiny
    d = 1.0 / b
    h = d
    for i in range(1, 500):
        an = -i * (i - a)
        b += 2.0
        d = an * d + b
        d = tiny if abs(d) < tiny else d
        c = b + an / c
        c = tiny if abs(c) < tiny else c
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < 1e-15:
            break
    q = math.exp(-x + a * math.log(x) - math.lgamma(a)) * h
    return 1.0 - q


def chi2_sf(x: float, df: int) -> float:
    """Chi-square survival function (p-value) = 1 - P(df/2, x/2)."""
    if math.isinf(x):
        return 0.0  # an expected-zero cell with observed mass: certain reject
    return max(0.0, min(1.0, 1.0 - _gammp(df / 2.0, x / 2.0)))


def ks_p_value(d: float, n: float) -> float:
    """Asymptotic two-sided KS p-value (Kolmogorov distribution)."""
    if d <= 0:
        return 1.0
    lam = (math.sqrt(n) + 0.12 + 0.11 / math.sqrt(n)) * d
    s = 0.0
    for k in range(1, 101):
        term = 2.0 * (-1.0) ** (k - 1) * math.exp(-2.0 * k * k * lam * lam)
        s += term
        if abs(term) < 1e-12:
            break
    return max(0.0, min(1.0, s))


def norm_cdf(x: float, mean: float = 0.0, std: float = 1.0) -> float:
    return 0.5 * (1.0 + math.erf((x - mean) / (std * math.sqrt(2.0))))


def _betacf(a: float, b: float, x: float) -> float:
    """Continued fraction for the incomplete beta (Lentz's algorithm)."""
    tiny = 1e-300
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    d = tiny if abs(d) < tiny else d
    d = 1.0 / d
    h = d
    for m in range(1, 300):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        d = tiny if abs(d) < tiny else d
        c = 1.0 + aa / c
        c = tiny if abs(c) < tiny else c
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        d = tiny if abs(d) < tiny else d
        c = 1.0 + aa / c
        c = tiny if abs(c) < tiny else c
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < 1e-14:
            break
    return h


def betainc_reg(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    front = math.exp(
        math.lgamma(a + b) - math.lgamma(a) - math.lgamma(b)
        + a * math.log(x) + b * math.log(1.0 - x)
    )
    if x < (a + 1.0) / (a + b + 2.0):
        return front * _betacf(a, b, x) / a
    return 1.0 - front * _betacf(b, a, 1.0 - x) / b


# scipy-convention CDFs for the parameterized KS test (reference maps dict
# params to scipy positional args in dataset/util.py:365-401; we evaluate
# the same CDFs driver-side without scipy)
def distribution_cdf(distribution: str, params: Any):
    """Returns cdf(x) for the distribution with GE/scipy parameters.

    ``params`` may be a dict of named parameters or the scipy positional
    tuple (dataset/util.py _scipy_distribution_positional_args_from_dict)."""

    def pick(names: list[str], defaults: dict[str, float]) -> list[float]:
        if isinstance(params, dict):
            out = []
            for nm in names:
                if nm in ("loc", "scale"):
                    out.append(float(params.get(nm, defaults.get(nm, 0.0))))
                else:
                    out.append(float(params[nm]))
            return out
        vals = list(params)
        out = []
        for i, nm in enumerate(names):
            out.append(float(vals[i]) if i < len(vals) else defaults.get(nm, 0.0))
        return out

    if distribution == "norm":
        if isinstance(params, dict) and "std_dev" not in params and "std" in params:
            params = dict(params, std_dev=params["std"])
        mean, std = pick(["mean", "std_dev"], {"mean": 0.0, "std_dev": 1.0})
        return lambda x: norm_cdf(x, mean, std)
    if distribution == "uniform":
        # scipy uniform(loc=min, scale=max): support [min, min+max]
        lo, width = pick(["min", "max"], {"max": 1.0})
        return lambda x: min(1.0, max(0.0, (x - lo) / width))
    if distribution == "expon":
        loc, scale = pick(["loc", "scale"], {"loc": 0.0, "scale": 1.0})
        return lambda x: 0.0 if x < loc else 1.0 - math.exp(-(x - loc) / scale)
    if distribution == "gamma":
        a, loc, scale = pick(["alpha", "loc", "scale"], {"loc": 0.0, "scale": 1.0})
        return lambda x: 0.0 if x <= loc else _gammp(a, (x - loc) / scale)
    if distribution == "chi2":
        df, loc, scale = pick(["df", "loc", "scale"], {"loc": 0.0, "scale": 1.0})
        return lambda x: 0.0 if x <= loc else _gammp(df / 2.0, (x - loc) / (2.0 * scale))
    if distribution == "beta":
        a, b, loc, scale = pick(
            ["alpha", "beta", "loc", "scale"], {"loc": 0.0, "scale": 1.0}
        )
        return lambda x: betainc_reg(a, b, min(1.0, max(0.0, (x - loc) / scale)))
    raise AttributeError(f"Unsupported  distribution provided: {distribution}")


# ---------------------------------------------------------------------------
# Distributed sufficient statistics
# ---------------------------------------------------------------------------


# collect() ceiling for contingency tables — same hazard (and same guard
# pattern) as metrics.VALUE_COUNTS_MAX_GROUPS: a high-cardinality pair must
# error cleanly, not OOM the driver. Raise via kwargs max_groups if needed.
CROSSTAB_MAX_GROUPS = 100_000


@eager_metric("column_pair.crosstab")
def _crosstab(resolver, ddf, cfg: MetricConfiguration, _):
    """Contingency counts [(a, b, n)] INCLUDING null keys — one groupBy with
    map-side combine; collected because tests assume low cardinality (as the
    reference does; nulls survive so Cramér's φ can bin them as
    "(missing)", pandas_dataset.py get_binned_values). The ``max_groups``
    cap is ENFORCED: fetching max_groups+1 rows costs nothing extra and
    turns a driver OOM into a clean error."""
    a, b = cfg.domain.column_a, cfg.domain.column_b
    max_groups = int(cfg.kw("max_groups", CROSSTAB_MAX_GROUPS))
    rows = (
        ddf.groupBy(a, b)
        .agg(F.count(F.lit(1)).alias("n"))
        .limit(max_groups + 1)
        .collect()
    )
    if len(rows) > max_groups:
        raise ValueError(
            f"column_pair.crosstab on ({a!r}, {b!r}) exceeds "
            f"max_groups={max_groups} distinct pairs; this metric collects "
            "the full contingency table to the driver and is only meant for "
            "low-cardinality pairs — pre-bin the columns or raise "
            "max_groups explicitly if this is intentional"
        )
    return [(r[a], r[b], r["n"]) for r in rows]


def _chi2_from_crosstab(cells: list[tuple]) -> tuple[float, int, float]:
    """(chi2, dof, n) from contingency cells via numpy on the small table.

    2x2 tables take scipy chi2_contingency's default Yates continuity
    correction (observed nudged 0.5 toward expected), since the reference
    calls chi2_contingency with correction=True (dataset.py:4417)."""
    avals = sorted({c[0] for c in cells}, key=str)
    bvals = sorted({c[1] for c in cells}, key=str)
    obs = np.zeros((len(avals), len(bvals)))
    ai = {v: i for i, v in enumerate(avals)}
    bi = {v: i for i, v in enumerate(bvals)}
    for a, b, n in cells:
        obs[ai[a], bi[b]] = n
    n = obs.sum()
    exp = np.outer(obs.sum(axis=1), obs.sum(axis=0)) / n
    if obs.shape == (2, 2):
        obs = obs + 0.5 * np.sign(exp - obs)
    with np.errstate(divide="ignore", invalid="ignore"):
        terms = np.where(exp > 0, (obs - exp) ** 2 / exp, 0.0)
    chi2 = float(terms.sum())
    dof = (len(avals) - 1) * (len(bvals) - 1)
    return chi2, dof, float(n)


_NUMERIC_DTYPES = {
    "tinyint", "smallint", "int", "bigint", "float", "double",
}


def _binned_value_map(
    values_counts: list[tuple[Any, int]],
    bins: Any,
    n_bins: int | None,
    numeric: bool,
) -> dict[Any, str | Any]:
    """Per-distinct-value binning map replicating the reference's
    get_binned_values (pandas_dataset.py:573-620) without materializing the
    column: numeric columns bin into equal-width histogram_bin_edges (or the
    provided edges extended to min/max), string columns keep the top-n_bins
    values (ties broken by value) and fold the rest into "(other)";
    nulls become "(missing)"."""
    if n_bins is None:
        n_bins = 10
    def _isnull(v: Any) -> bool:
        return v is None or (isinstance(v, float) and math.isnan(v))

    nonnull = [(v, c) for v, c in values_counts if not _isnull(v)]
    has_null = any(_isnull(v) for v, _ in values_counts)
    if numeric and not nonnull:
        # an entirely-null side would hit numpy's opaque "zero-size array"
        # in min()/histogram_bin_edges — everything maps to "(missing)"
        return {"__missing__": "(missing)"} if has_null else {}
    if numeric:
        vals = np.asarray([float(v) for v, _ in nonnull])
        if bins is not None:
            edges = sorted(np.unique([float(b) for b in bins]))
            if vals.min() < edges[0]:
                edges = [float(vals.min())] + edges
            if vals.max() > edges[-1]:
                edges = edges + [float(vals.max())]
            edges = np.asarray(edges)
        else:
            edges = np.histogram_bin_edges(vals, bins=n_bins)
        edges = edges.astype(float)
        edges[-1] = np.nextafter(edges[-1], edges[-1] + 1)
        precision = int(np.log10(min(edges[1:] - edges[:-1]))) + 2
        labels = [
            f"[{round(lo, precision)}, {round(hi, precision)})"
            for lo, hi in zip(edges[:-1], edges[1:])
        ]
        codes = np.digitize(vals, bins=edges) - 1
        out: dict[Any, Any] = {
            v: labels[min(max(int(c), 0), len(labels) - 1)]
            for (v, _), c in zip(nonnull, codes)
        }
    elif bins is not None:
        out = {}
        for group in bins:
            label = ", ".join(group)
            for v in group:
                out[v] = label
        for v, _ in nonnull:
            out.setdefault(v, v)
    elif len(nonnull) < n_bins + 1:
        out = {v: v for v, _ in nonnull}
    else:
        ranked = sorted(nonnull, key=lambda vc: (-vc[1], str(vc[0])))
        keep = {v for v, _ in ranked[:n_bins]}
        out = {v: (v if v in keep else "(other)") for v, _ in nonnull}
    if has_null:
        out["__missing__"] = "(missing)"
    return out


def _bin_lookup(mapping: dict[Any, Any], v: Any) -> Any:
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return mapping["__missing__"]
    return mapping[v]


# ---------------------------------------------------------------------------
# Expectations
# ---------------------------------------------------------------------------


class CramersPhiExpectation(Expectation):
    """expect_column_pair_cramers_phi_value_to_be_less_than(column_A,
    column_B, threshold). φ_c = sqrt(χ² / (n·(min(r,c)−1)))."""

    name = "expect_column_pair_cramers_phi_value_to_be_less_than"

    def _metric_cfg(self, cfg) -> MetricConfiguration:
        # NO ignore_row_if pair default here: the reference crosstabs the
        # raw columns and bins nulls as "(missing)" (dataset.py:4415)
        d = build_domain(cfg)
        vk = ()
        if cfg.get("max_groups") is not None:
            vk = freeze_kwargs(max_groups=int(cfg.get("max_groups")))
        return MetricConfiguration(
            "column_pair.crosstab",
            Domain(row_condition=d.row_condition,
                   column_a=d.column_a, column_b=d.column_b),
            vk,
        )

    def _rc_cfg(self, cfg) -> MetricConfiguration:
        return MetricConfiguration("table.row_count", Domain())

    def metric_requests(self, cfg, rf):
        return {"crosstab": self._metric_cfg(cfg), "rc": self._rc_cfg(cfg)}

    def validate(self, cfg, rf, resolver):
        cells = resolver[self._metric_cfg(cfg)]
        row_count = int(resolver[self._rc_cfg(cfg)] or 0)
        if not cells:
            return {"success": True, "result": {"observed_value": None}}
        # bin each side per the reference's get_binned_values
        # (pandas_dataset.py:558-620), driver-side over the DISTINCT values
        # only — counts aggregate through the binning map, so the raw column
        # never leaves the cluster
        dt = resolver.dtypes
        num_a = dt.get(cfg.get("column_A")) in _NUMERIC_DTYPES
        num_b = dt.get(cfg.get("column_B")) in _NUMERIC_DTYPES
        a_counts: dict[Any, int] = {}
        b_counts: dict[Any, int] = {}
        for a, b, n in cells:
            a_counts[a] = a_counts.get(a, 0) + n
            b_counts[b] = b_counts.get(b, 0) + n
        amap = _binned_value_map(
            list(a_counts.items()), cfg.get("bins_A"), cfg.get("n_bins_A"), num_a
        )
        bmap = _binned_value_map(
            list(b_counts.items()), cfg.get("bins_B"), cfg.get("n_bins_B"), num_b
        )
        binned: dict[tuple, int] = {}
        for a, b, n in cells:
            key = (_bin_lookup(amap, a), _bin_lookup(bmap, b))
            binned[key] = binned.get(key, 0) + n
        bcells = [(a, b, n) for (a, b), n in binned.items()]
        chi2, dof, n = _chi2_from_crosstab(bcells)
        r = len({c[0] for c in bcells})
        c = len({c[1] for c in bcells})
        # reference dataset.py:4417-4424: V = sqrt(chi2 / table_row_count /
        # (min(shape)-1)) clipped to [0, 1]; success is <= threshold
        denom = row_count * (min(r, c) - 1)
        phi = min(max(math.sqrt(chi2 / denom), 0.0), 1.0) if denom > 0 else 0.0
        threshold = float(cfg.get("threshold", 0.1))
        ret: dict[str, Any] = {"success": phi <= threshold}
        if rf["result_format"] != "BOOLEAN_ONLY":
            ret["result"] = {
                "observed_value": phi,
                "details": {"chi2": chi2, "dof": dof, "n": n,
                            "crosstab": sorted(bcells, key=str)},
            }
        return ret


class ChisquareTestExpectation(Expectation):
    """expect_column_chisquare_test_p_value_to_be_greater_than(column,
    partition_object={values, weights}, p=0.05). Goodness-of-fit of the
    observed categorical distribution against expected weights; counts come
    from the distributed value_counts metric."""

    name = "expect_column_chisquare_test_p_value_to_be_greater_than"

    def _vc_cfg(self, cfg) -> MetricConfiguration:
        return MetricConfiguration(
            "column.value_counts", build_domain(cfg), freeze_kwargs(sort="value")
        )

    def _nn_cfg(self, cfg) -> MetricConfiguration:
        return MetricConfiguration("column.nonnull_count", build_domain(cfg))

    def metric_requests(self, cfg, rf):
        return {"vc": self._vc_cfg(cfg), "nn": self._nn_cfg(cfg)}

    def validate(self, cfg, rf, resolver):
        # reference dataset.py:3778-3830: union-align observed counts with
        # the partition, expected = weights * nonnull_count; observed-only
        # values take the tail_weight_holdout (default 0 -> expected 0 ->
        # chi2 = inf -> p = 0); raises on a non-categorical partition.
        po = cfg.get("partition_object") or {}
        if "values" not in po or "weights" not in po \
                or len(po["values"]) != len(po["weights"]) \
                or abs(sum(po["weights"]) - 1.0) > 1e-6:
            raise ValueError("Invalid partition object.")
        vc = dict(resolver[self._vc_cfg(cfg)])
        element_count = int(resolver[self._nn_cfg(cfg)] or 0)
        holdout = float(cfg.get("tail_weight_holdout", 0) or 0)
        expected = {v: w * element_count for v, w in zip(po["values"], po["weights"])}
        union = sorted(set(expected) | set(vc), key=str)
        novel = [v for v in union if v not in expected]
        if novel:
            expected = {v: e * (1 - holdout) for v, e in expected.items()}
            for v in novel:
                expected[v] = element_count * holdout / len(novel)
        obs = np.asarray([float(vc.get(v, 0)) for v in union])
        exp = np.asarray([expected[v] for v in union])
        with np.errstate(divide="ignore", invalid="ignore"):
            terms = np.where(
                exp > 0, (obs - exp) ** 2 / exp,
                np.where(obs > 0, np.inf, 0.0),
            )
        chi2 = float(terms.sum())
        dof = max(len(union) - 1, 1)
        p_value = chi2_sf(chi2, dof)
        threshold = float(cfg.get("p", 0.05))
        ret: dict[str, Any] = {"success": p_value > threshold}
        if rf["result_format"] != "BOOLEAN_ONLY":
            exp_sum, obs_sum = float(exp.sum()), float(obs.sum())
            ret["result"] = {
                "observed_value": p_value,
                "element_count": element_count,
                "missing_count": None,
                "missing_percent": None,
                "details": {
                    "observed_partition": {
                        "values": union,
                        "weights": (obs / obs_sum).tolist() if obs_sum else obs.tolist(),
                    },
                    "expected_partition": {
                        "values": union,
                        "weights": (exp / exp_sum).tolist() if exp_sum else exp.tolist(),
                    },
                },
            }
        return ret


class KsTestExpectation(Expectation):
    """expect_column_parameterized_distribution_ks_test_p_value_to_be_greater_than
    (column, distribution='norm'|'uniform', params={...}, p=0.05,
    grid_points=200).

    KS statistic from a quantile-sketch grid: D ≈ max_i |i/g − CDF(q_i)|
    where q_i are percentile_approx(col, i/g) — ONE mergeable-sketch agg
    regardless of row count (the 10^12-row path; the reference collects the
    whole column into scipy.stats.kstest)."""

    name = (
        "expect_column_parameterized_distribution_ks_test_p_value_to_be_greater_than"
    )

    def _reqs(self, cfg) -> dict[str, MetricConfiguration]:
        g = int(cfg.get("grid_points", 200))
        qs = tuple((i + 0.5) / g for i in range(g))
        domain = build_domain(cfg)
        return {
            "quantiles": MetricConfiguration(
                "column.quantile_values", domain,
                freeze_kwargs(quantiles=qs, exact=bool(cfg.get("exact", False)),
                              accuracy=int(cfg.get("accuracy", 10000))),
            ),
            "nonnull": MetricConfiguration("column.nonnull_count", domain),
        }

    def metric_requests(self, cfg, rf):
        return self._reqs(cfg)

    def validate(self, cfg, rf, resolver):
        reqs = self._reqs(cfg)
        grid = list(resolver[reqs["quantiles"]] or [])
        n = int(resolver[reqs["nonnull"]] or 0)
        dist = cfg.get("distribution", "norm")
        cdf = distribution_cdf(dist, cfg.get("params") or {})
        g = len(grid)
        d = max(
            (abs((i + 0.5) / g - cdf(q)) for i, q in enumerate(grid) if q is not None),
            default=0.0,
        )
        p_value = ks_p_value(d, n) if n else 1.0
        # reference signature names the threshold p_value
        # (expect_column_parameterized_distribution_ks...py kwarg)
        threshold = float(cfg.get("p_value", cfg.get("p", 0.05)))
        ret: dict[str, Any] = {"success": p_value > threshold}
        if rf["result_format"] != "BOOLEAN_ONLY":
            ret["result"] = {"observed_value": p_value,
                             "details": {"ks_statistic": d, "n": n}}
        return ret


class BootstrappedKsTestExpectation(Expectation):
    """expect_column_bootstrapped_ks_test_p_value_to_be_greater_than
    (column, partition_object={bins, weights}, p=0.05,
    bootstrap_samples=1000, bootstrap_sample_size=2*len(weights)).

    Reference (Pandas-only): column_bootstrapped_ks_test_p_value.py:22-25 —
    repeatedly np.random.choice-samples the RAW column and runs
    scipy.stats.kstest against the partition's interpolated CDF;
    test_result = (1 + #(p_i >= p)) / (n_samples + 1).

    Spark-native adaptation: the raw column never leaves the cluster — the
    empirical distribution is compressed into a percentile_approx quantile
    grid (ONE mergeable-sketch agg at any row count) and bootstrap samples
    are drawn driver-side by inverse-CDF interpolation over that grid, with
    a fixed seed for reproducibility. The KS statistic and the asymptotic
    Kolmogorov p-value are computed with the same driver math as
    KsTestExpectation (no scipy)."""

    name = "expect_column_bootstrapped_ks_test_p_value_to_be_greater_than"

    @staticmethod
    def _partition(cfg) -> tuple[list[float], list[float]]:
        """Validate the continuous partition with the reference's checks and
        messages (pandas_dataset.py expect_column_bootstrapped_ks...:
        is_valid_continuous_partition_object + finite-endpoint +
        tail-weight guards)."""
        po = cfg.get("partition_object") or {}
        bins = list(po.get("bins", ()))
        weights = list(po.get("weights", ()))
        comb = list(po.get("tail_weights", ())) + weights
        if (
            not bins
            or not weights
            or len(bins) != len(weights) + 1
            or ("tail_weights" in po and len(po["tail_weights"]) != 2)
            or abs(sum(comb) - 1.0) > 1e-6
        ):
            raise ValueError("Invalid continuous partition object.")
        if math.isinf(bins[0]) or math.isinf(bins[-1]):
            raise ValueError("Partition endpoints must be finite.")
        if sum(po.get("tail_weights", ())) > 0:
            raise ValueError(
                "Partition cannot have tail weights -- endpoints must be finite."
            )
        return [float(b) for b in bins], [float(w) for w in weights]

    def _reqs(self, cfg) -> dict[str, MetricConfiguration]:
        bins, _weights = self._partition(cfg)
        g = int(cfg.get("grid_points", 200))
        qs = tuple((i + 0.5) / g for i in range(g))
        domain = build_domain(cfg)
        return {
            "quantiles": MetricConfiguration(
                "column.quantile_values", domain,
                freeze_kwargs(quantiles=qs, exact=bool(cfg.get("exact", False)),
                              accuracy=int(cfg.get("accuracy", 10000))),
            ),
            "nonnull": MetricConfiguration("column.nonnull_count", domain),
            "hist": MetricConfiguration(
                "column.histogram", domain, freeze_kwargs(bins=tuple(bins))
            ),
            "min": MetricConfiguration("column.min", domain),
            "max": MetricConfiguration("column.max", domain),
        }

    def metric_requests(self, cfg, rf):
        return self._reqs(cfg)

    def validate(self, cfg, rf, resolver):
        bins, weights = self._partition(cfg)
        test_cdf = np.append([0.0], np.cumsum(np.asarray(weights)))

        reqs = self._reqs(cfg)
        grid = np.asarray(
            [q for q in (resolver[reqs["quantiles"]] or []) if q is not None],
            dtype=float,
        )
        n = int(resolver[reqs["nonnull"]] or 0)
        p = float(cfg.get("p", 0.05))
        n_samples = int(cfg.get("bootstrap_samples") or 1000)
        size = int(cfg.get("bootstrap_sample_size") or 2 * len(weights))
        if n == 0 or grid.size == 0:
            observed = 1.0
        else:
            g = grid.size
            positions = (np.arange(g) + 0.5) / g
            rng = np.random.default_rng(int(cfg.get("seed", 7)))
            hits = 0
            for _ in range(n_samples):
                xs = np.sort(np.interp(rng.random(size), positions, grid))
                fvals = np.interp(xs, bins, test_cdf)
                iarr = np.arange(size)
                d = max(
                    float(np.max(fvals - iarr / size)),
                    float(np.max((iarr + 1) / size - fvals)),
                )
                if ks_p_value(d, size) >= p:
                    hits += 1
            observed = (1 + hits) / (n_samples + 1)
        ret: dict[str, Any] = {"success": observed > p}
        if rf["result_format"] != "BOOLEAN_ONLY":
            # observed-partition detail block, reference-shaped
            # (pandas_dataset.py:1260-1310): provided bins extended to
            # min/max when data falls outside, weights = counts / n
            hist_arr = [int(x or 0) for x in (resolver[reqs["hist"]] or [])]
            below, hist, above = hist_arr[0], hist_arr[1:-1], hist_arr[-1]
            cmin, cmax = resolver[reqs["min"]], resolver[reqs["max"]]
            obs_bins, obs_counts = list(bins), list(hist)
            if below > 0:
                obs_bins = [float(cmin)] + obs_bins
                obs_counts = [below] + obs_counts
            if above > 0:
                obs_bins = obs_bins + [float(cmax)]
                obs_counts = obs_counts + [above]
            obs_weights = [c / n for c in obs_counts] if n else obs_counts
            obs_cdf = np.cumsum(obs_weights)
            ret["result"] = {
                "observed_value": observed,
                "details": {
                    "bootstrap_samples": n_samples,
                    "bootstrap_sample_size": size,
                    "observed_partition": {
                        "bins": obs_bins, "weights": obs_weights,
                    },
                    "expected_partition": {"bins": bins, "weights": weights},
                    "observed_cdf": {
                        "x": obs_bins,
                        "cdf_values": [0] + obs_cdf.tolist(),
                    },
                    "expected_cdf": {"x": bins, "cdf_values": test_cdf.tolist()},
                },
            }
        return ret


register_expectation(CramersPhiExpectation())
register_expectation(ChisquareTestExpectation())
register_expectation(KsTestExpectation())
register_expectation(BootstrappedKsTestExpectation())


# ---------------------------------------------------------------------------
# Correlation profiling (extension — the reference has no correlation
# expectation; this is profiler surface a training-data pipeline needs)
# ---------------------------------------------------------------------------


def correlation_profile(df, cols: list[str]):
    """All-pairs Pearson correlation over ``cols`` in ONE fused aggregation
    pass: every ``F.corr(a, b)`` (plus the pairwise-complete counts) lands in
    a single ``df.agg`` so Catalyst plans exactly one HashAggregate with
    map-side partial merge — k(k-1)/2 co-moment accumulators stream over the
    data once, no matter how many pairs.

    Returns a long-format DataFrame (col_a, col_b, n_pairs, pearson_r) with
    one row per unordered pair, r rounded to 6 dp for cross-engine
    comparability. ``n_pairs`` counts rows where BOTH sides are non-null —
    the same pairwise-complete semantics ``corr`` itself uses.
    """
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1:]]
    aggs = []
    for j, (a, b) in enumerate(pairs):
        aggs.append(F.corr(a, b).alias(f"__r_{j}"))
        aggs.append(
            F.count(F.when(F.col(a).isNotNull() & F.col(b).isNotNull(), 1))
            .alias(f"__n_{j}")
        )
    row = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(a).alias("col_a"),
            F.lit(b).alias("col_b"),
            F.col(f"__n_{j}").alias("n_pairs"),
            F.round(F.col(f"__r_{j}"), 6).alias("pearson_r"),
        )
        for j, (a, b) in enumerate(pairs)
    ]
    return (
        row.select(F.explode(F.array(*structs)).alias("s"))
        .select("s.col_a", "s.col_b", "s.n_pairs", "s.pearson_r")
    )


def _avg_rank(df, col: str, out: str):
    """Attach the average (midrank) of ``col`` as ``out`` WITHOUT a global
    sort of the full data: ranks are computed over the per-value counts
    (groupBy value → cumulative count over the distinct-value spine, which is
    orders of magnitude smaller than the data) and joined back on the value.
    avg_rank(v) = #smaller + (#equal + 1)/2 — exact midranks, ties included.
    Null values get a NULL rank (excluded from Spearman, matching
    pairwise-complete Pearson-over-ranks semantics)."""
    from pyspark.sql import Window

    vc = df.where(F.col(col).isNotNull()).groupBy(col).agg(
        F.count(F.lit(1)).alias("__c")
    )
    w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = vc.select(
        F.col(col).alias("__v"),
        (F.sum("__c").over(w) - F.col("__c") + (F.col("__c") + 1) / 2.0)
        .alias(out),
    )
    return df.join(ranked, df[col] == ranked["__v"], "left").drop("__v")


def spearman_correlation(df, col_a: str, col_b: str):
    """Spearman rank correlation as a one-row DataFrame (n_pairs,
    spearman_r): exact midranks per column via the distinct-value spine
    (no global data sort — see _avg_rank), then Pearson over the rank
    columns in one fused agg. Complete-case: rows where either side is null
    are dropped BEFORE ranking (the pandas/scipy `spearmanr` convention).

    Scale: the only global ordering is the window over DISTINCT values of
    each column; the data itself only shuffles for the two value-keyed
    joins, which AQE plans as broadcasts when the spine is small."""
    # complete-case first (pandas/scipy convention): ranks are taken over the
    # rows where BOTH sides are present, not per-column over all rows
    cc = df.where(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
    ranked = _avg_rank(_avg_rank(cc, col_a, "__ra"), col_b, "__rb")
    return ranked.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.corr("__ra", "__rb"), 6).alias("spearman_r"),
    )


def _pearson_metric_cfgs(cfg):
    d = build_domain(cfg)
    dom = Domain(row_condition=d.row_condition,
                 column_a=d.column_a, column_b=d.column_b)
    return MetricConfiguration("column_pair.pearson", dom)


@eager_metric("column_pair.pearson")
def _pearson(resolver, ddf, cfg: MetricConfiguration, _):
    """Pearson r of the pair domain — F.corr is pairwise-complete (null on
    either side drops the row), a single JVM-side co-moment aggregate."""
    a, b = cfg.domain.column_a, cfg.domain.column_b
    r = ddf.agg(F.corr(a, b).alias("r")).collect()[0]["r"]
    return None if r is None else float(r)


class ColumnPairCorrelationExpectation(Expectation):
    """expect_column_pair_correlation_to_be_between(column_A, column_B,
    min_value, max_value, strict_min, strict_max) — engine extension (no
    reference counterpart; registry-compatible with the aggregate
    between-family). observed_value is the Pearson r."""

    name = "expect_column_pair_correlation_to_be_between"

    def metric_requests(self, cfg, rf):
        return {"r": _pearson_metric_cfgs(cfg)}

    def validate(self, cfg, rf, resolver):
        observed = resolver[_pearson_metric_cfgs(cfg)]
        success = validate_value_between(
            observed,
            min_value=cfg.get("min_value"),
            max_value=cfg.get("max_value"),
            strict_min=bool(cfg.get("strict_min", False)),
            strict_max=bool(cfg.get("strict_max", False)),
        )
        ret: dict[str, Any] = {"success": success}
        if rf["result_format"] != "BOOLEAN_ONLY":
            ret["result"] = {"observed_value": observed}
        return ret


register_expectation(ColumnPairCorrelationExpectation())


# ---------------------------------------------------------------------------
# Exact quantiles / robust statistics over the distinct-value spine
# ---------------------------------------------------------------------------
#
# percentile_approx is the right tool for arbitrary columns at 10^12 rows,
# but its sketch error makes it useless as an *oracle-exact* statistic and
# as the basis of robust estimators (MAD, trimmed means) whose whole point
# is insensitivity to a few extreme rows. For bounded-cardinality numeric
# columns (quantities, ratings, bucketed sizes, ages — anything where
# distinct values << rows) exact order statistics are cheap if computed
# over the DISTINCT-VALUE SPINE instead of the data: groupBy(value) ->
# per-value counts (map-side combined, one narrow shuffle of the spine
# only) -> cumulative counts over the spine ordering -> every order
# statistic is a rank lookup. The same trick powers spearman_correlation's
# midranks above. For near-unique columns (prices, ids) the spine IS the
# data — use the sketch quantiles in metrics.py instead; that trade-off is
# the caller's, and it is documented rather than silently approximated.


def _spine(df, col: str, by: list[str] | None = None):
    """(group cols..., value, __c, __cum, __n) over distinct values of
    ``col`` (nulls dropped). __cum is the cumulative count in value order
    (rank of the LAST occurrence of the value), __n the group row count.
    The window runs over the spine, not the data: its single-task hazard
    is bounded by the distinct-value count, which is the documented
    applicability condition of this module."""
    from pyspark.sql import Window

    groups = list(by) if by else []
    spine = (
        df.where(F.col(col).isNotNull())
        .groupBy(*(groups + [col]))
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    w = (
        Window.partitionBy(*groups)
        .orderBy(col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy(*groups)
    return spine.select(
        *groups,
        F.col(col),
        F.col("__c"),
        F.sum("__c").over(w).alias("__cum"),
        F.sum("__c").over(wn).alias("__n"),
    )


def _q_name(p: float) -> str:
    return "p" + ("%g" % (p * 100)).replace(".", "_").replace("-", "m")


def _p_fraction(p: float) -> tuple[int, int]:
    """p as the exact rational of its DECIMAL literal (Fraction of str(p)):
    0.07 means 7/100, not the nearest IEEE double. Rank arithmetic must be
    integral — ceil(0.07 * 100) on doubles is 8, not 7 (the product
    evaluates to 7.000000000000001), which would silently return the wrong
    order statistic while an oracle replaying the same float math agrees."""
    from fractions import Fraction

    f = Fraction(str(p))
    if not 0 <= f <= 1:
        raise ValueError(f"quantile p must be in [0, 1], got {p!r}")
    return f.numerator, f.denominator


def _rank_stat(col: str, p: float):
    """Type-1 (lower) quantile as an aggregate over the spine: the smallest
    value whose cumulative count reaches ceil(p*n) = (num*n + den-1) DIV
    den — ALL-INTEGER rank arithmetic (see _p_fraction), so any engine
    replays it exactly at any n."""
    num, den = _p_fraction(p)
    # DIV is Spark's integer (bigint) division — no double rounding at any n
    k = F.expr(f"({num} * __n + {den - 1}) DIV {den}")
    return F.min(F.when(F.col("__cum") >= k, F.col(col)))


def exact_quantiles(
    df,
    col: str,
    ps: list[float],
    by: list[str] | None = None,
):
    """EXACT type-1 quantiles of ``col`` (optionally per group): one row
    per group with columns (``by``..., n, p<ps>...). Unlike
    percentile_approx there is no sketch error — the result is an actual
    data value at a deterministic rank, reproducible across engines and
    cluster sizes. Cost: one narrow shuffle of per-value counts + a window
    over the distinct-value spine; intended for bounded-cardinality
    columns (see module note above)."""
    groups = list(by) if by else []
    sp = _spine(df, col, groups)
    aggs = [F.max("__n").alias("n")]
    for p in ps:
        aggs.append(_rank_stat(col, p).alias(_q_name(p)))
    return sp.groupBy(*groups).agg(*aggs) if groups else sp.agg(*aggs)


def robust_profile(df, col: str, trim: float = 0.05):
    """One-row DataFrame of exact robust statistics of ``col``:

      n, median, q25, q75, iqr           — exact rank lookups (type-1)
      mad                                  — median(|x - median|), exact
      trimmed_mean (trim fraction each tail) and winsorized_mean — from
        the same spine via rank-window membership counts

    All order statistics are exact data values (bit-reproducible across
    engines and cluster sizes); the two means are double sums over the
    spine rounded to 6dp to absorb summation-order noise. Two spine
    passes total (the MAD pass needs the median as a literal), each a
    narrow per-value-count shuffle — the data itself is scanned twice and
    never sorted globally. Rows where ``col`` is null are excluded
    (n counts non-null rows), matching the aggregate-metric convention
    everywhere else in this engine. Returns an eager 1-row frame (the
    statistics are scalars; holding the plan lazy would just re-run both
    passes per downstream action). ``trim`` must lie in [0, 0.5): at 0.5
    both tails claim everything and the trimmed mean is undefined."""
    from pyspark.sql import Window

    if not 0 <= trim < 0.5:
        raise ValueError(
            f"trim must be in [0, 0.5) (fraction removed from EACH tail); "
            f"got {trim!r}"
        )
    sp = _spine(df, col)
    t_num, t_den = _p_fraction(trim)
    # k = floor(trim*n), all-integer (floor on the double product is off
    # by one whenever trim*n lands just below an integer, e.g. 0.29*100)
    k = F.expr(f"({t_num} * __n) DIV {t_den}")
    prev = F.col("__cum") - F.col("__c")
    # per-value membership count of the middle rank window (k, n-k] — the
    # rows neither tail claims; constant-k per row because n is a window
    # constant
    mid = F.greatest(
        F.lit(0).cast("long"),
        F.least(F.col("__cum"), F.col("__n") - k) - F.greatest(prev, k),
    )
    v = F.col(col).cast("double")
    srow = sp.agg(
        F.max("__n").alias("n"),
        _rank_stat(col, 0.5).alias("median"),
        _rank_stat(col, 0.25).alias("q25"),
        _rank_stat(col, 0.75).alias("q75"),
        F.max(k).alias("k"),
        F.sum(v * mid).alias("mid_sum"),
        # winsorization replacements: the (k+1)-th and (n-k)-th order stats
        F.min(F.when(F.col("__cum") >= k + 1, v)).alias("vlo"),
        F.min(F.when(F.col("__cum") >= F.col("__n") - k, v)).alias("vhi"),
    ).collect()[0]
    spark = df.sparkSession
    if srow["median"] is None:  # empty or all-null column
        return spark.range(1).select(
            F.lit(int(srow["n"] or 0)).alias("n"),
            *[
                F.lit(None).cast("double").alias(c)
                for c in (
                    "median",
                    "q25",
                    "q75",
                    "mad",
                    "iqr",
                    "trimmed_mean",
                    "winsorized_mean",
                )
            ],
        )
    # MAD: distinct |x - median| values derive from the distinct-value
    # spine, so the second pass re-aggregates per-value counts over the
    # distance and takes the same type-1 rank lookup
    dsp = (
        sp.select(
            F.abs(v - F.lit(float(srow["median"]))).alias("__d"), F.col("__c")
        )
        .groupBy("__d")
        .agg(F.sum("__c").alias("__c"))
    )
    wd = Window.orderBy("__d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    dr = dsp.select(
        "__d",
        F.sum("__c").over(wd).alias("__cum"),
        F.sum("__c").over(Window.partitionBy()).alias("__n"),
    )
    mad = dr.agg(
        F.min(
            F.when(
                # ceil(n/2) in integers
                F.col("__cum") >= F.expr("(__n + 1) DIV 2"),
                F.col("__d"),
            )
        ).alias("mad")
    ).collect()[0]["mad"]
    n, kk = int(srow["n"]), int(srow["k"])
    # assemble via JVM arithmetic (F.round half-up matches the oracle's
    # round; Python round() is half-even and would not)
    return spark.range(1).select(
        F.lit(n).alias("n"),
        F.lit(float(srow["median"])).alias("median"),
        F.lit(float(srow["q25"])).alias("q25"),
        F.lit(float(srow["q75"])).alias("q75"),
        F.lit(float(mad)).alias("mad"),
        (F.lit(float(srow["q75"])) - F.lit(float(srow["q25"]))).alias("iqr"),
        F.round(F.lit(float(srow["mid_sum"])) / F.lit(float(n - 2 * kk)), 6).alias(
            "trimmed_mean"
        ),
        F.round(
            (
                F.lit(float(srow["mid_sum"]))
                + F.lit(float(kk)) * (F.lit(float(srow["vlo"])) + F.lit(float(srow["vhi"])))
            )
            / F.lit(float(n)),
            6,
        ).alias("winsorized_mean"),
    )


def _mad_metric_cfg(cfg):
    d = build_domain(cfg)
    dom = Domain(row_condition=d.row_condition, column=d.column)
    return MetricConfiguration("column.mad", dom)


@eager_metric("column.mad")
def _mad(resolver, ddf, cfg: MetricConfiguration, _):
    """Exact median absolute deviation via robust_profile's spine (two
    narrow per-value-count passes; bounded-cardinality columns — see the
    spine module note)."""
    row = robust_profile(ddf, cfg.domain.column).collect()[0]
    return None if row["mad"] is None else float(row["mad"])


class ColumnMadExpectation(Expectation):
    """expect_column_median_absolute_deviation_to_be_between(column,
    min_value, max_value, strict_min, strict_max) — engine extension (no
    reference counterpart): the robust spread check that outliers cannot
    game the way they game stdev. observed_value is the exact MAD."""

    name = "expect_column_median_absolute_deviation_to_be_between"

    def metric_requests(self, cfg, rf):
        return {"mad": _mad_metric_cfg(cfg)}

    def validate(self, cfg, rf, resolver):
        observed = resolver[_mad_metric_cfg(cfg)]
        success = validate_value_between(
            observed,
            min_value=cfg.get("min_value"),
            max_value=cfg.get("max_value"),
            strict_min=bool(cfg.get("strict_min", False)),
            strict_max=bool(cfg.get("strict_max", False)),
        )
        ret: dict[str, Any] = {"success": success}
        if rf["result_format"] != "BOOLEAN_ONLY":
            ret["result"] = {"observed_value": observed}
        return ret


register_expectation(ColumnMadExpectation())
