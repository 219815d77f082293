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

from .expectations import Expectation, build_domain, register_expectation
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


# ---------------------------------------------------------------------------
# Distributed sufficient statistics
# ---------------------------------------------------------------------------


@eager_metric("column_pair.crosstab")
def _crosstab(resolver, ddf, cfg: MetricConfiguration, _):
    """Contingency counts [(a, b, n)] — one groupBy with map-side combine;
    collected because tests assume low cardinality (as the reference does)."""
    a, b = cfg.domain.column_a, cfg.domain.column_b
    rows = (
        ddf.where(F.col(a).isNotNull() & F.col(b).isNotNull())
        .groupBy(a, b)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    return [(r[a], r[b], r["n"]) for r in rows]


def _chi2_from_crosstab(cells: list[tuple]) -> tuple[float, int, float]:
    """(chi2, dof, n) from contingency cells via numpy on the small table."""
    avals = sorted({c[0] for c in cells}, key=str)
    bvals = sorted({c[1] for c in cells}, key=str)
    obs = np.zeros((len(avals), len(bvals)))
    ai = {v: i for i, v in enumerate(avals)}
    bi = {v: i for i, v in enumerate(bvals)}
    for a, b, n in cells:
        obs[ai[a], bi[b]] = n
    n = obs.sum()
    exp = np.outer(obs.sum(axis=1), obs.sum(axis=0)) / n
    with np.errstate(divide="ignore", invalid="ignore"):
        terms = np.where(exp > 0, (obs - exp) ** 2 / exp, 0.0)
    chi2 = float(terms.sum())
    dof = (len(avals) - 1) * (len(bvals) - 1)
    return chi2, dof, float(n)


# ---------------------------------------------------------------------------
# Expectations
# ---------------------------------------------------------------------------


class CramersPhiExpectation(Expectation):
    """expect_column_pair_cramers_phi_value_to_be_less_than(column_A,
    column_B, threshold). φ_c = sqrt(χ² / (n·(min(r,c)−1)))."""

    name = "expect_column_pair_cramers_phi_value_to_be_less_than"

    def _metric_cfg(self, cfg) -> MetricConfiguration:
        return MetricConfiguration("column_pair.crosstab", build_domain(cfg))

    def metric_requests(self, cfg, rf):
        return {"crosstab": self._metric_cfg(cfg)}

    def validate(self, cfg, rf, resolver):
        cells = resolver[self._metric_cfg(cfg)]
        if not cells:
            return {"success": True, "result": {"observed_value": None}}
        chi2, dof, n = _chi2_from_crosstab(cells)
        r = len({c[0] for c in cells})
        c = len({c[1] for c in cells})
        denom = n * (min(r, c) - 1)
        phi = math.sqrt(chi2 / denom) if denom > 0 else 0.0
        threshold = float(cfg.get("threshold", 0.1))
        ret: dict[str, Any] = {"success": phi < threshold}
        if rf["result_format"] != "BOOLEAN_ONLY":
            ret["result"] = {"observed_value": phi,
                             "details": {"chi2": chi2, "dof": dof, "n": n}}
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

    def metric_requests(self, cfg, rf):
        return {"vc": self._vc_cfg(cfg)}

    def validate(self, cfg, rf, resolver):
        vc = dict(resolver[self._vc_cfg(cfg)])
        po = cfg.get("partition_object") or {}
        values = list(po.get("values", ()))
        weights = np.asarray(po.get("weights", ()), dtype=float)
        observed = np.asarray([vc.get(v, 0) for v in values], dtype=float)
        n = observed.sum()
        expected = weights / weights.sum() * n
        with np.errstate(divide="ignore", invalid="ignore"):
            chi2 = float(
                np.where(expected > 0, (observed - expected) ** 2 / expected, 0.0).sum()
            )
        dof = max(len(values) - 1, 1)
        p_value = chi2_sf(chi2, dof)
        threshold = float(cfg.get("p", 0.05))
        ret: dict[str, Any] = {"success": p_value > threshold}
        if rf["result_format"] != "BOOLEAN_ONLY":
            ret["result"] = {
                "observed_value": p_value,
                "details": {"chi2": chi2, "dof": dof,
                            "observed_counts": observed.tolist(),
                            "expected_counts": expected.tolist()},
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
        params = cfg.get("params") or {}
        if dist == "norm":
            mean = float(params.get("mean", 0.0))
            std = float(params.get("std", 1.0))
            cdf = lambda x: norm_cdf(x, mean, std)  # noqa: E731
        elif dist == "uniform":
            lo = float(params.get("min", 0.0))
            hi = float(params.get("max", 1.0))
            cdf = lambda x: min(1.0, max(0.0, (x - lo) / (hi - lo)))  # noqa: E731
        else:
            raise ValueError(f"unsupported distribution {dist!r}")
        g = len(grid)
        d = max(
            (abs((i + 0.5) / g - cdf(q)) for i, q in enumerate(grid) if q is not None),
            default=0.0,
        )
        p_value = ks_p_value(d, n) if n else 1.0
        threshold = float(cfg.get("p", 0.05))
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
        po = cfg.get("partition_object") or {}
        bins = np.asarray(po.get("bins", ()), dtype=float)
        weights = np.asarray(po.get("weights", ()), dtype=float)
        if len(bins) != len(weights) + 1 or len(weights) == 0:
            raise ValueError("invalid continuous partition object")
        if not np.isfinite(bins).all():
            # reference raises the same constraint (:38-42)
            raise ValueError("Partition endpoints must be finite.")
        test_cdf = np.append([0.0], np.cumsum(weights / weights.sum()))

        reqs = self._reqs(cfg)
        grid = np.asarray(
            [q for q in (resolver[reqs["quantiles"]] or []) if q is not None],
            dtype=float,
        )
        n = int(resolver[reqs["nonnull"]] or 0)
        p = float(cfg.get("p", 0.05))
        n_samples = int(cfg.get("bootstrap_samples", 1000))
        size = int(cfg.get("bootstrap_sample_size", 2 * len(weights)))
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
            ret["result"] = {
                "observed_value": observed,
                "details": {"bootstrap_samples": n_samples,
                            "bootstrap_sample_size": size},
            }
        return ret


register_expectation(CramersPhiExpectation())
register_expectation(ChisquareTestExpectation())
register_expectation(KsTestExpectation())
register_expectation(BootstrappedKsTestExpectation())
