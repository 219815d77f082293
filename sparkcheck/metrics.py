"""Metric model + Spark resolution engine with aggregate bundling.

The reference resolves a dependency graph of MetricConfigurations and
bundles all *aggregate partials* sharing a compute-domain into a single
``df.agg(*aggs).collect()`` pass (reference:
great_expectations/execution_engine/sparkdf_execution_engine.py:702-780,
single collect at :758; partial/bundle split
execution_engine/execution_engine.py:378-477). We keep that design — it is
the one GX optimization Catalyst cannot do for us (it fuses aggregates
within one action, not across actions) — and extend it: map-condition
unexpected-counts and histogram bins also become ``sum(when(...))`` columns
of the same fused pass, so a typical suite costs ONE Spark job for all
aggregate/count metrics plus one job per violation-sample collection.

Metric kinds (reference enum core/metric_function_types.py:26-112):
  - ``agg``     -> returns an unevaluated Spark Column aggregate; bundled.
  - ``eager``   -> runs its own Spark action (value_counts, unexpected
                   samples, quantile on tiny relative error, ...).
  - ``derived`` -> pure driver math over already-resolved metrics.

Identity of a metric is ``(name, domain_id, value_kwargs_id)`` exactly as
the reference (validator/metric_configuration.py:153-158; id_dict md5 of
sorted JSON, core/id_dict.py:13-28) so shared metrics (row_count, null
counts) are computed once per suite.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _stable_id(obj: Any) -> str:
    return hashlib.md5(
        json.dumps(obj, sort_keys=True, default=str).encode()
    ).hexdigest()


_FLOAT_TYPES = ("float", "double")


def float_columns(df: DataFrame) -> frozenset[str]:
    """Names of float/double columns — the ones where NaN is possible."""
    return frozenset(n for n, t in df.dtypes if t in _FLOAT_TYPES)


def domain_col(domain: "Domain", ctx: "MetricResolver | None" = None) -> Column:
    """The domain's accessor column with NaN≡NULL semantics for float
    columns: NaN values are masked to NULL so every aggregate and count
    skips them exactly like nulls.

    Rationale: GX's cross-backend authority is the Pandas engine, where NaN
    *is* null (so ``column.mean`` skips NaN and NaN never counts as an
    unexpected value); the reference's Spark engine only injects
    ``NOT isnan(col)`` for increasing/decreasing
    (sparkdf_execution_engine.py:665-700 ``add_column_row_condition``
    ``filter_nan``; callers column_values_increasing.py:105-108). We apply
    the pandas-parity semantics uniformly — done as an expression (not a
    row filter) so metrics on different columns still share ONE fused
    df.agg pass.
    """
    c = F.col(domain.column)
    if ctx is not None and domain.column in ctx.float_cols:
        return F.when(~F.isnan(c), c)
    return c


@dataclass(frozen=True)
class Domain:
    """The sub-table a metric is computed over (reference:
    core/metric_domain_types.py TABLE/COLUMN/COLUMN_PAIR/MULTICOLUMN;
    kwarg split execution_engine/execution_engine.py:576-793).

    ``row_condition`` / ``filter_conditions`` are *compute* kwargs (they
    change the rows scanned and hence the bundling group); column
    accessors are *accessor* kwargs (they only pick columns inside the
    same scan).
    """

    row_condition: str | None = None
    # extra conjunctive Spark-SQL predicates injected by the engine
    # (null filters for window conditions, ignore_row_if, ...)
    filter_conditions: tuple[str, ...] = ()
    column: str | None = None
    column_a: str | None = None
    column_b: str | None = None
    column_list: tuple[str, ...] = ()
    # span-level domains (north rule): posexplode this array<struct> column
    # so one row per span exists before any metric runs; accessors then
    # reference struct fields as `__span.<field>` and the span ordinal as
    # `__span_index`. The explode is a narrow generator — it changes the
    # scanned row set, so it is part of the compute identity.
    explode_col: str | None = None

    @property
    def compute_id(self) -> str:
        """Identity of the scanned row set — the bundling key."""
        return _stable_id(
            {
                "row_condition": self.row_condition,
                "filters": self.filter_conditions,
                "explode": self.explode_col,
            }
        )

    @property
    def domain_id(self) -> str:
        return _stable_id(
            {
                "row_condition": self.row_condition,
                "filters": self.filter_conditions,
                "explode": self.explode_col,
                "column": self.column,
                "column_a": self.column_a,
                "column_b": self.column_b,
                "column_list": self.column_list,
            }
        )

    def apply(self, df: DataFrame) -> DataFrame:
        """Realize the compute domain: explode (for span domains) +
        filters — column projection is left to Catalyst column pruning."""
        if self.explode_col:
            df = df.select(
                "*", F.posexplode(self.explode_col).alias("__span_index", "__span")
            )
        if self.row_condition:
            df = df.filter(self.row_condition)
        for cond in self.filter_conditions:
            df = df.filter(cond)
        return df


@dataclass(frozen=True)
class MetricConfiguration:
    name: str
    domain: Domain
    value_kwargs: tuple = ()  # frozen (key, value) pairs

    @property
    def id(self) -> tuple[str, str, str]:
        return (self.name, self.domain.domain_id, _stable_id(self.value_kwargs))

    def kw(self, key: str, default: Any = None) -> Any:
        for k, v in self.value_kwargs:
            if k == key:
                return v
        return default


def freeze_kwargs(**kwargs: Any) -> tuple:
    def fr(v: Any) -> Any:
        if isinstance(v, dict):
            return tuple(sorted((k, fr(x)) for k, x in v.items()))
        if isinstance(v, (list, tuple, set)):
            return tuple(fr(x) for x in v)
        return v

    return tuple(sorted((k, fr(v)) for k, v in kwargs.items()))


@dataclass
class MetricSpec:
    """Registry entry. Exactly one of the three fns is set, per kind."""

    name: str
    kind: str  # 'agg' | 'eager' | 'derived'
    # agg: (domain, metric_cfg, resolver_ctx) -> Column (unevaluated aggregate)
    agg_fn: Callable[..., Column] | None = None
    # eager: (engine, domain_df, metric_cfg, resolved) -> value
    eager_fn: Callable[..., Any] | None = None
    # derived: (resolved, metric_cfg) -> value
    derived_fn: Callable[..., Any] | None = None
    # deps: (metric_cfg) -> dict[dep_key, MetricConfiguration]
    deps_fn: Callable[[MetricConfiguration], dict[str, MetricConfiguration]] | None = None


_REGISTRY: dict[str, MetricSpec] = {}


def register_metric(spec: MetricSpec) -> MetricSpec:
    _REGISTRY[spec.name] = spec
    return spec


def get_metric_spec(name: str) -> MetricSpec:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(f"metric {name!r} is not registered") from None


def agg_metric(name: str):
    """Decorator: register fn(domain, cfg, ctx) -> Column as a bundled aggregate."""

    def deco(fn):
        register_metric(MetricSpec(name=name, kind="agg", agg_fn=fn))
        return fn

    return deco


def eager_metric(name: str, deps_fn=None):
    def deco(fn):
        register_metric(MetricSpec(name=name, kind="eager", eager_fn=fn, deps_fn=deps_fn))
        return fn

    return deco


def derived_metric(name: str, deps_fn=None):
    def deco(fn):
        register_metric(
            MetricSpec(name=name, kind="derived", derived_fn=fn, deps_fn=deps_fn)
        )
        return fn

    return deco


def _is_transient(e: Exception) -> bool:
    """Whether a metric failure is worth retrying (reference retries every
    failure MAX_METRIC_COMPUTATION_RETRIES times, validation_graph.py:38;
    we classify: analysis/type/value errors are deterministic and fail the
    same way every time, so only infrastructure-flavored failures retry)."""
    try:  # pyspark exception taxonomy (Spark 3.4+)
        from pyspark.errors import AnalysisException, PySparkException  # noqa: PLC0415

        if isinstance(e, AnalysisException):
            return False
        if isinstance(e, PySparkException) and not isinstance(e, AnalysisException):
            # runtime Spark failures (executor loss, fetch failure, ...)
            return True
    except ImportError:  # pragma: no cover
        pass
    return not isinstance(e, (KeyError, TypeError, ValueError, AttributeError))


class MetricResolver:
    """Dependency-driven resolver with per-compute-domain agg bundling.

    Reference analog: ValidationGraph.resolve loop
    (validator/validation_graph.py:181-347) + resolve_metric_bundle
    (sparkdf_execution_engine.py:702-780). Resolved values are memoized by
    metric id for the lifetime of the resolver (execution_engine.py:151-158).
    """

    MAX_RETRIES = 3  # reference: validation_graph.py:38

    def __init__(self, df: DataFrame):
        self.df = df
        self.cache: dict[tuple, Any] = {}
        # metric id -> original exception; __getitem__ re-raises so the
        # expectation's EVR carries the REAL failure (e.g. a type-guard
        # ValueError), not a downstream KeyError (reference keeps the
        # original exception in exception_info, validator.py:1159-1213)
        self.failed: dict[tuple, Exception] = {}
        self._domain_df_cache: dict[str, DataFrame] = {}
        # float/double columns get NaN==NULL semantics (see domain_col)
        self.float_cols = float_columns(df)

    @property
    def dtypes(self) -> dict[str, str]:
        if not hasattr(self, "_dtypes"):
            self._dtypes = dict(self.df.dtypes)
        return self._dtypes

    def domain_df(self, domain: Domain) -> DataFrame:
        key = domain.compute_id
        if key not in self._domain_df_cache:
            self._domain_df_cache[key] = domain.apply(self.df)
        return self._domain_df_cache[key]

    def resolve(
        self,
        requests: list[MetricConfiguration],
        raise_errors: bool = True,
    ) -> dict[tuple, Any]:
        """Resolve all requested metrics (+ transitive deps). Returns the
        full id -> value cache.

        raise_errors=False (the validator's suite mode) records each
        metric's failure in ``self.failed`` and keeps resolving the rest of
        the suite; accessing a failed metric re-raises its original
        exception."""
        pending: dict[tuple, MetricConfiguration] = {}

        def add(cfg: MetricConfiguration) -> None:
            if cfg.id in self.cache or cfg.id in pending:
                return
            pending[cfg.id] = cfg
            spec = get_metric_spec(cfg.name)
            if spec.deps_fn:
                for dep in spec.deps_fn(cfg).values():
                    add(dep)

        for r in requests:
            add(r)

        def fail(cfg: MetricConfiguration, e: Exception) -> None:
            if raise_errors:
                raise e
            self.failed[cfg.id] = e
            pending.pop(cfg.id, None)

        # iterate: compute everything whose deps are satisfied, bundling aggs
        while pending:
            ready_aggs: dict[str, list[MetricConfiguration]] = {}
            ready_other: list[MetricConfiguration] = []
            for cfg in list(pending.values()):
                spec = get_metric_spec(cfg.name)
                deps = spec.deps_fn(cfg) if spec.deps_fn else {}
                bad = next(
                    (d for d in deps.values() if d.id in self.failed), None
                )
                if bad is not None:  # propagate the dep's original failure
                    fail(cfg, self.failed[bad.id])
                    continue
                if all(d.id in self.cache for d in deps.values()):
                    if spec.kind == "agg":
                        ready_aggs.setdefault(cfg.domain.compute_id, []).append(cfg)
                    else:
                        ready_other.append(cfg)
            if not pending:
                break
            if not ready_aggs and not ready_other:
                raise RuntimeError(
                    f"metric resolution stalled; unresolved: "
                    f"{[c.name for c in pending.values()]}"
                )

            # --- bundled aggregate pass: ONE Spark job per compute domain ---
            for compute_id, cfgs in ready_aggs.items():
                ddf = self.domain_df(cfgs[0].domain)
                aliased, good = [], []
                for cfg in cfgs:
                    try:
                        col = get_metric_spec(cfg.name).agg_fn(cfg.domain, cfg, self)
                    except Exception as e:  # noqa: BLE001 — e.g. type guards
                        fail(cfg, e)
                        continue
                    aliased.append(col.alias(f"m_{len(good)}"))
                    good.append(cfg)
                if not good:
                    continue
                try:
                    row = ddf.agg(*aliased).collect()[0]
                except Exception:  # noqa: BLE001 — isolate the bad aggregate
                    for i, cfg in enumerate(good):
                        try:
                            row1 = ddf.agg(aliased[i]).collect()[0]
                            self.cache[cfg.id] = row1[f"m_{i}"]
                            pending.pop(cfg.id, None)
                        except Exception as e:  # noqa: BLE001
                            fail(cfg, e)
                    continue
                for i, cfg in enumerate(good):
                    self.cache[cfg.id] = row[f"m_{i}"]
                    pending.pop(cfg.id, None)

            # --- eager / derived metrics ---
            for cfg in ready_other:
                spec = get_metric_spec(cfg.name)
                value: Any
                last_err: Exception | None = None
                for _attempt in range(self.MAX_RETRIES):
                    try:
                        if spec.kind == "eager":
                            value = spec.eager_fn(
                                self, self.domain_df(cfg.domain), cfg, self.cache
                            )
                        else:
                            value = spec.derived_fn(self.cache, cfg)
                        last_err = None
                        break
                    except Exception as e:  # noqa: BLE001 — retry then surface
                        last_err = e
                        if not _is_transient(e):
                            # deterministic failures (bad column name, bad
                            # SQL, driver-side math) would fail identically
                            # on every retry — surface immediately instead
                            # of burning MAX_RETRIES-1 useless cluster jobs
                            break
                if last_err is not None:
                    fail(cfg, last_err)
                    continue
                self.cache[cfg.id] = value
                pending.pop(cfg.id, None)

        return self.cache

    def __getitem__(self, cfg: MetricConfiguration) -> Any:
        if cfg.id in self.failed:
            raise self.failed[cfg.id]
        return self.cache[cfg.id]


# ---------------------------------------------------------------------------
# Core table / column-aggregate metrics (SURVEY.md §2.3–2.4)
# ---------------------------------------------------------------------------


@agg_metric("table.row_count")
def _row_count(domain: Domain, cfg: MetricConfiguration, ctx=None) -> Column:
    # reference: table_metrics/table_row_count.py:58-66 (F.count(F.lit(1)))
    return F.count(F.lit(1))


@agg_metric("column.null_count")
def _null_count(domain: Domain, cfg: MetricConfiguration, ctx=None) -> Column:
    # NaN counts as missing on float columns (pandas parity, see domain_col)
    return F.count(F.lit(1)) - F.count(domain_col(domain, ctx))


@agg_metric("column.nonnull_count")
def _nonnull_count(domain: Domain, cfg: MetricConfiguration, ctx=None) -> Column:
    return F.count(domain_col(domain, ctx))


@agg_metric("column.mean")
def _mean(domain: Domain, cfg: MetricConfiguration, ctx=None) -> Column:
    # reference: column_aggregate_metrics/column_mean.py:31-37
    return F.mean(domain_col(domain, ctx))


@agg_metric("column.standard_deviation")
def _stddev(domain: Domain, cfg: MetricConfiguration, ctx=None) -> Column:
    # reference: column_standard_deviation.py:93-96 (sample stddev, n-1)
    return F.stddev_samp(domain_col(domain, ctx))


@agg_metric("column.min")
def _min(domain: Domain, cfg: MetricConfiguration, ctx=None) -> Column:
    return F.min(domain_col(domain, ctx))


@agg_metric("column.max")
def _max(domain: Domain, cfg: MetricConfiguration, ctx=None) -> Column:
    return F.max(domain_col(domain, ctx))


@agg_metric("column.sum")
def _sum(domain: Domain, cfg: MetricConfiguration, ctx=None) -> Column:
    return F.sum(domain_col(domain, ctx))


@agg_metric("column.distinct_values.count")
def _distinct_count(domain: Domain, cfg: MetricConfiguration, ctx=None) -> Column:
    """Distinct count. Default is the HLL sketch (north rule: HLL for
    uniqueness at 10^12 scale); exact=True falls back to countDistinct for
    fixture parity (reference uses exact: column_distinct_values.py:122-132).
    """
    if cfg.kw("exact", False):
        return F.countDistinct(domain_col(domain, ctx))
    return F.approx_count_distinct(domain_col(domain, ctx), rsd=cfg.kw("rsd", 0.01))


@agg_metric("column.quantile_values")
def _quantiles(domain: Domain, cfg: MetricConfiguration, ctx=None) -> Column:
    """Quantiles inside the bundled agg.

    Default: ``percentile_approx`` (t-digest-style sketch, mergeable across
    partitions — the 100 TB path). exact=True uses exact ``percentile``
    (interpolated) for oracle/fixture parity at test scale.
    Reference: column_quantile_values.py:157-190 uses df.approxQuantile —
    a *separate driver action*; folding into the single agg pass saves a job.
    """
    qs = list(cfg.kw("quantiles", (0.25, 0.5, 0.75)))
    col = domain_col(domain, ctx)
    qlit = F.array(*[F.lit(float(q)) for q in qs])
    if cfg.kw("exact", False):
        return F.percentile(col, qlit)
    accuracy = int(cfg.kw("accuracy", 10000))
    return F.percentile_approx(col, qlit, F.lit(accuracy))


@agg_metric("column.median")
def _median(domain: Domain, cfg: MetricConfiguration, ctx=None) -> Column:
    # reference: column_median.py:91-121 (approxQuantile epsilon trick);
    # ours: exact interpolated median in the fused agg.
    return F.percentile(domain_col(domain, ctx), F.lit(0.5))


@agg_metric("column_values.length.min")
def _len_min(domain: Domain, cfg: MetricConfiguration, ctx=None) -> Column:
    # reference: column_values_length_min.py:31-32
    return F.min(F.length(F.col(domain.column)))


@agg_metric("column_values.length.max")
def _len_max(domain: Domain, cfg: MetricConfiguration, ctx=None) -> Column:
    return F.max(F.length(F.col(domain.column)))


@derived_metric(
    "column.unique_proportion",
    deps_fn=lambda cfg: {
        "distinct": MetricConfiguration(
            "column.distinct_values.count", cfg.domain, cfg.value_kwargs
        ),
        "nonnull": MetricConfiguration("column.nonnull_count", cfg.domain),
    },
)
def _unique_proportion(resolved: dict, cfg: MetricConfiguration):
    # reference: column_proportion_of_unique_values.py:36-60
    distinct = resolved[
        MetricConfiguration(
            "column.distinct_values.count", cfg.domain, cfg.value_kwargs
        ).id
    ]
    nonnull = resolved[MetricConfiguration("column.nonnull_count", cfg.domain).id]
    return (distinct / nonnull) if nonnull else 0.0


# collect() ceiling for full value histograms: a typo'd high-cardinality
# column must error, not OOM the driver (the docstring-only warning was not
# enforceable). Raise via value_kwargs max_groups when genuinely needed.
VALUE_COUNTS_MAX_GROUPS = 100_000


@eager_metric("column.value_counts")
def _value_counts(resolver, ddf: DataFrame, cfg: MetricConfiguration, resolved):
    """Value counts, collected. reference: column_value_counts.py:135-166.

    collect() of a full value histogram is only safe for low-cardinality
    columns (categorical KL, distinct-set checks); the ``max_groups`` cap is
    ENFORCED — fetching max_groups+1 rows costs nothing extra and turns a
    driver OOM into a clean error."""
    col = cfg.domain.column
    sort = cfg.kw("sort", "value")
    max_groups = int(cfg.kw("max_groups", VALUE_COUNTS_MAX_GROUPS))
    nn = F.col(col).isNotNull()
    if col in resolver.float_cols:
        nn = nn & ~F.isnan(F.col(col))
    out = ddf.where(nn).groupBy(col).count()
    if sort == "count":
        out = out.orderBy(F.desc("count"), F.col(col))
    else:
        out = out.orderBy(F.col(col))
    rows = out.limit(max_groups + 1).collect()
    if len(rows) > max_groups:
        raise ValueError(
            f"column.value_counts on {col!r} exceeds max_groups={max_groups} "
            "distinct values; this metric collects the full histogram to the "
            "driver and is only meant for low-cardinality columns — raise "
            "max_groups explicitly if this is intentional"
        )
    return [(r[col], r["count"]) for r in rows]


@derived_metric(
    "column.most_common_value",
    deps_fn=lambda cfg: {
        "vc": MetricConfiguration(
            "column.value_counts", cfg.domain, freeze_kwargs(sort="count")
        )
    },
)
def _most_common(resolved: dict, cfg: MetricConfiguration):
    # reference: column_most_common_value.py:27-39 — all values tied for max
    vc = resolved[
        MetricConfiguration(
            "column.value_counts", cfg.domain, freeze_kwargs(sort="count")
        ).id
    ]
    if not vc:
        return []
    top = vc[0][1]
    return sorted(v for v, c in vc if c == top)


@eager_metric("table.columns")
def _table_columns(resolver, ddf: DataFrame, cfg: MetricConfiguration, resolved):
    return list(ddf.columns)


@eager_metric("table.column_types")
def _table_column_types(resolver, ddf: DataFrame, cfg: MetricConfiguration, resolved):
    # reference: table_metrics/table_column_types.py:74
    return [
        {"name": f.name, "type": f.dataType.simpleString()} for f in ddf.schema.fields
    ]


@eager_metric("table.head")
def _table_head(resolver, ddf: DataFrame, cfg: MetricConfiguration, resolved):
    # reference: table_metrics/table_head.py:203-226 (limit(n) fetch)
    n = int(cfg.kw("n_rows", 5))
    return [r.asDict() for r in ddf.limit(n).collect()]
