"""Row-level map conditions: builders of boolean "unexpected" Columns.

Every condition compiles to a native Spark Column predicate (JVM-side,
whole-stage-codegen'd) — no per-row Python, per the north rule. The default
null handling mirrors the reference's Spark wrapper: nulls are never
unexpected, i.e. the mask is ``col.isNotNull() & ~expected``
(reference: expectations/metrics/map_metric_provider/
column_condition_partial.py:217-299, filter_column_isnull default at
:274-276, mask composition at :286-289).

A ConditionSpec carries:
  - ``build(domain, kwargs) -> Column``: the *expected* predicate over
    non-null values (or the full unexpected mask when ignore_nulls=False).
  - ``ignore_nulls``: False only for nullity checks themselves.
  - ``is_window``: condition contains a window function; its
    unexpected_count cannot join the fused agg pass and runs as a separate
    filter+count job (reference: WINDOW_CONDITION_FN handling,
    map_metric_provider/column_condition_partial.py:277-289).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from functools import reduce
from typing import Any, Callable

import pandas as pd  # noqa: F401 — pandas_udf resolves 'pd.Series' hints
from pyspark.sql import Column, Window
from pyspark.sql import functions as F

from .metrics import Domain


@dataclass
class ConditionSpec:
    name: str
    build: Callable[[Domain, dict[str, Any]], Column]  # expected-predicate
    ignore_nulls: bool = True
    is_window: bool = False
    # optional fn(simple_dtype_string, kwargs) raising on a column type the
    # condition cannot evaluate (reference parity: the per-row UDF engines
    # raise, e.g. strftime on an int column)
    type_guard: Callable[[str, dict[str, Any]], None] | None = None

    def unexpected(
        self,
        domain: Domain,
        kwargs: dict[str, Any],
        float_cols: frozenset[str] = frozenset(),
        dtypes: dict[str, str] | None = None,
    ) -> Column:
        """The full null-aware unexpected mask.

        ``float_cols`` enables NaN≡NULL semantics (pandas parity, see
        metrics.domain_col): on a float/double column a NaN value is never
        "unexpected" for value checks — it is *missing* — and nullity
        checks treat it exactly like NULL (reference Spark engine's
        ``filter_nan`` analog, sparkdf_execution_engine.py:665-700, applied
        uniformly as the Pandas engine does implicitly).
        """
        if (
            self.type_guard is not None
            and dtypes is not None
            and domain.column is not None
            and domain.column in dtypes
        ):
            self.type_guard(dtypes[domain.column], kwargs)
        is_float = domain.column is not None and domain.column in float_cols
        if not self.ignore_nulls:
            if is_float and self.name in ("column_values.nonnull", "column_values.null"):
                missing = F.col(domain.column).isNull() | F.isnan(F.col(domain.column))
                return missing if self.name == "column_values.nonnull" else ~missing
            return ~self.build(domain, kwargs)
        guard = self._nonnull(domain)
        if is_float:
            guard = guard & ~F.isnan(F.col(domain.column))
        return guard & ~self.build(domain, kwargs)

    @staticmethod
    def _nonnull(domain: Domain) -> Column:
        if domain.column is not None:
            return F.col(domain.column).isNotNull()
        # pair / multicolumn domains: ignore_row_if already filtered rows in
        # the domain; remaining rows all count.
        return F.lit(True)


_CONDITIONS: dict[str, ConditionSpec] = {}


def register_condition(spec: ConditionSpec) -> ConditionSpec:
    _CONDITIONS[spec.name] = spec
    return spec


def get_condition(name: str) -> ConditionSpec:
    return _CONDITIONS[name]


def condition(
    name: str,
    ignore_nulls: bool = True,
    is_window: bool = False,
    type_guard: Callable[[str, dict[str, Any]], None] | None = None,
):
    def deco(fn):
        register_condition(
            ConditionSpec(
                name=name, build=fn, ignore_nulls=ignore_nulls,
                is_window=is_window, type_guard=type_guard,
            )
        )
        return fn

    return deco


def _string_only_guard(expectation: str) -> Callable[[str, dict], None]:
    def guard(dtype: str, kw: dict[str, Any]) -> None:
        if dtype != "string":
            # reference message verbatim
            # (column_values_match_strftime_format.py:27,
            #  column_values_dateutil_parseable.py:19)
            raise TypeError(
                f"Values passed to {expectation} must be of type string.\n"
                "If you want to validate a column of dates or timestamps, "
                "please call the expectation before converting from string "
                "format."
            )

    return guard


# ---------------------------------------------------------------------------
# Column map conditions (SURVEY.md §2.5)
# ---------------------------------------------------------------------------


@condition("column_values.nonnull", ignore_nulls=False)
def _nonnull(domain: Domain, kw: dict) -> Column:
    # reference: column_values_non_null.py:36-38
    return F.col(domain.column).isNotNull()


@condition("column_values.null", ignore_nulls=False)
def _null(domain: Domain, kw: dict) -> Column:
    return F.col(domain.column).isNull()


@condition("column_values.in_set")
def _in_set(domain: Domain, kw: dict) -> Column:
    # reference: column_values_in_set.py:104-108 — value_set=None is
    # VACUOUSLY TRUE (everything expected), while an explicit empty set
    # means nothing can match (isin([]) -> all unexpected)
    value_set = kw.get("value_set")
    if value_set is None:
        return F.lit(True)
    if not value_set:
        return F.lit(False)
    return F.col(domain.column).isin(list(value_set))


@condition("column_values.not_in_set")
def _not_in_set(domain: Domain, kw: dict) -> Column:
    value_set = kw.get("value_set") or []
    if not value_set:
        return F.lit(True)
    return ~F.col(domain.column).isin(list(value_set))


@condition("column_values.between")
def _between(domain: Domain, kw: dict) -> Column:
    # reference: column_values_between.py:303-356 — one-sided allowed,
    # strict_min/strict_max flags; parse_strings_as_datetimes turns string
    # bounds into datetime literals for timestamp columns.
    col = F.col(domain.column)
    lo, hi = kw.get("min_value"), kw.get("max_value")
    if kw.get("parse_strings_as_datetimes"):
        from dateutil.parser import parse as _parse  # noqa: PLC0415

        lo = _parse(lo) if isinstance(lo, str) else lo
        hi = _parse(hi) if isinstance(hi, str) else hi
    conds = []
    if lo is not None:
        conds.append(col > F.lit(lo) if kw.get("strict_min") else col >= F.lit(lo))
    if hi is not None:
        conds.append(col < F.lit(hi) if kw.get("strict_max") else col <= F.lit(hi))
    if not conds:
        return F.lit(True)
    return reduce(lambda a, b: a & b, conds)


@condition("column_values.match_regex")
def _match_regex(domain: Domain, kw: dict) -> Column:
    # reference: column_values_match_regex.py:37-38 (rlike)
    return F.col(domain.column).rlike(kw["regex"])


@condition("column_values.not_match_regex")
def _not_match_regex(domain: Domain, kw: dict) -> Column:
    return ~F.col(domain.column).rlike(kw["regex"])


@condition("column_values.match_regex_list")
def _match_regex_list(domain: Domain, kw: dict) -> Column:
    # reference: column_values_match_regex_list.py:74-79 — any: alternation;
    # all: conjunction of rlikes (clearer than lookahead concat and same
    # semantics for Spark's Java regex).
    regexes = list(kw["regex_list"])
    col = F.col(domain.column)
    if kw.get("match_on", "any") == "any":
        return col.rlike("|".join(f"(?:{r})" for r in regexes))
    return reduce(lambda a, b: a & b, [col.rlike(r) for r in regexes])


@condition("column_values.not_match_regex_list")
def _not_match_regex_list(domain: Domain, kw: dict) -> Column:
    regexes = list(kw["regex_list"])
    col = F.col(domain.column)
    return reduce(lambda a, b: a & b, [~col.rlike(r) for r in regexes])


@condition("column_values.match_like_pattern")
def _match_like(domain: Domain, kw: dict) -> Column:
    # reference has no Spark impl (column_values_match_like_pattern.py:21-32
    # is SQLAlchemy-only); trivial in Spark via Column.like.
    return F.col(domain.column).like(kw["like_pattern"])


@condition("column_values.not_match_like_pattern")
def _not_match_like(domain: Domain, kw: dict) -> Column:
    return ~F.col(domain.column).like(kw["like_pattern"])


@condition("column_values.match_like_pattern_list")
def _match_like_list(domain: Domain, kw: dict) -> Column:
    col = F.col(domain.column)
    pats = list(kw["like_pattern_list"])
    if kw.get("match_on", "any") == "any":
        return reduce(lambda a, b: a | b, [col.like(p) for p in pats])
    return reduce(lambda a, b: a & b, [col.like(p) for p in pats])


@condition("column_values.not_match_like_pattern_list")
def _not_match_like_list(domain: Domain, kw: dict) -> Column:
    col = F.col(domain.column)
    return reduce(
        lambda a, b: a & b, [~col.like(p) for p in kw["like_pattern_list"]]
    )


@condition("column_values.value_length.between")
def _len_between(domain: Domain, kw: dict) -> Column:
    # reference: column_value_lengths.py:98-99
    ln = F.length(F.col(domain.column))
    conds = []
    if kw.get("min_value") is not None:
        conds.append(ln >= F.lit(int(kw["min_value"])))
    if kw.get("max_value") is not None:
        conds.append(ln <= F.lit(int(kw["max_value"])))
    if not conds:
        return F.lit(True)
    return reduce(lambda a, b: a & b, conds)


@condition("column_values.value_length.equals")
def _len_equals(domain: Domain, kw: dict) -> Column:
    return F.length(F.col(domain.column)) == F.lit(int(kw["value"]))


# strftime -> Spark (Java DateTimeFormatter) pattern translations.
# %f maps to SSSSSS, which Spark parses LAXLY (1-6 fraction digits match,
# verified empirically) — same acceptance as Python strptime's %f.
_STRFTIME_MAP = {
    "%Y": "yyyy", "%y": "yy", "%m": "MM", "%d": "dd",
    "%H": "HH", "%I": "hh", "%M": "mm", "%S": "ss",
    "%j": "DDD", "%f": "SSSSSS", "%p": "a",
    "%b": "MMM", "%B": "MMMM", "%a": "EEE", "%A": "EEEE",
    "%z": "xx", "%%": "'%'",
}

# Python strptime %z accepts +0000 / +00:00 / +000000 / +00:00:00 / Z; no
# single Java offset pattern does, so %z expands to these variants and the
# match coalesces try_to_timestamp over the expansion (all JVM-side).
_TZ_VARIANTS = ("XX", "XXX", "XXXX", "XXXXX")


def strftime_to_spark_patterns(fmt: str) -> list[str]:
    """Translate a strftime format to Spark datetime pattern candidates.

    Literal characters are single-quoted (Java patterns reserve ALL
    letters, so an unquoted 'T' in an ISO format would be a pattern error);
    unknown %-directives raise. A %z directive fans out into one pattern
    per offset variant Python's strptime accepts."""
    outs: list[list[str]] = [[]]
    i = 0
    while i < len(fmt):
        if fmt[i] == "%":
            d = fmt[i : i + 2]
            if d not in _STRFTIME_MAP:
                raise ValueError(f"unsupported strftime directive {d!r} in {fmt!r}")
            if d == "%z":
                outs = [prev + [v] for prev in outs for v in _TZ_VARIANTS]
            else:
                for prev in outs:
                    prev.append(_STRFTIME_MAP[d])
            i += 2
            continue
        j = i
        while j < len(fmt) and fmt[j] != "%":
            j += 1
        literal = fmt[i:j]
        if literal.strip(" -:/.,") == "":
            piece = literal  # separators need no quoting
        else:
            piece = "'" + literal.replace("'", "''") + "'"
        for prev in outs:
            prev.append(piece)
        i = j
    return ["".join(parts) for parts in outs]


def strftime_to_spark_pattern(fmt: str) -> str:
    """First (canonical) Spark pattern for a strftime format."""
    return strftime_to_spark_patterns(fmt)[0]


@condition(
    "column_values.match_strftime_format",
    type_guard=_string_only_guard("expect_column_values_to_match_strftime_format"),
)
def _strftime(domain: Domain, kw: dict) -> Column:
    """strftime-format match via native try_to_timestamp (JVM), not a Python
    UDF (reference uses a per-row udf,
    column_values_match_strftime_format.py:35-59 — the slow path we
    deliberately avoid)."""
    fmt = kw["strftime_format"]
    # reference format validation + message
    # (expect_column_values_to_match_strftime_format.py:185-189): the format
    # must survive a strftime->strptime round trip
    from datetime import datetime as _dt  # noqa: PLC0415

    try:
        _dt.strptime(_dt.strftime(_dt(2000, 1, 2, 3, 4, 5), fmt), fmt)
    except ValueError as e:
        raise ValueError(f"Unable to use provided strftime_format. {e}") from e
    probes = [
        F.try_to_timestamp(F.col(domain.column), F.lit(p))
        for p in strftime_to_spark_patterns(fmt)
    ]
    return F.coalesce(*probes).isNotNull() if len(probes) > 1 else probes[0].isNotNull()


@condition("column_values.vector_size.equals")
def _vector_size_equals(domain: Domain, kw: dict) -> Column:
    # no reference analog (GX has no vector columns): an embedding column
    # validates its dimensionality JVM-side — size() on the array, no
    # Python. A model change that re-embeds at a different width fails
    # loudly instead of poisoning downstream ANN/dedup stages.
    return F.size(F.col(domain.column)) == F.lit(int(kw["value"]))


@condition("column_values.vector_norm.between")
def _vector_norm_between(domain: Domain, kw: dict) -> Column:
    # L2 norm via the aggregate HOF — whole expression stays in the JVM
    # (zip-free fold: acc + x^2), so the check agg-bundles like any other
    # map condition. strict_min/strict_max mirror `between`'s knobs.
    # NaN/Inf components poison the sum -> norm is NaN/Inf -> comparisons
    # are false -> such rows are unexpected, which is the point: a single
    # non-finite embedding silently corrupts cosine/IP similarity.
    sq = F.aggregate(
        F.col(domain.column),
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    norm = F.sqrt(sq)
    # non-finite never passes: NaN components give a NaN norm, but Inf
    # components (or squares overflowing double) give +Inf — sqrt(Inf)
    # is Inf, not NaN, so a min_value-only check would wave it through
    conds = [~F.isnan(norm), norm < F.lit(float("inf"))]
    if kw.get("min_value") is not None:
        lo = F.lit(float(kw["min_value"]))
        conds.append(norm > lo if kw.get("strict_min") else norm >= lo)
    if kw.get("max_value") is not None:
        hi = F.lit(float(kw["max_value"]))
        conds.append(norm < hi if kw.get("strict_max") else norm <= hi)
    return reduce(lambda a, b: a & b, conds)


@condition("column_values.vector_finite")
def _vector_finite(domain: Domain, kw: dict) -> Column:
    # every component finite (and none NULL): exists() over the array,
    # JVM-side. isnan() errors on +-Inf only via arithmetic, so compare
    # against the literal infinities explicitly.
    bad = F.exists(
        F.col(domain.column),
        lambda x: x.isNull()
        | F.isnan(x.cast("double"))
        | (x.cast("double") == F.lit(float("inf")))
        | (x.cast("double") == F.lit(float("-inf"))),
    )
    return ~bad


@condition("column_values.json_parseable")
def _json_parseable(domain: Domain, kw: dict) -> Column:
    # reference: per-row json.loads udf (column_values_json_parseable.py:30-40);
    # ours: native get_json_object / from_json probe stays JVM-side.
    c = F.col(domain.column)
    # try_parse_json exists in Spark 4 (variant); fall back logic is JVM-side.
    return F.try_parse_json(c).isNotNull()


@condition("column_values.unique", is_window=True)
def _unique(domain: Domain, kw: dict) -> Column:
    # reference: column_values_unique.py:92-93 — count over value-partition
    # window == 1. Shuffles by value; for skew-prone columns the engine also
    # offers the groupBy/anti-join form (see summarize.unexpected_df with
    # strategy='groupby').
    w = Window.partitionBy(F.col(domain.column))
    return F.count(F.lit(1)).over(w) <= 1


@condition("compound_columns.unique", ignore_nulls=False, is_window=True)
def _compound_unique(domain: Domain, kw: dict) -> Column:
    # reference: compound_columns_unique.py:159-163
    w = Window.partitionBy(*[F.col(c) for c in domain.column_list])
    return F.count(F.lit(1)).over(w) <= 1


@condition("column_values.increasing", is_window=True)
def _increasing(domain: Domain, kw: dict) -> Column:
    """Global-order increasing check. reference:
    column_values_increasing.py:76-155 uses a single-partition window — a
    documented scaling hazard (SURVEY.md §7 risks); callers should supply an
    ``order_by`` kwarg (a monotonic key, e.g. doc_id) and treat this as a
    small-partition diagnostic, not a 100 TB operator.
    """
    order = kw.get("order_by")
    w = (
        Window.orderBy(F.col(order))
        if order
        else Window.orderBy(F.monotonically_increasing_id())
    )
    # previous NON-NULL value: the reference drops nulls before the lag
    # (add_column_row_condition filter_null/filter_nan,
    # column_values_increasing.py:105-108), so a value is compared against
    # the last non-null predecessor, not a null-interspersed neighbor
    prev = F.last(F.col(domain.column), ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    cmp = (
        F.col(domain.column) > prev
        if kw.get("strictly")
        else F.col(domain.column) >= prev
    )
    return prev.isNull() | cmp


@condition("column_values.decreasing", is_window=True)
def _decreasing(domain: Domain, kw: dict) -> Column:
    order = kw.get("order_by")
    w = (
        Window.orderBy(F.col(order))
        if order
        else Window.orderBy(F.monotonically_increasing_id())
    )
    prev = F.last(F.col(domain.column), ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    cmp = (
        F.col(domain.column) < prev
        if kw.get("strictly")
        else F.col(domain.column) <= prev
    )
    return prev.isNull() | cmp


@condition("column_values.z_score.under_threshold")
def _z_score(domain: Domain, kw: dict) -> Column:
    """z-score threshold with mean/stddev injected by the expectation layer
    (already resolved metrics — reference: column_values_z_score.py:88-140).
    The kwargs carry resolved float ``mean``/``stddev``.
    """
    col = F.col(domain.column)
    z = (col - F.lit(float(kw["mean"]))) / F.lit(float(kw["stddev"]))
    thr = float(kw["threshold"])
    if kw.get("double_sided", True):
        return F.abs(z) < F.lit(thr)
    return z < F.lit(thr)


# ---------------------------------------------------------------------------
# Column-pair & multicolumn conditions (SURVEY.md §2.6)
# ---------------------------------------------------------------------------


@condition("column_pair_values.equal", ignore_nulls=False)
def _pair_equal(domain: Domain, kw: dict) -> Column:
    # reference: column_pair_values_equal.py:41-44
    return F.col(domain.column_a).eqNullSafe(F.col(domain.column_b))


@condition("column_pair_values.a_greater_than_b", ignore_nulls=False)
def _pair_greater(domain: Domain, kw: dict) -> Column:
    # reference: column_pair_values_greater.py:94-118
    a, b = F.col(domain.column_a), F.col(domain.column_b)
    if kw.get("parse_strings_as_datetimes"):
        a, b = F.to_date(a), F.to_date(b)
    return a >= b if kw.get("or_equal") else a > b


@condition("column_pair_values.in_set", ignore_nulls=False)
def _pair_in_set(domain: Domain, kw: dict) -> Column:
    # reference: column_pair_values_in_set.py:78-90
    a, b = F.col(domain.column_a), F.col(domain.column_b)
    pairs = kw["value_pairs_set"]
    terms = [a.eqNullSafe(F.lit(x)) & b.eqNullSafe(F.lit(y)) for x, y in pairs]
    return reduce(lambda p, q: p | q, terms) if terms else F.lit(False)


@condition("multicolumn_sum.equal", ignore_nulls=False)
def _multi_sum_equal(domain: Domain, kw: dict) -> Column:
    # reference: multicolumn_sum_equal.py:40-45
    total = reduce(lambda a, b: a + b, [F.col(c) for c in domain.column_list])
    return total == F.lit(kw["sum_total"])


@condition("select_column_values.unique.within_record", ignore_nulls=False)
def _unique_within_record(domain: Domain, kw: dict) -> Column:
    # reference: select_column_values_unique_within_record.py:73-85
    cols = list(domain.column_list)
    terms = []
    for i in range(len(cols)):
        for j in range(i + 1, len(cols)):
            terms.append(~F.col(cols[i]).eqNullSafe(F.col(cols[j])))
    return reduce(lambda a, b: a & b, terms) if terms else F.lit(True)


def ignore_row_if_filter(domain: Domain, ignore_row_if: str) -> Column | None:
    """Build the keep-filter for pair/multicolumn domains.

    reference: sparkdf_execution_engine.py:537-588.
    Returns a Column of rows to KEEP, or None for 'never'/'neither'.
    """
    if domain.column_list:
        nulls = [F.col(c).isNull() for c in domain.column_list]
    else:
        nulls = [F.col(domain.column_a).isNull(), F.col(domain.column_b).isNull()]
    if ignore_row_if in ("both_values_are_missing", "all_values_are_missing"):
        return ~reduce(lambda a, b: a & b, nulls)
    if ignore_row_if in ("either_value_is_missing", "any_value_is_missing"):
        return ~reduce(lambda a, b: a | b, nulls)
    return None


# ---------------------------------------------------------------------------
# Arrow pandas-UDF conditions (the vectorized Python escape hatch — used
# only where no JVM expression exists; reference uses per-row F.udf here,
# SURVEY.md §2.5/§2.12)
# ---------------------------------------------------------------------------


def _dateutil_parseable_udf():
    from pyspark.sql import types as T  # noqa: PLC0415

    try:
        from dateutil.parser import parse as _parse  # noqa: PLC0415
    except ImportError as e:  # pragma: no cover
        raise ImportError("dateutil required for dateutil_parseable") from e

    @F.pandas_udf(T.BooleanType())
    def ok(s: pd.Series) -> pd.Series:
        def one(v):
            if v is None:
                return None
            try:
                _parse(v)
                return True
            except (ValueError, OverflowError, TypeError):
                return False

        return s.map(one)

    return ok


@condition(
    "column_values.dateutil_parseable",
    is_window=True,
    type_guard=_string_only_guard("expect_column_values_to_be_dateutil_parseable"),
)
def _dateutil_parseable(domain: Domain, kw: dict) -> Column:
    # is_window=True here means "not agg-bundleable": a pandas-UDF column
    # cannot join the fused JVM df.agg pass, so the count runs as its own
    # filter+count job (same routing as window conditions)
    # reference: column_values_dateutil_parseable.py:14 (Pandas-only);
    # ours: Arrow-batched pandas UDF, not a per-row F.udf
    return _dateutil_parseable_udf()(F.col(domain.column))


def _json_schema_udf(schema: dict):
    import json as _json  # noqa: PLC0415

    from pyspark.sql import types as T  # noqa: PLC0415

    try:
        import jsonschema  # noqa: PLC0415

        def check(obj) -> bool:
            try:
                jsonschema.validate(obj, schema)
                return True
            except jsonschema.ValidationError:
                return False
    except ImportError:
        # minimal structural fallback: type + required keys only, so the
        # expectation stays usable in images without jsonschema
        def check(obj) -> bool:
            t = schema.get("type")
            type_map = {"object": dict, "array": list, "string": str,
                        "number": (int, float), "integer": int, "boolean": bool}
            if t and not isinstance(obj, type_map.get(t, object)):
                return False
            if isinstance(obj, dict):
                return all(k in obj for k in schema.get("required", ()))
            return True

    @F.pandas_udf(T.BooleanType())
    def ok(s: pd.Series) -> pd.Series:
        def one(v):
            if v is None:
                return None
            try:
                return check(_json.loads(v))
            except (ValueError, TypeError):
                return False

        return s.map(one)

    return ok


@condition("column_values.match_json_schema", is_window=True)
def _match_json_schema(domain: Domain, kw: dict) -> Column:
    # reference: column_values_match_json_schema.py:41-65 (per-row udf);
    # ours: Arrow-batched with an import-gated jsonschema dependency
    return _json_schema_udf(dict(kw["json_schema"]))(F.col(domain.column))


def _media_decodable_udf(formats, check: str):
    from pyspark.sql import types as T  # noqa: PLC0415

    @F.pandas_udf(T.BooleanType())
    def ok(s: pd.Series) -> pd.Series:
        from .media import sniff_media, try_decode  # noqa: PLC0415 — executor-side

        probe = sniff_media if check == "header" else try_decode
        return s.map(
            lambda v: None if v is None else probe(v, formats) is not None
        )

    return ok


def _binary_only_guard(expectation: str):
    def guard(dtype: str, kw: dict) -> None:
        if dtype != "binary":
            raise TypeError(
                f"Values passed to {expectation} must be of type binary "
                f"(got {dtype}); media payload columns are opaque bytes."
            )

    return guard


@condition(
    "column_values.media_decodable",
    is_window=True,
    type_guard=_binary_only_guard("expect_column_values_to_be_media_decodable"),
)
def _media_decodable(domain: Domain, kw: dict) -> Column:
    # no reference analog (GX treats binaries as opaque): a media payload
    # column validates by REALLY decoding each payload against the
    # pure-python codecs (media.try_decode: ppm/png/jpeg-incl-progressive/
    # gif-incl-animated/wav/avi-mjpg-dib/y4m) in an Arrow-batched pandas
    # UDF — full decode,
    # not a magic-byte sniff, so truncation and bit-rot past the header
    # are unexpected values. kwargs: formats=["png", ...] narrows the
    # accepted set (validated eagerly on the driver so a typo fails the
    # suite loudly, not per-batch on executors); check="header" switches
    # to the O(header) structural sniff (media.sniff_media) — the 100 TB
    # fast path that skips entropy decode, for suites where wrong-format
    # and lying-magic rows are the target and deep corruption is
    # acceptable to miss (or sampled separately with check="full").
    from .media import validate_media_formats  # noqa: PLC0415

    check = kw.get("check", "full")
    if check not in ("full", "header"):
        raise ValueError(
            f"check must be 'full' or 'header', got {check!r}"
        )
    formats = validate_media_formats(kw.get("formats"))
    if check == "full":
        from .media import reject_sniff_only  # noqa: PLC0415

        reject_sniff_only(formats)
    return _media_decodable_udf(formats, check)(F.col(domain.column))
