"""Row-level quarantine: split a DataFrame into (valid, quarantined) by a
whole expectation suite in ONE projection.

``summarize.suite_violations`` answers "which (doc, expectation) pairs
violate" — one scan per expectation, unioned. This module answers the
pipeline question "give me the clean rows, and park the bad ones with a
reason": every row-local condition in the suite compiles to a boolean
Column in a SINGLE select over a SINGLE scan — zero shuffle, zero joins,
whole-stage-codegen'd end to end. At 10^12 documents that is the only
shape that works: the cost is one pass over the data regardless of how
many expectations the suite holds.

Non-row-local checks route or skip explicitly:

  * uniqueness (``column_values.unique`` / ``compound_columns.unique``)
    joins a duplicated-KEY set back in (groupBy keys -> count>1, key-only
    shuffle with map-side combine). The dup-key side is usually tiny and
    AQE broadcasts it at runtime from its measured size — the hint is NOT
    forced, because the dup-key count is data-dependent: a table where
    most keys repeat produces a frame proportional to distinct-key count,
    and a forced broadcast would OOM past Spark's broadcast ceiling at
    10^12 rows. Worst case AQE falls back to a shuffled join on the
    key-only frame;
  * global-order checks (increasing/decreasing) and span-domain
    expectations are reported in ``skipped`` — a row's validity there
    depends on other rows' order or on exploded span rows, so a row-local
    quarantine decision would be a lie. Use ``ordering.
    monotonicity_violations`` / ``spans.span_violations`` for those.
  * aggregate/table-shape expectations have no per-row meaning and are
    skipped silently (they don't name rows).

The reference has no row-routing primitive at all — its COMPLETE result
format collects unexpected values to the driver (reference:
expectations/expectation.py _format_map_output). Splitting the actual
rows, distributed, is the scale-native replacement.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FAILED_COL = "failed_expectations"


@dataclass
class QuarantineResult:
    """``valid`` has the input schema; ``quarantined`` adds
    ``failed_expectations: array<string>`` naming every violated
    expectation (``<type>:<column(s)>`` labels). ``skipped`` maps
    expectation labels that could not participate to the reason."""

    valid: DataFrame
    quarantined: DataFrame
    skipped: dict[str, str] = field(default_factory=dict)


def _label(cfg) -> str:
    cols = (
        cfg.get("column")
        or ",".join(
            [c for c in (cfg.get("column_A"), cfg.get("column_B")) if c]
        )
        or ",".join(cfg.get("column_list") or ())
    )
    return f"{cfg.expectation_type}:{cols}" if cols else cfg.expectation_type


def _domain_guard(domain) -> Column:
    """Rows OUTSIDE the expectation's row_condition / ignore_row_if set are
    never unexpected for it — the guard ANDs into the mask instead of
    filtering the frame (all expectations share one scan)."""
    guard = F.lit(True)
    if domain.row_condition:
        guard = guard & F.expr(domain.row_condition)
    for cond in domain.filter_conditions:
        guard = guard & F.expr(cond)
    return guard


def suite_masks(
    df: DataFrame, suite, resolver=None
) -> tuple[list[tuple[str, Column]], dict[str, str]]:
    """Per-expectation row-local unexpected masks for every map-style
    expectation in ``suite``: ``([(label, mask), ...], skipped)``.

    Masks are pure Column expressions over ``df``'s columns (two-stage
    expectations resolve their statistics through ``resolver`` first, so a
    z-score mask arrives with mean/stddev already folded in as literals).
    Uniqueness and order-dependent conditions are NOT returned here — they
    are not row-local; ``quarantine`` handles uniqueness via key joins.
    """
    from .conditions import get_condition
    from .expectations import build_domain, get_expectation
    from .metrics import MetricResolver

    if resolver is None:
        resolver = MetricResolver(df)
    masks: list[tuple[str, Column]] = []
    skipped: dict[str, str] = {}
    for cfg in suite.expectations:
        try:
            exp = get_expectation(cfg.expectation_type)
        except KeyError:
            skipped[_label(cfg)] = "unknown expectation type"
            continue
        cond_name = getattr(exp, "condition_name", None)
        if not cond_name:
            continue  # aggregate/table-shape: no per-row meaning
        domain = build_domain(cfg)
        label = _label(cfg)
        if domain.explode_col is not None:
            skipped[label] = (
                "span-domain expectation: row validity lives on exploded "
                "span rows; use spans.span_violations"
            )
            continue
        if cond_name in (
            "column_values.unique",
            "compound_columns.unique",
        ):
            continue  # handled by quarantine() via dup-key joins
        spec = get_condition(cond_name)
        if cond_name in (
            "column_values.increasing",
            "column_values.decreasing",
        ) or (spec.is_window and not _is_arrow_rowlocal(spec)):
            skipped[label] = (
                "order/window-dependent condition: a row-local quarantine "
                "decision would depend on other rows"
            )
            continue
        try:
            kwargs = exp.resolved_condition_kwargs(cfg, resolver)
        except Exception as e:  # unresolvable stats -> skip, don't crash
            skipped[label] = f"condition kwargs unresolvable: {e}"
            continue
        mask = spec.unexpected(
            domain, kwargs, resolver.float_cols, resolver.dtypes
        )
        masks.append((label, _domain_guard(domain) & mask))
    return masks, skipped


def _is_arrow_rowlocal(spec) -> bool:
    """Some conditions are flagged is_window only because their pandas-UDF
    mask cannot join the fused agg pass — the mask itself is still a
    row-local Column (dateutil_parseable, json-schema, media decode).
    True window functions (unique/compound/increasing) are not."""
    return spec.name in (
        "column_values.dateutil_parseable",
        "column_values.match_json_schema",
        "column_values.media_decodable",
    )


def _unique_flags(
    df: DataFrame, suite
) -> tuple[DataFrame, list[tuple[str, Column]]]:
    """LEFT-join duplicated-key indicator columns for every uniqueness
    expectation. Key-only groupBy (map-side combine, AQE skew-split); the
    dup-key side is left un-hinted so AQE broadcasts it only when its
    MEASURED size is under the threshold — its size is data-dependent
    (high-dup-rate tables produce a frame ~ distinct-key count), so a
    forced broadcast is an OOM at scale. Either way only key-sized data
    moves: the full rows never shuffle on the broadcast path, and on the
    shuffled fallback the probe side shuffles once on the key."""
    from .expectations import build_domain, get_expectation

    flags: list[tuple[str, Column]] = []
    i = 0
    for cfg in suite.expectations:
        try:
            exp = get_expectation(cfg.expectation_type)
        except KeyError:
            continue
        cond_name = getattr(exp, "condition_name", None)
        if cond_name not in (
            "column_values.unique",
            "compound_columns.unique",
        ):
            continue
        domain = build_domain(cfg)
        label = _label(cfg)
        flag = f"__qdup_{i}"
        i += 1
        guard = _domain_guard(domain)
        scan = df.where(guard) if cfg.get("row_condition") else df
        if cond_name == "column_values.unique":
            col = domain.column
            dups = (
                scan.where(F.col(col).isNotNull())
                .groupBy(col)
                .agg(F.count(F.lit(1)).alias("__n"))
                .where(F.col("__n") > 1)
                .select(F.col(col).alias(f"__qk_{i}"), F.lit(True).alias(flag))
            )
            df = df.join(
                dups, df[col] == dups[f"__qk_{i}"], "left"
            ).drop(f"__qk_{i}")
        else:
            cols = list(domain.column_list)
            dups = (
                scan.groupBy(*cols)
                .agg(F.count(F.lit(1)).alias("__n"))
                .where(F.col("__n") > 1)
                .select(
                    *[F.col(c).alias(f"__qk{i}_{c}") for c in cols],
                    F.lit(True).alias(flag),
                )
            )
            on = None
            for c in cols:
                # null-safe: the count form groups NULL keys together
                term = df[c].eqNullSafe(dups[f"__qk{i}_{c}"])
                on = term if on is None else (on & term)
            df = df.join(dups, on, "left").drop(
                *[f"__qk{i}_{c}" for c in cols]
            )
        flags.append((label, guard & F.col(flag).isNotNull()))
    return df, flags


def tag_failures(df: DataFrame, suite) -> tuple[DataFrame, dict[str, str]]:
    """``df`` + ``failed_expectations: array<string>`` listing every
    violated row-local (and uniqueness) expectation per row, in one
    projection. The array is empty for clean rows."""
    masks, skipped = suite_masks(df, suite)
    joined, uflags = _unique_flags(df, suite)
    all_masks = masks + uflags
    if not all_masks:
        out = joined.withColumn(
            FAILED_COL, F.array().cast("array<string>")
        )
        return out.select(*df.columns, FAILED_COL), skipped
    # array_compact is a plain builtin (no lambda HOF): nulls from
    # non-firing whens drop out, leaving just the violated labels
    arr = F.array_compact(
        F.array(*[F.when(m, F.lit(lbl)) for lbl, m in all_masks])
    )
    out = joined.withColumn(FAILED_COL, arr)
    return out.select(*df.columns, FAILED_COL), skipped


def stream_tag_failures(
    df: DataFrame, suite
) -> tuple[DataFrame, dict[str, str]]:
    """`tag_failures` for STREAMING frames: the same single stateless
    projection, so it composes with any sink/trigger without watermarks.

    Cross-row checks cannot be row-local in a stream and are reported in
    ``skipped``: uniqueness would need unbounded state (route it through
    ``streaming.stateful_key_counts`` instead), and two-stage expectations
    (z-score) would need a batch stats pass — ``suite_masks`` already
    reports those as unresolvable on a streaming frame.
    """
    from .expectations import get_expectation

    masks, skipped = suite_masks(df, suite)
    for cfg in suite.expectations:
        try:
            cond = getattr(
                get_expectation(cfg.expectation_type), "condition_name", None
            )
        except KeyError:
            continue
        if cond in ("column_values.unique", "compound_columns.unique"):
            skipped[_label(cfg)] = (
                "uniqueness needs unbounded cross-row state in a stream; "
                "use streaming.stateful_key_counts"
            )
    if not masks:
        out = df.withColumn(FAILED_COL, F.array().cast("array<string>"))
        return out, skipped
    arr = F.array_compact(
        F.array(*[F.when(m, F.lit(lbl)) for lbl, m in masks])
    )
    return df.withColumn(FAILED_COL, arr), skipped


VALID_PART_COL = "is_valid"


def write_quarantine(
    df: DataFrame,
    suite,
    path: str,
    data_format: str = "parquet",
    mode: str = "overwrite",
) -> dict[str, str]:
    """Route every row to ``<path>/is_valid=true|false`` in ONE write pass.

    The naive split (write ``valid``, then write ``quarantined``) scans the
    input twice — at 10^12 documents that doubles the job. Partitioning the
    tagged frame by a validity flag writes each row exactly once and still
    gives downstream readers a clean path (``.../is_valid=true``) that
    partition-prunes to the good rows; the false side carries
    ``failed_expectations`` for triage. Returns the skipped-check map.

    Note: Spark's partition-value inference reads the flag back as a
    STRING (``'true'``/``'false'``) — filter with
    ``col("is_valid") == "true"`` or read the subdirectory directly.
    """
    tagged, skipped = tag_failures(df, suite)
    out = tagged.withColumn(VALID_PART_COL, F.size(FAILED_COL) == 0)
    (
        out.write.partitionBy(VALID_PART_COL)
        .format(data_format)
        .mode(mode)
        .save(path)
    )
    return skipped


def quarantine(df: DataFrame, suite) -> QuarantineResult:
    """Split ``df`` by ``suite``: rows violating ANY row-local or
    uniqueness expectation go to ``quarantined`` (with the violated labels
    in ``failed_expectations``), the rest to ``valid`` (input schema).

    Cost: one scan + one projection for the row-local checks, plus one
    key-only aggregation per uniqueness expectation (AQE-sized join back,
    broadcast when the measured dup-key frame is small). For
    repeated downstream use persist the tagged frame yourself and derive
    both splits from it — the two returned frames otherwise each re-scan.
    """
    tagged, skipped = tag_failures(df, suite)
    valid = tagged.where(F.size(FAILED_COL) == 0).drop(FAILED_COL)
    bad = tagged.where(F.size(FAILED_COL) > 0)
    return QuarantineResult(valid=valid, quarantined=bad, skipped=skipped)
