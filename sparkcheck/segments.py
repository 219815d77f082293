"""Segmented (per-group) validation — aggregate expectations by segment.

The reference evaluates aggregate expectations over one domain at a time;
validating "mean discount is in [lo, hi] for EVERY return-flag segment"
takes one suite run per segment — linear in segment count. This operator
does all segments in ONE grouped pass: a single groupBy computes every
check's aggregate per segment (map-side partial merge), and each check's
bounds become a Column flag, so the whole thing is one shuffle no matter
how many segments or checks.

A check is (alias, agg Column, min, max) — any Spark aggregate expression
works (avg/sum/approx quantiles/countDistinct...). Output: one row per
segment with each metric, per-check pass flags, and an overall
``segment_success``; ``violating_segments`` filters to failures, which is
what a 10^12-row table's report actually wants (segments are few, rows
are not).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def segment_validation(
    df: DataFrame,
    segment_cols: list[str],
    checks: list[tuple[str, Column, float | None, float | None]],
) -> DataFrame:
    """One row per segment: every check metric + ``<alias>_ok`` flag +
    overall ``segment_success``. Bounds are inclusive; a None bound is
    unbounded on that side (same contract as the between family)."""
    aggs = [col.alias(alias) for alias, col, _, _ in checks]
    out = df.groupBy(*[F.col(c) for c in segment_cols]).agg(*aggs)
    flags = []
    for alias, _, lo, hi in checks:
        ok = F.lit(True)
        if lo is not None:
            ok = ok & (F.col(alias) >= F.lit(lo))
        if hi is not None:
            ok = ok & (F.col(alias) <= F.lit(hi))
        # NULL metric (empty segment after filters) fails the check
        flags.append(F.coalesce(ok, F.lit(False)).alias(f"{alias}_ok"))
    out = out.select("*", *flags)
    overall = F.lit(True)
    for alias, _, _, _ in checks:
        overall = overall & F.col(f"{alias}_ok")
    return out.select("*", overall.alias("segment_success"))


def violating_segments(
    df: DataFrame,
    segment_cols: list[str],
    checks: list[tuple[str, Column, float | None, float | None]],
) -> DataFrame:
    """Only the segments failing at least one check."""
    return segment_validation(df, segment_cols, checks).where(
        ~F.col("segment_success")
    )
