"""Metric history + anomaly detection over the results store.

The runner persists every EVR into the store's ``evaluation_parameters``
table (runner.store_validation_result) — per-run lineage the north rule
asks for. This module turns that history into a time series per
(suite, expectation[, column]) and flags runs whose observed value
deviates from their own trailing history — the "this rebuild's mean
shifted" check that catches pipeline regressions *between* runs, which
no single-run expectation can see.

Scale: the history table grows one row per expectation per run — years of
hourly runs are still only ~10^5 rows per series, so the trailing-window
analytics run as ordinary window functions. JSON extraction
(get_json_object) happens distributed before anything is ordered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F


def metric_history(
    store,
    spark: SparkSession,
    suite: str,
    expectation: str,
    value_path: str = "result.observed_value",
    column: str | None = None,
) -> DataFrame:
    """(run_id, ts, value) series for one expectation's metric across runs.

    ``value_path`` is a dot path inside the stored EVR JSON;
    ``column`` filters on the expectation's column kwarg when a suite
    applies the same expectation type to several columns.
    """
    df = store.read(spark, "evaluation_parameters")
    out = df.where(
        (F.col("suite_name") == suite) & (F.col("expectation") == expectation)
    )
    if column is not None:
        out = out.where(
            F.get_json_object(
                F.col("evr"), "$.expectation_config.kwargs.column"
            ) == column
        )
    return out.select(
        "run_id",
        "ts",
        F.get_json_object(F.col("evr"), f"$.{value_path}")
        .cast("double")
        .alias("value"),
    ).where(F.col("value").isNotNull())


def all_metric_history(
    store,
    spark: SparkSession,
    value_path: str = "result.observed_value",
) -> DataFrame:
    """Every numeric metric series in the store in one pass:
    (suite_name, expectation, column, run_id, ts, value). Feed straight
    into ``anomalous_runs(series_cols=["suite_name", "expectation",
    "column"])`` to sweep the whole store for drifting metrics."""
    df = store.read(spark, "evaluation_parameters")
    return df.select(
        "suite_name",
        "expectation",
        F.get_json_object(
            F.col("evr"), "$.expectation_config.kwargs.column"
        ).alias("column"),
        "run_id",
        "ts",
        F.get_json_object(F.col("evr"), f"$.{value_path}")
        .cast("double")
        .alias("value"),
    ).where(F.col("value").isNotNull())


def anomalous_runs(
    history: DataFrame,
    k: float = 3.0,
    min_history: int = 5,
    series_cols: list[str] | None = None,
) -> DataFrame:
    """Flag runs whose value deviates more than ``k`` trailing standard
    deviations from the trailing mean (strictly-prior rows only, so an
    anomalous run never masks itself). Runs with fewer than
    ``min_history`` prior points are never flagged.

    For a single metric series the window is unpartitioned (one row per
    run — driver-scale by construction). To scan EVERY series of a wide
    store in one pass, pass ``series_cols`` (e.g. ``["suite_name",
    "expectation"]``): the trailing window partitions by series, so
    thousands of metric series flag in a single shuffle.
    """
    w = (
        (Window.partitionBy(*series_cols) if series_cols else Window)
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = history.select(
        "*",
        F.avg("value").over(w).alias("trailing_mean"),
        F.stddev("value").over(w).alias("trailing_std"),
        F.count("value").over(w).alias("n_prior"),
    )
    dev = F.abs(F.col("value") - F.col("trailing_mean"))
    return out.select(
        "*",
        (
            (F.col("n_prior") >= min_history)
            & F.col("trailing_std").isNotNull()
            & (dev > F.lit(float(k)) * F.col("trailing_std"))
        ).alias("is_anomaly"),
    )
