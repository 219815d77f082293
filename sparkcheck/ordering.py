"""Scalable global-order monotonicity checking.

The reference's increasing/decreasing conditions funnel the whole dataset
through a single-partition window (column_values_increasing.py:133-137) —
fine as a small-sample diagnostic (we keep that form, with a row-count
refusal), useless at corpus scale. This module is the distributed design:

  1. ``repartitionByRange(order_by)`` — ONE balanced shuffle that gives
     globally ordered, contiguous partitions (Spark samples the key to
     build range bounds; skewed keys still spread because bounds follow
     the data distribution);
  2. ``sortWithinPartitions`` + an Arrow-batched ``mapInPandas`` that
     checks adjacent rows vectorized (pandas shift/compare, carrying the
     last value across Arrow batches) — embarrassingly parallel;
  3. partition-boundary pairs: each partition also emits its first/last
     (order, value); those P rows collect to the driver (P ≈ thousands,
     never data-sized) and adjacent partitions are compared there.

Total cost: one range shuffle + one narrow scan — the same shape as a
distributed sort, which is the information-theoretic floor for a global
order check.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CHECK_SCHEMA = T.StructType([
    T.StructField("row_kind", T.StringType()),   # 'violation' | 'bound'
    T.StructField("pid", T.IntegerType()),       # partition id (bound rows)
    T.StructField("order_key", T.DoubleType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("prev_value", T.DoubleType()),
])


def _checker(strictly: bool, decreasing: bool):
    def check(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext  # noqa: PLC0415

        # partition identity travels WITH the bound rows: the driver pairs
        # first/last per pid instead of re-deriving pairs from a global sort
        # of (order, value) tuples, which could mis-pair when partitions
        # start and end on duplicate order keys
        pid = TaskContext.get().partitionId()
        prev_val = None
        first = None  # (order, value) of the partition's first row
        last = None
        for pdf in batches:
            if pdf.empty:
                continue
            vals = pdf["__val"].astype(float)
            ords = pdf["__ord"].astype(float)
            if first is None:
                first = (float(ords.iloc[0]), float(vals.iloc[0]))
            prev = vals.shift(1)
            if prev_val is not None:
                prev.iloc[0] = prev_val
            if decreasing:
                bad = vals > prev if not strictly else vals >= prev
            else:
                bad = vals < prev if not strictly else vals <= prev
            bad = bad.fillna(False)
            if bad.any():
                out = pd.DataFrame({
                    "row_kind": "violation",
                    "pid": pid,
                    "order_key": ords[bad],
                    "value": vals[bad],
                    "prev_value": prev[bad],
                })
                yield out
            prev_val = float(vals.iloc[-1])
            last = (float(ords.iloc[-1]), float(vals.iloc[-1]))
        if first is not None:
            yield pd.DataFrame({
                "row_kind": ["bound", "bound"],
                "pid": [pid, pid],
                "order_key": [first[0], last[0]],
                "value": [first[1], last[1]],
                "prev_value": [float("nan"), float("nan")],
            })

    return check


def monotonicity_violations(
    df: DataFrame,
    column: str,
    order_by: str,
    strictly: bool = False,
    decreasing: bool = False,
    n_partitions: int | None = None,
) -> list[tuple[float, float, float]]:
    """All (order_key, value, prev_value) triples violating monotonicity of
    ``column`` along ``order_by``, at any scale. Returns the collected list
    (violations of a mostly-monotonic column are few by assumption; for a
    wholly unsorted column use the count form of the map condition
    instead)."""
    spark = df.sparkSession
    p = n_partitions or spark.sparkContext.defaultParallelism * 4
    base = (
        df.select(
            F.col(order_by).cast("double").alias("__ord"),
            F.col(column).cast("double").alias("__val"),
        )
        .where(F.col("__ord").isNotNull() & F.col("__val").isNotNull()
               & ~F.isnan("__val"))
    )
    rep = (
        base.repartitionByRange(p, "__ord")
        .sortWithinPartitions("__ord")
        .mapInPandas(_checker(strictly, decreasing), schema=_CHECK_SCHEMA)
    )
    rows = rep.collect()
    viol = [
        (r["order_key"], r["value"], r["prev_value"])
        for r in rows
        if r["row_kind"] == "violation"
    ]
    # boundary stitch: each non-empty partition contributed exactly two
    # bound rows (its first and last sorted row — identical for single-row
    # partitions); repartitionByRange assigns ascending key ranges to
    # ascending partition ids, so adjacency is pid order. Empty partitions
    # emitted nothing and drop out naturally.
    per_pid: dict[int, list[tuple[float, float]]] = {}
    for r in rows:
        if r["row_kind"] == "bound":
            per_pid.setdefault(r["pid"], []).append((r["order_key"], r["value"]))
    ordered = [per_pid[pid] for pid in sorted(per_pid)]
    for prev_part, next_part in zip(ordered, ordered[1:]):
        _last_ord, last_val = prev_part[1]   # (first, last) emit order
        next_ord, next_val = next_part[0]
        if decreasing:
            bad = next_val > last_val if not strictly else next_val >= last_val
        else:
            bad = next_val < last_val if not strictly else next_val <= last_val
        if bad:
            viol.append((next_ord, next_val, last_val))
    return sorted(viol)
