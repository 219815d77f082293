"""Temporal operators for event streams: gap sessionization and as-of joins.

Both are classic large-scale primitives the DataFrame API lacks as
built-ins, expressed here as single-shuffle window compositions:

- ``sessionize`` / ``session_summary``: split each key's event sequence
  into sessions wherever the inter-event gap exceeds a threshold. One hash
  shuffle on the key column; everything after is a sorted within-partition
  walk (lag + running sum), so cost is O(events log events-per-key) with no
  state beyond the sort. At 100 TB the shuffle partitions by user/device
  key — high cardinality, naturally balanced; a single pathological hot key
  degrades only its own partition and can be pre-split by salting the key
  upstream if needed (sessions never cross keys, but salted sub-streams
  must then be re-stitched, so prefer AQE skew handling first).

- ``asof_join``: for every left row, attach the most recent right row with
  the same key and order value <= the left's (backward, inclusive). The
  naive formulation is a range join (quadratic blow-up per key); this one
  is the union trick: tag both sides, union, sort each key by
  (order, side), and carry the last non-null right payload forward with a
  window ``last(ignorenulls)``. ONE shuffle, zero row amplification,
  AQE-friendly — the same plan shape Flink/kdb use for temporal joins.

All timestamp arithmetic is done in integer epoch-microseconds
(``unix_micros`` here, ``epoch_us`` in the DuckDB oracle) so engines agree
bit-for-bit with no float time math.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_GAP_SECONDS = 1800


def _us(col: str | Column) -> Column:
    # cast handles TIMESTAMP_NTZ parquet columns (identity for TIMESTAMP);
    # with the session timezone pinned to UTC this matches DuckDB epoch_us
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def sessionize(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = DEFAULT_GAP_SECONDS,
    order_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Append ``session_index`` (1-based per key) and ``session_id``
    (``<key>-<index>``) to every event. A new session starts at the first
    event of a key and whenever ts - previous ts > gap_seconds.

    ``order_cols`` breaks ordering ties among equal timestamps (pass the
    event id for full determinism when timestamps can collide).
    """
    order = [F.col(ts_col)] + [F.col(c) for c in order_cols]
    w = Window.partitionBy(key_col).orderBy(*order)
    ts_us = _us(ts_col)
    prev_us = F.lag(ts_us).over(w)
    is_new = (
        prev_us.isNull() | (ts_us - prev_us > gap_seconds * 1_000_000)
    ).cast("int")
    sess_idx = F.sum(is_new).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return events.withColumn("session_index", sess_idx.cast("int")).withColumn(
        "session_id",
        F.concat_ws("-", F.col(key_col).cast("string"),
                    F.col("session_index").cast("string")),
    )


def session_summary(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = DEFAULT_GAP_SECONDS,
    value_col: str | None = None,
    order_cols: tuple[str, ...] = (),
) -> DataFrame:
    """One row per session: (key, session_index, n_events, start_us,
    end_us, duration_us [, total_value rounded 4dp]). The groupBy reuses
    the sessionize shuffle's partitioning (same key prefix), so Catalyst
    plans a single Exchange for the whole pipeline."""
    s = sessionize(events, key_col, ts_col, gap_seconds, order_cols)
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.min(_us(ts_col)).alias("start_us"),
        F.max(_us(ts_col)).alias("end_us"),
        (F.max(_us(ts_col)) - F.min(_us(ts_col))).alias("duration_us"),
    ]
    if value_col is not None:
        aggs.append(F.round(F.sum(value_col), 4).alias("total_value"))
    return s.groupBy(key_col, "session_index").agg(*aggs)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    order_col: str,
    value_cols: tuple[str, ...],
    prefix: str = "asof_",
    right_tiebreak: str | None = None,
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Backward inclusive as-of join: every left row gains
    ``<prefix><order_col>`` (the matched right row's order value) and
    ``<prefix><c>`` for each value column, all NULL when no right row at or
    before it exists (or the match is older than ``tolerance_seconds``).

    Equivalent to DuckDB/pandas ``ASOF LEFT JOIN`` on
    (key equal, left.order >= right.order). Among right rows sharing the
    exact same (key, order) the one with the highest ``right_tiebreak``
    wins (pass one whenever right order values can collide).

    Single shuffle, no row amplification: both sides are unioned with a
    side tag, sorted per key by (order, side_tag) — right rows sort before
    left rows at equal order values, which is what makes the join
    inclusive — and a ``last(payload, ignorenulls)`` window carries the
    latest right payload onto each left row.
    """
    payload = F.struct(
        _us(order_col).alias("__o_us"),
        *[F.col(c).alias(c) for c in value_cols],
    )
    payload_type = right.select(payload.alias("p")).schema["p"].dataType

    order_keys = ["__o_us", "__side"] + (["__tie"] if right_tiebreak else [])
    l2 = left.select(
        F.col(key_col).alias("__k"),
        _us(order_col).alias("__o_us"),
        F.lit(1).alias("__side"),
        *([F.lit(None).cast("long").alias("__tie")] if right_tiebreak else []),
        F.struct(*[F.col(c) for c in left.columns]).alias("__row"),
        F.lit(None).cast(payload_type).alias("__p"),
    )
    r2 = right.select(
        F.col(key_col).alias("__k"),
        _us(order_col).alias("__o_us"),
        F.lit(0).alias("__side"),
        *([F.col(right_tiebreak).cast("long").alias("__tie")]
          if right_tiebreak else []),
        F.lit(None).cast(l2.schema["__row"].dataType).alias("__row"),
        payload.alias("__p"),
    )
    w = Window.partitionBy("__k").orderBy(*order_keys).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    filled = l2.unionByName(r2).withColumn(
        "__last_p", F.last("__p", ignorenulls=True).over(w)
    ).where(F.col("__side") == 1)

    match = F.col("__last_p")
    if tolerance_seconds is not None:
        match = F.when(
            F.col("__o_us") - F.col("__last_p.__o_us")
            <= tolerance_seconds * 1_000_000,
            F.col("__last_p"),
        )
    out_cols = [F.col(f"__row.{c}").alias(c) for c in left.columns]
    out_cols.append(match["__o_us"].alias(f"{prefix}{order_col}_us"))
    out_cols.extend(match[c].alias(f"{prefix}{c}") for c in value_cols)
    return filled.select(*out_cols)


def freshness(df, ts_col: str, as_of=None):
    """One-row freshness probe: (max_ts, lag_seconds vs ``as_of``).
    ``as_of`` is an ISO string / datetime; defaults to the current UTC
    time. One fused aggregate, no shuffle beyond the agg itself."""
    from pyspark.sql import functions as F

    ref = (
        F.current_timestamp()
        if as_of is None
        else F.to_timestamp(F.lit(str(as_of)))
    )

    def _epoch(c):
        # TIMESTAMP_NTZ refuses a direct double cast; route through
        # TIMESTAMP (session tz = UTC in this engine's sessions)
        return c.cast("timestamp").cast("double")

    return df.agg(
        F.max(ts_col).alias("max_ts"),
        (_epoch(ref) - _epoch(F.max(ts_col))).alias("lag_seconds"),
    )


class FreshnessExpectation:
    """expect_column_max_to_be_recent(column=..., max_age_seconds=...,
    as_of=None): success iff the newest value in ``column`` is within
    ``max_age_seconds`` of ``as_of`` (default: now, UTC) — the "did
    yesterday's load actually land?" check. The max rides the fused
    column.max metric, so a suite holding this plus other aggregates
    still makes ONE pass. No direct reference analog
    (expect_column_max_to_be_between + evaluation-parameter now()
    arithmetic approximates it); registered as a sparkcheck extension."""

    name = "expect_column_max_to_be_recent"
    condition_name = None

    def _metric_cfg(self, cfg):
        from .expectations import build_domain
        from .metrics import MetricConfiguration

        return MetricConfiguration("column.max", build_domain(cfg))

    def metric_requests(self, cfg, rf):
        return {"max": self._metric_cfg(cfg)}

    def stage2_requests(self, cfg, rf, resolver):
        return {}

    def validate(self, cfg, rf, resolver):
        from datetime import datetime, timezone

        max_age = float(cfg.get("max_age_seconds"))
        as_of = cfg.get("as_of")
        if as_of is None:
            ref = datetime.now(timezone.utc).replace(tzinfo=None)
        elif isinstance(as_of, datetime):
            ref = as_of
        else:
            ref = datetime.fromisoformat(str(as_of))
        observed = resolver[self._metric_cfg(cfg)]
        if observed is None:
            ret = {"success": False}
            if rf["result_format"] != "BOOLEAN_ONLY":
                ret["result"] = {"observed_value": None,
                                 "details": {"reason": "no non-null values"}}
            return ret
        lag = (ref - observed).total_seconds()
        ret = {"success": lag <= max_age}
        if rf["result_format"] != "BOOLEAN_ONLY":
            ret["result"] = {
                "observed_value": observed.isoformat(),
                "details": {"lag_seconds": lag, "as_of": ref.isoformat()},
            }
        return ret


def _register_freshness():
    from .expectations import register_expectation

    register_expectation(FreshnessExpectation())


_register_freshness()
