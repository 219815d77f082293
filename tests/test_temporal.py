"""Unit tests for sparkcheck.temporal (sessionization + as-of join)."""

from datetime import datetime, timedelta

from sparkcheck import temporal

SCHEMA = "event_id long, user_id long, ts timestamp, value double"


def _ts(m, s=0, us=0):
    return datetime(2024, 1, 1) + timedelta(minutes=m, seconds=s, microseconds=us)


def test_sessionize_gap_split(spark):
    rows = [
        (1, 7, _ts(0), 1.0),
        (2, 7, _ts(10), 1.0),      # 10 min gap -> same session
        (3, 7, _ts(50), 1.0),      # 40 min gap -> new session
        (4, 8, _ts(0), 1.0),       # other user: own session numbering
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {
        r["event_id"]: (r["session_index"], r["session_id"])
        for r in temporal.sessionize(df, gap_seconds=1800).collect()
    }
    assert got == {1: (1, "7-1"), 2: (1, "7-1"), 3: (2, "7-2"), 4: (1, "8-1")}


def test_sessionize_gap_boundary_exclusive(spark):
    # gap == threshold exactly -> SAME session (strictly-greater splits)
    rows = [(1, 7, _ts(0), 1.0), (2, 7, _ts(30), 1.0), (3, 7, _ts(60, 0, 1), 1.0)]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {r["event_id"]: r["session_index"]
           for r in temporal.sessionize(df, gap_seconds=1800).collect()}
    assert got == {1: 1, 2: 1, 3: 2}  # 30:00.000001 gap > 1800s splits


def test_session_summary(spark):
    rows = [
        (1, 7, _ts(0), 2.0),
        (2, 7, _ts(5), 3.0),
        (3, 7, _ts(59), 10.0),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {
        (r["user_id"], r["session_index"]): (
            r["n_events"], r["duration_us"], r["total_value"])
        for r in temporal.session_summary(df, value_col="value").collect()
    }
    assert got == {(7, 1): (2, 300_000_000, 5.0), (7, 2): (1, 0, 10.0)}


def test_asof_join_backward_inclusive(spark):
    left = spark.createDataFrame(
        [(1, 7, _ts(10), 0.0), (2, 7, _ts(20), 0.0), (3, 7, _ts(5), 0.0),
         (4, 9, _ts(10), 0.0)],
        SCHEMA,
    )
    right = spark.createDataFrame(
        [(100, 7, _ts(10), 5.5), (101, 7, _ts(15), 7.5)], SCHEMA
    )
    out = temporal.asof_join(
        left, right, "user_id", "ts", ("value",), right_tiebreak="event_id"
    )
    got = {r["event_id"]: (r["asof_ts_us"], r["asof_value"]) for r in out.collect()}
    ts10 = 1704067800000000  # 2024-01-01T00:10:00Z epoch micros
    ts15 = ts10 + 300_000_000
    # event 1 at :10 matches the :10 purchase (inclusive); event 2 at :20
    # matches :15; event 3 at :05 precedes everything; user 9 has no rights
    assert got == {1: (ts10, 5.5), 2: (ts15, 7.5), 3: (None, None),
                   4: (None, None)}
    # left columns survive untouched
    assert set(out.columns) == {"event_id", "user_id", "ts", "value",
                                "asof_ts_us", "asof_value"}


def test_asof_join_tolerance_and_tiebreak(spark):
    left = spark.createDataFrame([(1, 7, _ts(30), 0.0)], SCHEMA)
    right = spark.createDataFrame(
        [(100, 7, _ts(0), 1.0), (101, 7, _ts(0), 2.0)], SCHEMA
    )
    # same-ts right rows: highest tiebreak (event_id 101) wins
    out = temporal.asof_join(
        left, right, "user_id", "ts", ("value",), right_tiebreak="event_id"
    ).collect()[0]
    assert out["asof_value"] == 2.0
    # 30-minute-old match dropped under a 10-minute tolerance
    out2 = temporal.asof_join(
        left, right, "user_id", "ts", ("value",),
        right_tiebreak="event_id", tolerance_seconds=600,
    ).collect()[0]
    assert out2["asof_value"] is None and out2["asof_ts_us"] is None


def test_asof_join_single_shuffle(spark):
    left = spark.createDataFrame([(1, 7, _ts(1), 0.0)], SCHEMA)
    right = spark.createDataFrame([(2, 7, _ts(0), 1.0)], SCHEMA)
    plan = temporal.asof_join(
        left, right, "user_id", "ts", ("value",)
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_freshness_probe(spark):
    from sparkcheck.temporal import freshness

    df = spark.createDataFrame(
        [("2024-01-30 23:00:00",), ("2024-01-29 00:00:00",)], "ts string"
    ).selectExpr("to_timestamp(ts) as ts")
    r = freshness(df, "ts", as_of="2024-01-31 00:00:00").collect()[0]
    assert abs(r.lag_seconds - 3600.0) < 1e-6


def test_expect_column_max_to_be_recent(spark):
    from sparkcheck import ExpectationSuite, validate_df

    df = spark.createDataFrame(
        [("2024-01-30 23:00:00",), (None,)], "ts string"
    ).selectExpr("to_timestamp(ts) as ts")
    s = ExpectationSuite("fresh")
    s.add("expect_column_max_to_be_recent", column="ts",
          max_age_seconds=7200, as_of="2024-01-31T00:00:00")
    r = validate_df(df, s, result_format="SUMMARY")
    evr = r["results"][0]
    assert evr["success"] is True
    assert abs(evr["result"]["details"]["lag_seconds"] - 3600.0) < 1e-6

    s2 = ExpectationSuite("stale")
    s2.add("expect_column_max_to_be_recent", column="ts",
           max_age_seconds=60, as_of="2024-01-31T00:00:00")
    assert validate_df(df, s2)["success"] is False

    # all-null column: fails cleanly, no crash
    empty = spark.createDataFrame([(None,)], "x string").selectExpr(
        "to_timestamp(x) as ts")
    s3 = ExpectationSuite("nulls")
    s3.add("expect_column_max_to_be_recent", column="ts",
           max_age_seconds=60, as_of="2024-01-31T00:00:00")
    out = validate_df(empty, s3, result_format="SUMMARY")
    assert out["success"] is False
