"""history.metric_history / anomalous_runs and diffing.schema_diff."""

from sparkcheck import history
from sparkcheck.diffing import schema_diff
from sparkcheck.runner import ParquetStore, store_validation_result
from sparkcheck.suite import ExpectationConfiguration, ExpectationSuite
from sparkcheck.validator import validate_df


def _mean_suite():
    return ExpectationSuite(
        name="means",
        expectations=[ExpectationConfiguration.from_dict({
            "expectation_type": "expect_column_mean_to_be_between",
            "kwargs": {"column": "v", "min_value": -1e9, "max_value": 1e9},
        })],
    )


def test_metric_history_and_anomaly(spark, tmp_path):
    store = ParquetStore(str(tmp_path / "store"))
    # 8 stable runs around mean=10, then one wildly shifted run
    series = [10.0, 10.2, 9.9, 10.1, 10.0, 9.8, 10.2, 10.0, 50.0]
    for i, m in enumerate(series):
        df = spark.createDataFrame(
            [(m - 0.1,), (m,), (m + 0.1,)], "v double")
        rep = validate_df(df, _mean_suite())
        store_validation_result(store, spark, rep,
                                suite_name="means", run_id=f"r{i}")

    h = history.metric_history(
        store, spark, "means", "expect_column_mean_to_be_between")
    vals = {r["run_id"]: r["value"] for r in h.collect()}
    assert len(vals) == 9
    assert abs(vals["r0"] - 10.0) < 1e-9 and abs(vals["r8"] - 50.0) < 1e-9

    flagged = history.anomalous_runs(h, k=3.0, min_history=5).collect()
    by_run = {r["run_id"]: r for r in flagged}
    assert by_run["r8"]["is_anomaly"] is True
    assert all(not by_run[f"r{i}"]["is_anomaly"] for i in range(8))
    # early runs aren't flagged for lack of history
    assert by_run["r1"]["n_prior"] == 1 and by_run["r1"]["is_anomaly"] is False


def test_metric_history_column_filter(spark, tmp_path):
    store = ParquetStore(str(tmp_path / "store"))
    suite = ExpectationSuite(
        name="two_cols",
        expectations=[
            ExpectationConfiguration.from_dict({
                "expectation_type": "expect_column_mean_to_be_between",
                "kwargs": {"column": c, "min_value": -1e9, "max_value": 1e9},
            }) for c in ("a", "b")
        ],
    )
    df = spark.createDataFrame([(1.0, 100.0), (3.0, 300.0)],
                               "a double, b double")
    rep = validate_df(df, suite)
    store_validation_result(store, spark, rep, suite_name="two_cols",
                            run_id="r0")
    ha = history.metric_history(
        store, spark, "two_cols", "expect_column_mean_to_be_between",
        column="a").collect()
    hb = history.metric_history(
        store, spark, "two_cols", "expect_column_mean_to_be_between",
        column="b").collect()
    assert [r["value"] for r in ha] == [2.0]
    assert [r["value"] for r in hb] == [200.0]


def test_schema_diff(spark):
    old = spark.createDataFrame([(1, "x", 1.0)], "k long, s string, v double")
    new = spark.createDataFrame([(1, "x", 2, 0.5)],
                                "k long, s string, v int, extra double")
    d = schema_diff(old, new)
    assert d["added"] == [("extra", "double")]
    assert d["removed"] == []
    assert d["type_changed"] == [("v", "double", "int")]
    # identical schemas -> empty diff
    same = schema_diff(old.schema, old.schema)
    assert same == {"added": [], "removed": [], "type_changed": []}


def test_all_metric_history_multi_series_one_pass(spark, tmp_path):
    from sparkcheck.history import all_metric_history, anomalous_runs

    store = ParquetStore(str(tmp_path / "store"))
    suite = ExpectationSuite(
        name="multi",
        expectations=[
            ExpectationConfiguration.from_dict({
                "expectation_type": "expect_column_mean_to_be_between",
                "kwargs": {"column": c, "min_value": -1e9, "max_value": 1e9},
            }) for c in ("a", "b")
        ],
    )
    # column a is stable; column b jumps on the last run
    for i, (ma, mb) in enumerate(
            [(1.0, 10.0), (1.0, 10.1), (1.0, 9.9), (1.0, 10.0),
             (1.0, 10.05), (1.0, 9.95), (1.0, 99.0)]):
        df = spark.createDataFrame([(ma, mb), (ma, mb)], "a double, b double")
        rep = validate_df(df, suite)
        store_validation_result(store, spark, rep, suite_name="multi",
                                run_id=f"r{i}")
    h = all_metric_history(store, spark)
    flagged = anomalous_runs(
        h, k=3.0, min_history=4,
        series_cols=["suite_name", "expectation", "column"]).collect()
    anomalies = {(r["column"], r["run_id"]) for r in flagged if r["is_anomaly"]}
    assert anomalies == {("b", "r6")}  # only b's jump flags; a never does
