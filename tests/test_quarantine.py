"""Row-level quarantine: single-projection valid/invalid suite split."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkcheck import ExpectationSuite
from sparkcheck.quarantine import FAILED_COL, quarantine, tag_failures


@pytest.fixture(scope="module")
def toy(spark):
    rows = [
        # id, code, score, a, b
        (1, "AA", 10.0, 1, 2),
        (2, "BB", 20.0, 2, 3),
        (3, None, 30.0, 3, 4),      # null code
        (4, "ZZ", 40.0, 4, 5),      # code not in set
        (5, "AA", -1.0, 5, 6),      # score below range
        (6, "BB", 25.0, 9, 1),      # a > b violation
        (7, "CC", 5.0, 7, 8),
        (7, "CC", 6.0, 8, 9),       # duplicate id (both rows quarantined)
    ]
    return spark.createDataFrame(rows, "id int, code string, score double, a int, b int")


def _suite():
    s = ExpectationSuite("quar")
    s.add("expect_column_values_to_not_be_null", column="code")
    s.add("expect_column_values_to_be_in_set", column="code", value_set=["AA", "BB", "CC"])
    s.add("expect_column_values_to_be_between", column="score", min_value=0, max_value=100)
    s.add("expect_column_pair_values_a_to_be_greater_than_b",
          column_A="b", column_B="a")
    s.add("expect_column_values_to_be_unique", column="id")
    # aggregate expectation: no per-row meaning, silently skipped
    s.add("expect_column_mean_to_be_between", column="score", min_value=-100, max_value=100)
    return s


def test_split_rows_and_labels(toy, spark):
    res = quarantine(toy, _suite())
    valid_ids = sorted(r.id for r in res.valid.collect())
    assert valid_ids == [1, 2]
    bad = {r.id: sorted(r[FAILED_COL]) for r in res.quarantined.collect()}
    assert set(bad) == {3, 4, 5, 6, 7}
    assert bad[3] == ["expect_column_values_to_not_be_null:code"]
    assert bad[4] == ["expect_column_values_to_be_in_set:code"]
    assert bad[5] == ["expect_column_values_to_be_between:score"]
    assert bad[6] == ["expect_column_pair_values_a_to_be_greater_than_b:b,a"]
    # both duplicate-id rows flagged
    assert bad[7] == ["expect_column_values_to_be_unique:id"]
    assert res.quarantined.filter(F.col("id") == 7).count() == 2
    # valid keeps the input schema exactly
    assert res.valid.columns == toy.columns


def test_valid_plus_quarantined_partition_input(toy):
    res = quarantine(toy, _suite())
    assert res.valid.count() + res.quarantined.count() == toy.count()


def test_skips_are_reported_not_fatal(toy):
    s = _suite()
    s.add("expect_column_values_to_be_increasing", column="score")
    res = quarantine(toy, s)
    assert any("increasing" in k for k in res.skipped)
    # order-dependent check did not change the split
    assert res.valid.count() == 2


def test_arrow_rowlocal_conditions_route_not_skip(spark):
    """Pandas-UDF map conditions whose masks are row-local (media decode,
    json schema, dateutil) must ROUTE rows to quarantine, not be skipped
    with the window-dependence excuse — their verdict depends on the row
    alone."""
    import numpy as np

    from sparkcheck import ExpectationSuite
    from sparkcheck.media import encode_png

    png = bytearray(encode_png(np.zeros((4, 4, 3), np.uint8)))
    rows = [
        (1, png, '{"a": 1}'),
        (2, bytearray(b"not-media"), '{"a": 2}'),
        (3, png, "not json"),
    ]
    df = spark.createDataFrame(rows, "id long, payload binary, j string")
    s = ExpectationSuite("rowlocal")
    s.add("expect_column_values_to_be_media_decodable", column="payload")
    s.add("expect_column_values_to_match_json_schema", column="j",
          json_schema={"type": "object", "required": ["a"]})
    res = quarantine(df, s)
    assert res.skipped == {}
    assert sorted(r.id for r in res.valid.collect()) == [1]
    bad = {r.id: sorted(r[FAILED_COL]) for r in res.quarantined.collect()}
    assert bad[2] == ["expect_column_values_to_be_media_decodable:payload"]
    assert bad[3] == ["expect_column_values_to_match_json_schema:j"]


def test_row_condition_scopes_the_check(toy):
    s = ExpectationSuite("scoped")
    s.add(
        "expect_column_values_to_be_between",
        column="score",
        min_value=0,
        row_condition="code = 'AA'",
        condition_parser="spark",
    )
    res = quarantine(toy, s)
    # only id=5 (code AA, score -1) violates; id 3/4 etc. out of scope
    assert sorted(r.id for r in res.quarantined.collect()) == [5]


def test_two_stage_zscore_resolves_stats(toy):
    s = ExpectationSuite("z")
    s.add(
        "expect_column_value_z_scores_to_be_less_than",
        column="score",
        threshold=1e9,
        double_sided=True,
    )
    res = quarantine(toy, s)
    # threshold is huge: nothing quarantined, nothing skipped, no crash
    assert res.quarantined.count() == 0
    assert res.skipped == {}


def test_tag_failures_single_projection(toy):
    tagged, skipped = tag_failures(toy, _suite())
    assert FAILED_COL in tagged.columns
    clean = tagged.filter(F.size(FAILED_COL) == 0).count()
    assert clean == 2
    # plan shape: no Exchange beyond the uniqueness dup-key agg/broadcast
    plan = tagged._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_compound_unique_quarantine(spark):
    df = spark.createDataFrame(
        [(1, "x"), (1, "x"), (2, "y"), (3, None), (3, None)],
        "k int, v string",
    )
    s = ExpectationSuite("cu")
    s.add("expect_compound_columns_to_be_unique", column_list=["k", "v"])
    res = quarantine(df, s)
    # (1,x) pair duplicated -> 2 rows; (3,NULL) grouped null-safe -> 2 rows
    assert res.quarantined.count() == 4
    assert res.valid.count() == 1


def test_write_quarantine_single_pass_partitioned(toy, spark, tmp_path):
    from sparkcheck.quarantine import write_quarantine

    path = str(tmp_path / "routed")
    skipped = write_quarantine(toy, _suite(), path)
    assert skipped == {}
    # partition values read back as strings (Spark only infers
    # numeric/date partition types)
    good = spark.read.parquet(path).where(F.col("is_valid") == "true")
    bad = spark.read.parquet(path).where(F.col("is_valid") == "false")
    assert sorted(r.id for r in good.collect()) == [1, 2]
    assert bad.count() == 6
    # partition pruning: reading the valid side scans one partition dir
    import os
    assert sorted(
        d for d in os.listdir(path) if d.startswith("is_valid=")
    ) == ["is_valid=false", "is_valid=true"]


def test_stream_tag_failures_rate_source(spark, tmp_path):
    import time

    from sparkcheck.quarantine import stream_tag_failures

    s = ExpectationSuite("sq")
    s.add("expect_column_values_to_be_between", column="value",
          min_value=0, max_value=3)
    s.add("expect_column_values_to_be_unique", column="value")
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", "100").load()
        .select((F.col("value") % 10).alias("value"))
    )
    tagged, skipped = stream_tag_failures(stream, s)
    assert any("unique" in k for k in skipped)
    q = (tagged.writeStream.format("memory").queryName("quar_stream")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(processingTime="1 seconds").start())
    try:
        deadline = time.time() + 30
        while time.time() < deadline:
            n = spark.sql("select count(*) n from quar_stream").collect()[0].n
            if n >= 20:
                break
            time.sleep(1)
        rows = spark.sql(
            f"select value, {FAILED_COL} as f from quar_stream"
        ).collect()
        assert len(rows) >= 20
        for r in rows:
            if r.value > 3:
                assert r.f == ["expect_column_values_to_be_between:value"]
            else:
                assert r.f == []
    finally:
        q.stop()


def test_high_dup_rate_no_forced_broadcast(spark):
    # >=50% duplicated keys: the dup-key frame's size is data-dependent, so
    # the join is NOT hint-forced — with broadcast disabled the plan must
    # degrade to a shuffled join (no OOM-prone forced BroadcastHashJoin)
    # and still produce the right split
    rows = [(i % 500, i) for i in range(2000)]  # every key appears 4x
    df = spark.createDataFrame(rows, "k int, v int")
    s = ExpectationSuite("hd")
    s.add("expect_column_values_to_be_unique", column="k")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        tagged, _ = tag_failures(df, s)
        plan = tagged._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan
        assert tagged.filter(F.size(FAILED_COL) > 0).count() == 2000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # with the default threshold restored, AQE is free to broadcast the
    # (now measured-small) dup-key side at runtime
    tagged2, _ = tag_failures(df, s)
    assert tagged2.filter(F.size(FAILED_COL) == 0).count() == 0


def test_run_checkpoint_partitioned_report_and_guards(spark, tmp_path, documents):
    from sparkcheck.checkpoint import run_checkpoint

    suite = {
        "expectation_suite_name": "docs_rep",
        "expectations": [
            {"expectation_type": "expect_column_values_to_not_be_null",
             "kwargs": {"column": "doc_id"}},
        ],
    }
    cfg = {
        "suite": suite,
        "batch": {"path": "/root/testdata/sf0.001/documents.parquet"},
        "store": str(tmp_path / "store"),
        "partitioned": True,
        "n_buckets": 2,
        "run_id": "ckr",
        "report": str(tmp_path / "summary.md"),
    }
    res = run_checkpoint(spark, cfg)
    assert res["success"] is True
    text = (tmp_path / "summary.md").read_text()
    assert text.startswith("# Checkpoint run ckr")
    assert "partitions: 2" in text
    # validate_df-only knobs are rejected on the partitioned path, loudly
    with pytest.raises(ValueError, match="result_format"):
        run_checkpoint(spark, {**cfg, "result_format": "COMPLETE"})


def test_empty_suite_all_valid(toy):
    res = quarantine(toy, ExpectationSuite("empty"))
    assert res.quarantined.count() == 0
    assert res.valid.count() == toy.count()



def test_run_checkpoint_single_pass(spark, tmp_path, documents):
    import json

    from sparkcheck.checkpoint import run_checkpoint

    suite_path = str(tmp_path / "suite.json")
    suite = {
        "expectation_suite_name": "docs_ck",
        "expectations": [
            {"expectation_type": "expect_column_values_to_not_be_null",
             "kwargs": {"column": "doc_id"}},
            {"expectation_type": "expect_column_values_to_be_between",
             "kwargs": {"column": "n_chars", "min_value": 0, "max_value": 10000}},
        ],
    }
    with open(suite_path, "w") as f:
        json.dump(suite, f)
    cfg = {
        "suite": suite_path,
        "batch": {"path": "/root/testdata/sf0.001/documents.parquet"},
        "store": str(tmp_path / "store"),
        "run_id": "ck1",
        "report": str(tmp_path / "out.md"),
    }
    res = run_checkpoint(spark, cfg)
    assert res["run_id"] == "ck1" and res["success"] is True
    assert (tmp_path / "out.md").read_text().startswith("#")
    # stored result is resolvable as an evaluation-parameter source
    from sparkcheck.runner import ParquetStore, resolve_validation_urn
    store = ParquetStore(str(tmp_path / "store"))
    urn = ("urn:great_expectations:validations:docs_ck:"
           "expect_column_values_to_not_be_null.result.unexpected_count")
    assert resolve_validation_urn(store, spark, urn) == 0


def test_run_checkpoint_partitioned_resume(spark, tmp_path, documents):
    from sparkcheck.checkpoint import run_checkpoint

    suite = {
        "expectation_suite_name": "docs_part",
        "expectations": [
            {"expectation_type": "expect_column_values_to_not_be_null",
             "kwargs": {"column": "doc_id"}},
        ],
    }
    cfg = {
        "suite": suite,
        "batch": {"path": "/root/testdata/sf0.001/documents.parquet"},
        "store": str(tmp_path / "store"),
        "partitioned": True,
        "n_buckets": 4,
        "run_id": "ckp",
    }
    res = run_checkpoint(spark, cfg)
    assert res["success"] is True
    assert res["result"]["partitions"] == 4
    # re-run same run_id: everything already committed
    res2 = run_checkpoint(spark, cfg)
    assert res2["result"]["skipped_committed"] == 4
    assert res2["result"]["partitions"] == 0
