"""Single-scan fused validation (sparkcheck.fused) — the suite's
aggregate metrics ride a CollectMetrics node on the violation-row query.
The contract under test: EVRs bit-identical to the two-pass report, the
observe node is a predicate-pushdown barrier (downstream filters never
change observed metrics), automatic two-pass fallback when nothing is
observable, and the CheckpointRunner fused mode writes the same results/
violations/lineage as the classic persist path."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from sparkcheck import ExpectationSuite, validate_df
from sparkcheck.fused import observable_requests, validate_and_extract
from sparkcheck.metrics import MetricResolver
from sparkcheck.runner import CheckpointRunner, ParquetStore
from sparkcheck.spans import span_violations
from sparkcheck.synth import generate_docs

N_DOCS = 3000


@pytest.fixture(scope="module")
def docs(spark):
    return generate_docs(spark, N_DOCS).cache()


def _suite():
    s = ExpectationSuite("fused")
    s.add("expect_column_values_to_not_be_null", column="doc_id", mostly=0.99)
    s.add("expect_column_values_to_be_unique", column="doc_id", mostly=0.98)
    s.add(
        "expect_column_values_to_match_regex",
        column="doc_id",
        regex="^(hot[0-2]|p[0-9]{2})-[0-9]{12}$",
        mostly=0.98,
    )
    s.add("expect_table_row_count_to_be_between", min_value=1)
    return s


def _norm(report):
    return json.dumps(report, sort_keys=True, default=str)


def test_fused_report_identical_to_two_pass(spark, docs):
    for rf in ("BOOLEAN_ONLY", "BASIC"):
        ref = validate_df(docs, _suite(), result_format=rf)
        rep, rows, _ = validate_and_extract(
            docs, _suite(), span_violations, result_format=rf
        )
        assert _norm(rep) == _norm(ref)
        assert rows.count() == span_violations(docs).count()


def test_fused_report_identical_when_failing(spark, docs):
    s = ExpectationSuite("strict")
    # no mostly: seeded defects make these legitimately fail
    s.add("expect_column_values_to_not_be_null", column="doc_id")
    s.add("expect_column_values_to_match_regex", column="doc_id",
          regex="^hot0-")
    ref = validate_df(docs, s, result_format="BASIC")
    rep, _, _ = validate_and_extract(docs, s, span_violations,
                                     result_format="BASIC")
    assert ref["success"] is False
    assert _norm(rep) == _norm(ref)


def test_observe_is_pushdown_barrier(spark, docs):
    """A rows_builder that filters to (almost) nothing must not change the
    observed whole-table metrics — Catalyst never pushes predicates below
    CollectMetrics."""
    ref = validate_df(docs, _suite(), result_format="BASIC")
    rep, rows, _ = validate_and_extract(
        docs,
        _suite(),
        lambda d: d.where(F.col("doc_id") == "no-such-id").select("doc_id"),
        result_format="BASIC",
    )
    assert rows.count() == 0
    assert _norm(rep) == _norm(ref)


def test_collect_metrics_in_plan(spark, docs):
    _, rows, _ = validate_and_extract(docs, _suite(), span_violations)
    plan = rows._jdf.queryExecution().executedPlan().toString()
    assert "CollectMetrics" in plan


def test_observable_partition(spark, docs):
    """not_null/regex/row_count aggregates are observable; uniqueness
    (groupBy) and row_condition domains are not."""
    reqs = observable_requests(docs, _suite(), MetricResolver(docs))
    names = {m.name for m in reqs.values()}
    assert "map.unexpected_count" in names
    assert "table.row_count" in names

    s = ExpectationSuite("cond")
    s.add("expect_column_values_to_not_be_null", column="doc_id",
          row_condition='doc_id LIKE "hot%"', condition_parser="spark")
    reqs2 = observable_requests(docs, s, MetricResolver(docs))
    assert not reqs2  # filtered domain cannot ride the whole-table observe


def test_fallback_when_nothing_observable(spark, docs):
    s = ExpectationSuite("uo")
    s.add("expect_column_values_to_be_unique", column="doc_id", mostly=0.98)
    ref = validate_df(docs, s, result_format="BASIC")
    rep, rows, _ = validate_and_extract(docs, s, span_violations,
                                        result_format="BASIC")
    assert _norm(rep) == _norm(ref)
    assert rows.count() == span_violations(docs).count()


def test_action_result_passthrough(spark, docs, tmp_path):
    out = str(tmp_path / "violations_out")

    def act(rows):
        rows.write.mode("overwrite").parquet(out)
        return out

    rep, _, res = validate_and_extract(docs, _suite(), span_violations,
                                       action=act)
    assert res == out
    assert spark.read.parquet(out).count() == span_violations(docs).count()
    assert rep["statistics"]["evaluated_expectations"] == 4


def test_runner_fused_matches_classic(spark, docs, tmp_path):
    cls_store = ParquetStore(str(tmp_path / "classic"))
    fus_store = ParquetStore(str(tmp_path / "fused"))
    CheckpointRunner(
        spark, cls_store, n_buckets=3, violations_fn=span_violations,
        suite_violation_rows=True,
    ).run(docs, _suite(), run_id="rc")
    CheckpointRunner(
        spark, fus_store, n_buckets=3, violations_fn=span_violations,
        suite_violation_rows=True, fused=True,
    ).run(docs, _suite(), run_id="rf")

    cr = cls_store.read(spark, "results").drop("ts", "run_id")
    fr = fus_store.read(spark, "results").drop("ts", "run_id")
    key = ["partition_id", "expectation", "column"]
    assert sorted(map(tuple, cr.select(*key, "success", "element_count",
                                       "unexpected_count").collect())) == \
           sorted(map(tuple, fr.select(*key, "success", "element_count",
                                       "unexpected_count").collect()))

    cv = cls_store.read(spark, "violations")
    fv = fus_store.read(spark, "violations")
    vkey = lambda r: (r["partition_id"], r["doc_id"] or "",  # noqa: E731
                      str(r["span_index"]), r["expectation"])
    assert sorted(map(vkey, cv.collect())) == sorted(map(vkey, fv.collect()))

    # lineage doc counts agree with corpus size on both paths
    for store in (cls_store, fus_store):
        total = (store.read(spark, "lineage").where("metric = 'doc_count'")
                 .agg(F.sum("value").alias("s")).collect()[0]["s"])
        assert int(total) == N_DOCS


def test_runner_fused_resume(spark, docs, tmp_path):
    store = ParquetStore(str(tmp_path / "fres"))
    runner = CheckpointRunner(spark, store, n_buckets=4,
                              violations_fn=span_violations, fused=True)
    with pytest.raises(RuntimeError, match="injected failure"):
        runner.run(docs, _suite(), run_id="r1", fail_after=2)
    assert len(store.committed_partitions("r1")) == 2
    report = runner.run(docs, _suite(), run_id="r1")
    assert len(report.partitions_skipped) == 2
    assert len(report.partitions_run) == 2
    results = store.read(spark, "results")
    dupes = (results.groupBy("partition_id", "expectation")
             .count().where("count > 1"))
    assert dupes.count() == 0
    assert results.select("partition_id").distinct().count() == 4


def test_runner_fused_profile_states(spark, docs, tmp_path):
    # the fused (single-scan) leg also persists per-partition states;
    # corpus_profile == full rescan through the fused runner API
    store = ParquetStore(str(tmp_path / "fstates"))
    nd = docs.withColumn("n_spans", F.size("spans"))
    runner = CheckpointRunner(
        spark, store, n_buckets=4, violations_fn=span_violations,
        fused=True, profile_columns=["n_spans"],
    )
    runner.run(nd, _suite(), run_id="r1")
    merged = runner.corpus_profile("r1").collect()[0]
    direct = nd.agg(F.count("n_spans").alias("n"), F.avg("n_spans").alias("m"),
                    F.stddev_samp("n_spans").alias("s")).collect()[0]
    assert merged["n"] == direct["n"] == N_DOCS
    assert merged["mean"] == pytest.approx(direct["m"], abs=1e-6)
    assert merged["stddev_samp"] == pytest.approx(direct["s"], abs=1e-6)
    assert store.read(spark, "column_states").count() == 4
