"""Tests for sources (splitters/samplers/readers), statistical tests,
cross-table / SQL-query expectations, pandas-UDF conditions, and
evaluation parameters."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sparkcheck import (
    ExpectationConfiguration,
    ExpectationSuite,
    sources,
    validate_df,
)
from sparkcheck.referential import register_table
from sparkcheck.stats import chi2_sf, ks_p_value, norm_cdf


def _suite(*cfgs):
    return ExpectationSuite(
        "t", [ExpectationConfiguration.from_dict(d) for d in cfgs]
    )


def _one(df, cfg, **kw):
    rep = validate_df(df, _suite(cfg), **kw)
    return rep["results"][0]


# --- sources ---------------------------------------------------------------


def test_splitters_and_samplers(spark, orders):
    assert sources.guess_format_from_path("/a/b.parquet") == "parquet"
    assert sources.guess_format_from_path("x.tsv") == "csv"
    with pytest.raises(ValueError):
        sources.guess_format_from_path("x.unknown")

    n = orders.count()
    y = sources.split_on_year(orders, "o_orderdate", 1996).count()
    assert 0 < y < n
    parts = sum(
        sources.split_on_date_parts(orders, "o_orderdate", {"year": yy}).count()
        for yy in range(1995, 2002)
    )
    assert parts == n  # year splits partition the table

    m0 = sources.split_on_mod_integer(orders, "o_orderkey", 4, 0)
    m_all = sum(
        sources.split_on_mod_integer(orders, "o_orderkey", 4, i).count()
        for i in range(4)
    )
    assert m_all == n
    assert m0.count() > 0

    h_all = sum(
        sources.split_on_hashed_column(orders, "o_orderkey", 8, b).count()
        for b in range(8)
    )
    assert h_all == n

    assert sources.sample_using_limit(orders, 10).count() == 10
    assert sources.sample_using_a_list(orders, "o_orderstatus", ["P"]).count() > 0
    s1 = sources.sample_using_hash(orders, "o_orderkey", 10, 3)
    assert s1.count() == sources.sample_using_hash(orders, "o_orderkey", 10, 3).count()


def test_read_batch_parquet(spark):
    df = sources.read_batch(spark, path="/root/testdata/sf0.001/orders.parquet")
    assert df.count() > 0


# --- stats special functions vs known values -------------------------------


def test_chi2_sf_known_values():
    # chi2 sf(3.84, 1) ~ 0.05; sf(0, k) = 1
    assert chi2_sf(3.841, 1) == pytest.approx(0.05, abs=1e-3)
    assert chi2_sf(0.0, 5) == pytest.approx(1.0)
    assert chi2_sf(100.0, 2) < 1e-10


def test_ks_p_value_known():
    assert ks_p_value(0.0, 100) == 1.0
    assert 0 < ks_p_value(0.2, 100) < 0.01
    assert ks_p_value(0.05, 100) > 0.5


def test_norm_cdf():
    assert norm_cdf(0.0) == pytest.approx(0.5)
    assert norm_cdf(1.96) == pytest.approx(0.975, abs=1e-3)


# --- statistical expectations ----------------------------------------------


def test_chisquare_expectation(spark):
    # 1000 rows matching the expected weights closely -> high p-value
    df = spark.range(1000).select(
        F.when(F.col("id") % 2 == 0, "a").otherwise(
            F.when(F.col("id") % 4 == 1, "b").otherwise("c")
        ).alias("c")
    )
    r = _one(df, {
        "expectation_type": "expect_column_chisquare_test_p_value_to_be_greater_than",
        "kwargs": {"column": "c",
                   "partition_object": {"values": ["a", "b", "c"],
                                        "weights": [0.5, 0.25, 0.25]},
                   "p": 0.05}})
    assert r["success"], r
    # grossly wrong expected weights -> tiny p-value
    r2 = _one(df, {
        "expectation_type": "expect_column_chisquare_test_p_value_to_be_greater_than",
        "kwargs": {"column": "c",
                   "partition_object": {"values": ["a", "b", "c"],
                                        "weights": [0.05, 0.05, 0.9]},
                   "p": 0.05}})
    assert not r2["success"]


def test_kstest_expectation(spark):
    # uniform data vs uniform hypothesis -> pass; vs wrong normal -> fail
    df = spark.range(20000).select(((F.col("id") + 0.5) / 20000).alias("x"))
    r = _one(df, {
        "expectation_type":
            "expect_column_parameterized_distribution_ks_test_p_value_to_be_greater_than",
        "kwargs": {"column": "x", "distribution": "uniform",
                   "params": {"min": 0.0, "max": 1.0}, "p": 0.05,
                   "exact": True}})
    assert r["success"], r
    r2 = _one(df, {
        "expectation_type":
            "expect_column_parameterized_distribution_ks_test_p_value_to_be_greater_than",
        "kwargs": {"column": "x", "distribution": "norm",
                   "params": {"mean": 5.0, "std": 1.0}, "p": 0.05,
                   "exact": True}})
    assert not r2["success"]


def test_cramers_phi_expectation(spark):
    # perfectly dependent pair -> phi ~ 1 -> fails threshold 0.5
    dep = spark.range(400).select(
        (F.col("id") % 4).alias("a"), (F.col("id") % 4).alias("b")
    )
    r = _one(dep, {
        "expectation_type": "expect_column_pair_cramers_phi_value_to_be_less_than",
        "kwargs": {"column_A": "a", "column_B": "b", "threshold": 0.5}})
    assert not r["success"]
    assert r["result"]["observed_value"] == pytest.approx(1.0, abs=1e-6)
    # independent pair -> phi ~ 0 -> passes
    ind = spark.range(4000).select(
        (F.col("id") % 4).alias("a"), ((F.col("id") / 4).cast("long") % 4).alias("b")
    )
    r2 = _one(ind, {
        "expectation_type": "expect_column_pair_cramers_phi_value_to_be_less_than",
        "kwargs": {"column_A": "a", "column_B": "b", "threshold": 0.1}})
    assert r2["success"], r2


def test_cramers_phi_crosstab_max_groups_cap(spark):
    # a high-cardinality pair must error cleanly, not collect the full
    # contingency table to the driver
    df = spark.range(5000).select(F.col("id").alias("a"), F.col("id").alias("b"))
    cfg = {
        "expectation_type": "expect_column_pair_cramers_phi_value_to_be_less_than",
        "kwargs": {"column_A": "a", "column_B": "b", "threshold": 0.5,
                   "max_groups": 1000},
    }
    from sparkcheck.validator import Validator
    with pytest.raises(ValueError, match="max_groups"):
        Validator(df).validate(_suite(cfg), catch_exceptions=False)
    # with catch_exceptions (default) the error becomes a failed EVR
    r = _one(df, cfg)
    assert not r["success"]
    assert "max_groups" in (r["exception_info"]["exception_traceback"] or "")


def test_cramers_phi_all_null_numeric_side(spark):
    # an entirely-null numeric side used to hit numpy's zero-size-array
    # error in the binning map; it now folds into "(missing)"
    df = spark.range(99).select(
        F.lit(None).cast("double").alias("a"), (F.col("id") % 3).alias("b")
    )
    r = _one(df, {
        "expectation_type": "expect_column_pair_cramers_phi_value_to_be_less_than",
        "kwargs": {"column_A": "a", "column_B": "b", "threshold": 0.5}})
    assert r["success"]
    assert r["result"]["observed_value"] == 0.0


# --- cross-table, SQL query, UDF conditions, eval params -------------------


def test_row_count_equal_other_table(spark, orders):
    register_table("orders_copy", orders)
    r = _one(orders, {
        "expectation_type": "expect_table_row_count_to_equal_other_table",
        "kwargs": {"other_table": "orders_copy"}})
    assert r["success"]


def test_sql_query_expectation(spark, orders):
    r = _one(orders, {
        "expectation_type": "expect_query_to_return_no_unexpected_rows",
        "kwargs": {"query": "SELECT * FROM {active_batch} WHERE o_totalprice < 0"}})
    assert r["success"]
    r2 = _one(orders, {
        "expectation_type": "expect_query_to_return_no_unexpected_rows",
        "kwargs": {"query": "SELECT * FROM {active_batch} WHERE o_totalprice > 0"}})
    assert not r2["success"]
    assert len(r2["result"]["partial_unexpected_list"]) > 0


def test_dateutil_parseable(spark):
    df = spark.createDataFrame(
        [("2021-03-01",), ("March 5, 2022",), ("not a date",), (None,)],
        "d string",
    )
    r = _one(df, {
        "expectation_type": "expect_column_values_to_be_dateutil_parseable",
        "kwargs": {"column": "d"}})
    assert not r["success"]
    assert r["result"]["unexpected_count"] == 1  # only 'not a date'; null ignored


def test_match_json_schema(spark):
    df = spark.createDataFrame(
        [('{"a": 1}',), ('{"b": 2}',), ("nope",), (None,)], "j string"
    )
    r = _one(df, {
        "expectation_type": "expect_column_values_to_match_json_schema",
        "kwargs": {"column": "j",
                   "json_schema": {"type": "object", "required": ["a"]}}})
    assert not r["success"]
    assert r["result"]["unexpected_count"] == 2  # {"b":2} and "nope"


def test_media_decodable_expectation(spark):
    """expect_column_values_to_be_media_decodable: a binary payload column
    validates by REALLY decoding (Arrow-batched pandas UDF over the
    pure-python codecs). Corrupt/truncated payloads and format-list
    mismatches are unexpected; NULL payloads are missing, not unexpected."""
    import numpy as np

    from sparkcheck.gif import encode_gif
    from sparkcheck.jpeg import encode_jpeg
    from sparkcheck.media import encode_png, encode_wav

    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    png = bytearray(encode_png(np.stack([img] * 3, axis=2)))
    jpg = bytearray(encode_jpeg(img))
    gif = bytearray(encode_gif(img // 32 * 32))
    wav = bytearray(encode_wav(np.zeros((100, 1), dtype=np.int16), 8000))
    truncated = bytearray(bytes(png[: len(png) // 2]))
    garbage = bytearray(b"\x00\x01\x02mp4?" * 10)
    df = spark.createDataFrame(
        [(png,), (jpg,), (gif,), (wav,), (truncated,), (garbage,), (None,)],
        "payload binary",
    )
    r = _one(df, {
        "expectation_type": "expect_column_values_to_be_media_decodable",
        "kwargs": {"column": "payload"}})
    assert not r["success"]
    assert r["result"]["unexpected_count"] == 2  # truncated + garbage

    # format restriction: only png/jpeg count -> gif and wav flip to bad
    r = _one(df, {
        "expectation_type": "expect_column_values_to_be_media_decodable",
        "kwargs": {"column": "payload", "formats": ["png", "jpeg"]}})
    assert r["result"]["unexpected_count"] == 4
    # mostly makes the mixed column pass
    r = _one(df, {
        "expectation_type": "expect_column_values_to_be_media_decodable",
        "kwargs": {"column": "payload", "mostly": 0.6}})
    assert r["success"]
    # unknown format name -> failed EVR with a loud exception, not a crash
    r = _one(df, {
        "expectation_type": "expect_column_values_to_be_media_decodable",
        "kwargs": {"column": "payload", "formats": ["tiff"]}})
    assert not r["success"] and "unknown media formats" in str(
        r["exception_info"]
    )
    # sniff-only format (mp4 has a header walk but no decoder) in FULL
    # mode -> loud failure, not silently-unexpected rows
    r = _one(df, {
        "expectation_type": "expect_column_values_to_be_media_decodable",
        "kwargs": {"column": "payload", "formats": ["mp4"]}})
    assert not r["success"] and "sniff-only" in str(r["exception_info"])
    # non-binary column -> reference-style type guard
    sdf = spark.createDataFrame([("x",)], "s string")
    r = _one(sdf, {
        "expectation_type": "expect_column_values_to_be_media_decodable",
        "kwargs": {"column": "s"}})
    assert not r["success"] and "binary" in str(r["exception_info"])

    # check="header": the O(header) scale path — structural sniff only.
    # The 60%-truncated PNG keeps an intact IHDR so the sniff passes it
    # (documented miss); garbage and a dims-lying GIF still fail.
    lying_gif = bytearray(b"GIF89a" + b"\x00\x00\x00\x00" + b"\x00\x00\x00")
    df2 = spark.createDataFrame(
        [(png,), (truncated,), (garbage,), (lying_gif,), (None,)],
        "payload binary",
    )
    r = _one(df2, {
        "expectation_type": "expect_column_values_to_be_media_decodable",
        "kwargs": {"column": "payload", "check": "header"}})
    assert r["result"]["unexpected_count"] == 2  # garbage + zero-dim GIF
    assert r["result"]["missing_count"] == 1
    r = _one(df2, {
        "expectation_type": "expect_column_values_to_be_media_decodable",
        "kwargs": {"column": "payload", "check": "full"}})
    assert r["result"]["unexpected_count"] == 3  # full decode catches truncation
    r = _one(df2, {
        "expectation_type": "expect_column_values_to_be_media_decodable",
        "kwargs": {"column": "payload", "check": "nope"}})
    assert not r["success"] and "header" in str(r["exception_info"])


def test_vector_expectations(spark):
    """Embedding-column expectations — dimension, L2 norm band, finite
    components — all JVM-side (size/aggregate/exists HOFs, no Python)."""
    import math

    rows = [
        ([3.0, 4.0],),            # norm 5, dim 2
        ([1.0, 0.0],),            # norm 1
        ([6.0, 8.0],),            # norm 10
        ([1.0, 2.0, 2.0],),       # dim 3 (wrong)
        ([float("nan"), 1.0],),   # non-finite
        ([float("inf"), 0.0],),   # non-finite
        (None,),                  # missing
    ]
    df = spark.createDataFrame(rows, "emb array<double>")

    r = _one(df, {
        "expectation_type": "expect_column_vector_lengths_to_equal",
        "kwargs": {"column": "emb", "value": 2}})
    assert r["result"]["unexpected_count"] == 1  # the dim-3 row
    assert r["result"]["missing_count"] == 1

    r = _one(df, {
        "expectation_type": "expect_column_vector_norms_to_be_between",
        "kwargs": {"column": "emb", "min_value": 1.0, "max_value": 5.0}})
    # norm 10 out of band; nan norm fails; inf norm > 5 fails; dim-3 row
    # has norm 3 -> passes
    assert r["result"]["unexpected_count"] == 3
    r = _one(df, {
        "expectation_type": "expect_column_vector_norms_to_be_between",
        "kwargs": {"column": "emb", "min_value": 1.0, "strict_min": True}})
    # strict: norm exactly 1.0 now unexpected too, and non-finite NEVER
    # passes — an Inf norm with only a min bound must still fail (sqrt of
    # an Inf sum is Inf, not NaN, so an isnan guard alone would miss it)
    assert r["result"]["unexpected_count"] == 3

    r = _one(df, {
        "expectation_type": "expect_column_vector_values_to_be_finite",
        "kwargs": {"column": "emb"}})
    assert r["result"]["unexpected_count"] == 2  # nan row + inf row
    assert math.isclose(r["result"]["unexpected_percent"], 100 * 2 / 6)


def test_evaluation_parameters(spark, orders):
    r = _one(
        orders,
        {"expectation_type": "expect_table_row_count_to_be_between",
         "kwargs": {"min_value": {"$PARAMETER": "min_rows"},
                    "max_value": {"$PARAMETER": "max_rows"}}},
        evaluation_parameters={"min_rows": 1, "max_rows": 10**9},
    )
    assert r["success"]
    # unknown parameter -> failed EVR with exception info, not a crash
    r2 = _one(
        orders,
        {"expectation_type": "expect_table_row_count_to_be_between",
         "kwargs": {"min_value": {"$PARAMETER": "nope"}}},
        evaluation_parameters={"min_rows": 1},
    )
    assert not r2["success"]
    assert r2["exception_info"]["raised_exception"]


def test_summarizer_metrics(spark, orders):
    from sparkcheck.metrics import (
        Domain,
        MetricConfiguration,
        MetricResolver,
        freeze_kwargs,
    )

    res = MetricResolver(orders)
    dom = Domain(column="o_orderstatus")
    frozen = freeze_kwargs(
        condition="column_values.in_set",
        condition_kwargs={"value_set": ["O", "F"]},
    )
    q = MetricConfiguration("map.unexpected_index_query", dom, frozen)
    vc = MetricConfiguration("map.unexpected_value_counts", dom, frozen)
    fr = MetricConfiguration("map.filtered_row_count", dom)
    head = MetricConfiguration("table.head", dom, freeze_kwargs(n_rows=3))
    res.resolve([q, vc, fr, head])
    assert res[q].startswith("df.filter(")
    counts = res[vc]
    assert counts and counts[0][0] == "P"  # only P is outside the set
    assert res[fr] == orders.count()
    assert len(res[head]) == 3 and "o_orderkey" in res[head][0]


def test_salted_anti_join_matches_broadcast(spark, orders):
    from sparkcheck.referential import anti_join_violations

    dim = spark.range(0, 2000).select(F.col("id").alias("k")).where(
        F.col("k") % 97 != 0
    )
    fact = orders.select(F.col("o_custkey").alias("k"))
    bc = anti_join_violations(fact, "k", dim, "k", broadcast_threshold=10**9)
    salted = anti_join_violations(fact, "k", dim, "k", broadcast_threshold=0,
                                  salt_factor=4)
    assert "BroadcastHashJoin" in bc._jdf.queryExecution().executedPlan().toString()
    a = sorted(r["k"] for r in bc.collect())
    b = sorted(r["k"] for r in salted.collect())
    assert a == b and len(a) > 0


def test_suite_violations_dataframe(spark, orders):
    from sparkcheck.summarize import suite_violations

    s = _suite(
        {"expectation_type": "expect_column_values_to_be_in_set",
         "kwargs": {"column": "o_orderstatus", "value_set": ["O", "F"]}},
        {"expectation_type": "expect_column_values_to_be_between",
         "kwargs": {"column": "o_totalprice", "max_value": 100000}},
        {"expectation_type": "expect_table_row_count_to_be_between",
         "kwargs": {"min_value": 1}},  # non-map: skipped
    )
    v = suite_violations(orders, s, doc_id_col="o_orderkey", run_id="r", partition_id="p")
    counts = {r["expectation"]: r["n"] for r in
              v.groupBy("expectation").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts["expect_column_values_to_be_in_set"] == \
        orders.where("o_orderstatus = 'P'").count()
    assert counts["expect_column_values_to_be_between"] == \
        orders.where("o_totalprice > 100000").count()
    assert set(counts) == {"expect_column_values_to_be_in_set",
                           "expect_column_values_to_be_between"}


def test_interactive_validator_api(spark, orders):
    import json

    from sparkcheck import ExpectationSuite, Validator

    v = Validator(orders)
    r = v.expect_column_values_to_not_be_null(column="o_custkey")
    assert r["success"]
    r2 = v.expect_column_mean_to_be_between(
        column="o_totalprice", min_value=0, max_value=10**9
    )
    assert r2["success"] and "observed_value" in r2["result"]
    with pytest.raises(AttributeError):
        v.not_an_expectation  # noqa: B018
    exported = v.to_suite("nb")
    assert len(exported.expectations) == 2
    # suite round-trips through JSON and revalidates identically
    reloaded = ExpectationSuite.from_json(exported.to_json())
    from sparkcheck import validate_df
    rep = validate_df(orders, reloaded)
    assert rep["success"] and len(rep["results"]) == 2
    json.dumps(rep, default=str)  # EVRs are JSON-serializable
