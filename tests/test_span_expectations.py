"""Span-level expectations as first-class suite members: the same
declarative {expectation_type, kwargs} model, applied per span of an
interleaved document via an explodable domain."""

from __future__ import annotations

from sparkcheck import ExpectationConfiguration, ExpectationSuite, validate_df
from sparkcheck.summarize import suite_violations
from sparkcheck.synth import generate_docs


def _span_suite():
    return ExpectationSuite("spans", [
        ExpectationConfiguration(
            "expect_span_values_to_be_in_set",
            {"span_field": "kind",
             "value_set": ["text", "image", "audio", "video"]},
        ),
        ExpectationConfiguration(
            "expect_span_values_to_match_regex",
            {"span_field": "text", "regex": r"^[\x20-\x7E]*$", "mostly": 0.98},
        ),
        ExpectationConfiguration(
            "expect_span_values_to_be_between",
            {"span_field": "offset", "min_value": 0, "max_value": 10**6},
        ),
    ])


def test_span_suite_counts_spans(spark):
    docs = generate_docs(spark, 3000)
    n_spans = docs.selectExpr("sum(size(spans))").collect()[0][0]
    rep = validate_df(docs, _span_suite(), result_format="SUMMARY")
    r_kind, r_text, r_off = rep["results"]
    # element_count is the SPAN count, not the doc count
    assert r_kind["result"]["element_count"] == n_spans
    assert r_kind["success"] and r_kind["result"]["unexpected_count"] == 0
    # ~1/200 text spans carry the seeded control character
    assert r_text["result"]["unexpected_count"] > 0
    assert r_text["success"]  # mostly=0.98 absorbs the seeded rate
    # media spans have NULL text -> missing, never unexpected
    assert r_text["result"]["missing_count"] > 0
    assert r_off["success"]


def test_span_violations_carry_span_index(spark):
    docs = generate_docs(spark, 3000)
    suite = ExpectationSuite("s", [ExpectationConfiguration(
        "expect_span_values_to_match_regex",
        {"span_field": "text", "regex": r"^[\x20-\x7E]*$"},
    )])
    v = suite_violations(docs, suite, doc_id_col="doc_id", run_id="r",
                         partition_id="p")
    rows = v.collect()
    assert rows and all(r["span_index"] is not None and r["span_index"] >= 0
                        for r in rows)
    assert all("\x01" in (r["observed_value"] or "") for r in rows)


def test_span_and_doc_expectations_mix_in_one_suite(spark):
    docs = generate_docs(spark, 2000)
    suite = ExpectationSuite("mix", [
        ExpectationConfiguration("expect_column_values_to_not_be_null",
                                 {"column": "doc_id", "mostly": 0.99}),
        ExpectationConfiguration(
            "expect_span_values_to_be_in_set",
            {"span_field": "kind",
             "value_set": ["text", "image", "audio", "video"]},
        ),
    ])
    rep = validate_df(docs, suite, result_format="BASIC")
    doc_r, span_r = rep["results"]
    assert doc_r["result"]["element_count"] == 2000
    assert span_r["result"]["element_count"] > 2000  # spans outnumber docs
    assert rep["success"]
