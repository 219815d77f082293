"""Markdown/HTML rendering of suite results (data-docs-lite)."""

from __future__ import annotations

from sparkcheck import ExpectationConfiguration, ExpectationSuite, validate_df
from sparkcheck.report import to_html, to_markdown


def _report(spark):
    df = spark.createDataFrame([(1,), (2,), (200,)], "v int")
    suite = ExpectationSuite("r", [
        ExpectationConfiguration("expect_column_values_to_be_between",
                                 {"column": "v", "min_value": 0, "max_value": 100}),
        ExpectationConfiguration("expect_column_mean_to_be_between",
                                 {"column": "v", "min_value": 0, "max_value": 1000}),
        ExpectationConfiguration("expect_column_values_to_not_be_null",
                                 {"column": "nope"}),  # bad column -> exception EVR
    ])
    return validate_df(df, suite, result_format="SUMMARY")


def test_markdown_report(spark):
    rep = _report(spark)
    md = to_markdown(rep)
    assert "FAILED" in md
    assert "expect_column_values_to_be_between" in md
    assert "## Exceptions" in md  # the bad-column EVR surfaces
    assert md.count("|") > 10  # table rendered


def test_html_report(spark):
    rep = _report(spark)
    page = to_html(rep, title="nightly <check>")
    assert page.startswith("<!doctype html>")
    assert "nightly &lt;check&gt;" in page  # title escaped
    assert "expect_column_mean_to_be_between" in page
    # summary table rows stay stable with details off
    bare = to_html(rep, title="nightly <check>", details=False)
    assert bare.count("<tr") == 4  # header + 3 expectations
    assert "Expectation details" not in bare
    # the default page adds the per-expectation detail sections
    assert "Expectation details" in page
    assert page.count("<details") == 3 and 'id="evr-0"' in page
