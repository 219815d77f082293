"""Hash-sampled validation estimates (sampling.sampled_violation_estimate)."""

from __future__ import annotations

from sparkcheck import ExpectationSuite
from sparkcheck.sampling import sampled_violation_estimate


def _suite():
    s = ExpectationSuite("est")
    s.add("expect_column_values_to_be_in_set", column="lang",
          value_set=["en", "es", "de", "fr"])
    s.add("expect_column_values_to_be_between", column="n_chars",
          min_value=50, max_value=500)
    return s


def test_estimate_covers_true_rate(documents):
    total = documents.count()
    est, skipped = sampled_violation_estimate(
        documents, _suite(), "doc_id", 0.5
    )
    assert skipped == {}
    rows = {r.expectation: r for r in est.collect()}
    assert len(rows) == 2
    # true rates from the full table
    true_zh = documents.where("lang not in ('en','es','de','fr')").count() / total
    r = rows["expect_column_values_to_be_in_set:lang"]
    assert 0 < r.sample_n < total
    assert r.ci_low <= true_zh <= r.ci_high
    assert r.ci_low <= r.p_hat <= r.ci_high


def test_estimate_deterministic(documents):
    a, _ = sampled_violation_estimate(documents, _suite(), "doc_id", 0.3)
    b, _ = sampled_violation_estimate(documents, _suite(), "doc_id", 0.3)
    assert a.collect() == b.collect()


def test_uniqueness_refused(documents):
    s = _suite()
    s.add("expect_column_values_to_be_unique", column="doc_id")
    est, skipped = sampled_violation_estimate(documents, s, "doc_id", 0.5)
    assert any("unique" in k for k in skipped)
    assert est.count() == 2  # uniqueness contributed no estimate row


def test_nested_samples(documents):
    """Hash sampling is nested: a 10% sample is a subset of a 30% sample."""
    from pyspark.sql import functions as F

    from sparkcheck.sampling import hash_fraction

    small = documents.where(hash_fraction("doc_id", "sv") < 0.1)
    big = documents.where(hash_fraction("doc_id", "sv") < 0.3)
    assert small.join(big, "doc_id", "left_anti").count() == 0
