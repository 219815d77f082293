"""Distributed monotonicity check (range-partitioned, no global window)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkcheck.ordering import monotonicity_violations


def test_finds_injected_violations_across_partitions(spark):
    # monotone in id except dips at 3 known spots (incl. one that will sit
    # far from any partition head at n_partitions=8)
    n = 20_000
    df = spark.range(n).select(
        F.col("id").alias("k"),
        F.when(F.col("id").isin(977, 10_001, 19_500), -5.0)
        .otherwise(F.col("id").cast("double"))
        .alias("v"),
    )
    viol = monotonicity_violations(df, "v", "k", n_partitions=8)
    # each dip produces 2 violations: the dip itself and the recovery is
    # NOT a violation (value rises back), so exactly the dip rows appear
    dip_orders = sorted(v[0] for v in viol)
    assert dip_orders == [977.0, 10001.0, 19500.0]
    # dip at 977: value -5 follows 976
    d = dict((v[0], (v[1], v[2])) for v in viol)
    assert d[977.0] == (-5.0, 976.0)


def test_boundary_violation_between_partitions(spark):
    # strictly decreasing step exactly at a likely partition boundary is
    # still caught via the bounds pass — build a sequence with ONE drop
    rows = [(float(i), float(i)) for i in range(1000)]
    rows[500] = (500.0, 100.0)  # drop
    df = spark.createDataFrame(rows, "k double, v double")
    viol = monotonicity_violations(df, "v", "k", n_partitions=16)
    assert [v[0] for v in viol] == [500.0]


def test_clean_monotone_has_no_violations(spark):
    df = spark.range(5000).select(
        F.col("id").alias("k"), (F.col("id") * 2).cast("double").alias("v")
    )
    assert monotonicity_violations(df, "v", "k", n_partitions=8) == []
    # strictly: plateaus violate
    df2 = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") / 10).cast("long").cast("double").alias("v")
    )
    assert monotonicity_violations(df2, "v", "k") == []  # non-strict ok
    assert len(monotonicity_violations(df2, "v", "k", strictly=True)) == 90


def test_decreasing_mode(spark):
    df = spark.range(1000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") == 300, 999.0)
        .otherwise(-F.col("id").cast("double"))
        .alias("v"),
    )
    viol = monotonicity_violations(df, "v", "k", decreasing=True, n_partitions=4)
    # 300 jumps up (violation); 301 resumes below 999, which is fine for a
    # decreasing sequence — so only 300 violates
    assert [v[0] for v in viol] == [300.0]


def test_more_partitions_than_rows(spark):
    # n_partitions >> rows: most partitions are empty, several hold a single
    # row (single-row partitions emit first==last bound rows); the pid-keyed
    # boundary stitch must still pair adjacent non-empty partitions
    df = spark.range(7).select(
        F.col("id").alias("k"),
        F.when(F.col("id") == 4, 0.0).otherwise(F.col("id").cast("double")).alias("v"),
    )
    viol = monotonicity_violations(df, "v", "k", n_partitions=64)
    assert [v[0] for v in viol] == [4.0]
    clean = spark.range(5).select(
        F.col("id").alias("k"), F.col("id").cast("double").alias("v")
    )
    assert monotonicity_violations(clean, "v", "k", n_partitions=64) == []


def test_duplicate_order_keys_across_boundaries(spark):
    # duplicate order_by values at partition edges: the old global-sort
    # re-pairing could swap a partition's first/last rows; pid-keyed pairing
    # must not invent or miss boundary violations
    rows = [(float(i // 2), float(i // 2)) for i in range(200)]  # k 0,0,1,1,...
    df = spark.createDataFrame(rows, "k double, v double")
    assert monotonicity_violations(df, "v", "k", n_partitions=16) == []
