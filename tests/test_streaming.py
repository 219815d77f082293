"""Streaming validation: micro-batches through the shared engine + store."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from sparkcheck import ExpectationConfiguration, ExpectationSuite
from sparkcheck.runner import ParquetStore
from sparkcheck.streaming import StreamingValidationSink, validate_stream


def _suite():
    return ExpectationSuite("stream", [
        ExpectationConfiguration(
            "expect_column_values_to_be_between",
            {"column": "value", "min_value": 0, "max_value": 10**9},
        ),
        ExpectationConfiguration("expect_column_values_to_not_be_null",
                                 {"column": "value"}),
    ])


def test_streaming_validation_rate_source(spark, tmp_path):
    store = ParquetStore(str(tmp_path / "store"))
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", "500").load()
        .select(F.col("value"))
    )
    q = validate_stream(
        stream, _suite(), store, str(tmp_path / "ckpt"), run_id="s1",
        trigger={"processingTime": "1 seconds"},
    )
    try:
        deadline = time.time() + 30
        while time.time() < deadline:
            committed = store.committed_partitions("s1")
            if len(committed) >= 2:
                break
            time.sleep(1)
    finally:
        q.stop()
    committed = store.committed_partitions("s1")
    assert len(committed) >= 2, committed
    results = store.read(spark, "results")
    assert results.select("partition_id").distinct().count() >= 2
    assert results.where("success = false").count() == 0


def test_streaming_sink_idempotent_replay(spark, tmp_path):
    store = ParquetStore(str(tmp_path / "store2"))
    sink = StreamingValidationSink(store, _suite(), run_id="s2")
    batch = spark.range(100).select(F.col("id").alias("value"))
    sink(batch, 7)
    sink(batch, 7)  # replay of the same batch id must be a no-op
    assert sink.batches_validated == 1
    results = store.read(spark, "results")
    assert results.where("partition_id = 'batch=7'").count() == 2  # 2 expectations once
