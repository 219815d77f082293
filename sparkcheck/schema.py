"""Core schemas for the sparkcheck engine.

The primary input is an Iceberg (locally: parquet) table of interleaved
text+media documents, per BASELINE.json's input hint:

    doc_id: string
    spans:  array<struct<kind:string, text:string, media_ref:string, offset:int>>

Output tables (results / violations / lineage) mirror the reference's
ExpectationSuiteValidationResult / unexpected-rows contracts
(reference: great_expectations/core/expectation_validation_result.py:441,
expectations/expectation.py:3465-3609 `_format_map_output`), but as
DataFrames appended to a results store instead of driver-side JSON blobs,
because at 10^12 docs collect() of violations is forbidden by design
(SURVEY.md §2.7).
"""

from __future__ import annotations

from pyspark.sql import types as T

SPAN_STRUCT = T.StructType(
    [
        T.StructField("kind", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("offset", T.IntegerType(), True),
    ]
)

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), True),
        T.StructField("spans", T.ArrayType(SPAN_STRUCT), True),
    ]
)

MEDIA_DIM_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("media_kind", T.StringType(), True),
        T.StructField("bytes", T.LongType(), True),
    ]
)

# One row per (partition, expectation) evaluation — the per-partition
# pass/fail record required by the north rule.
RESULT_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("partition_id", T.StringType(), False),
        T.StructField("expectation", T.StringType(), False),
        T.StructField("column", T.StringType(), True),
        T.StructField("success", T.BooleanType(), False),
        T.StructField("element_count", T.LongType(), True),
        T.StructField("unexpected_count", T.LongType(), True),
        T.StructField("observed_value", T.StringType(), True),
        T.StructField("evr", T.StringType(), True),  # full EVR dict as JSON
        T.StructField("ts", T.TimestampType(), True),
    ]
)

# One row per (suite, expectation) EVR — the evaluation-parameter store
# backing urn:great_expectations:validations:<suite>:<metric> cross-suite
# references (reference: EvaluationParameterStore + ge_validations_urn,
# core/urn.py:16-25, core/evaluation_parameters.py:340-430)
EVAL_PARAM_SCHEMA = T.StructType(
    [
        T.StructField("suite_name", T.StringType(), False),
        T.StructField("expectation", T.StringType(), False),
        T.StructField("evr", T.StringType(), False),  # full EVR dict as JSON
        T.StructField("run_id", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

VIOLATION_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("partition_id", T.StringType(), False),
        T.StructField("doc_id", T.StringType(), True),
        T.StructField("span_index", T.IntegerType(), True),
        T.StructField("expectation", T.StringType(), False),
        T.StructField("observed_value", T.StringType(), True),
    ]
)

LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("partition_id", T.StringType(), False),
        T.StructField("input_snapshot", T.StringType(), True),
        T.StructField("metric", T.StringType(), False),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)
