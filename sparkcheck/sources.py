"""Batch materialization: reader dispatch, splitters, samplers.

Reference: execution_engine/sparkdf_execution_engine.py:402-467 (reader
dispatch by extension), split_and_sample/sparkdf_data_splitter.py:25-293
(splitters), split_and_sample/sparkdf_data_sampler.py:18-160 (samplers).

Ours re-expresses each as a pure ``DataFrame -> DataFrame`` function built
from native Column predicates, so every splitter/sampler composes with
Catalyst partition pruning / predicate pushdown: a year-splitter over an
Iceberg table partitioned by days(ts) prunes at the manifest level, and a
hash splitter over a bucket(n, key)-partitioned table reads one bucket.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_EXT_FORMATS = {
    ".parquet": "parquet",
    ".csv": "csv",
    ".tsv": "csv",
    ".json": "json",
    ".orc": "orc",
}


def guess_format_from_path(path: str) -> str:
    """Reference: guess_reader_method_from_path (sparkdf_execution_engine.py
    :402-425). Delta/Iceberg are directory formats chosen explicitly."""
    for ext, fmt in _EXT_FORMATS.items():
        if path.endswith(ext):
            return fmt
    raise ValueError(f"cannot guess reader format for path {path!r}")


def read_batch(
    spark: SparkSession,
    path: str | None = None,
    table: str | None = None,
    fmt: str | None = None,
    schema: Any = None,
    reader_options: dict[str, Any] | None = None,
) -> DataFrame:
    """Materialize a batch: explicit table (Iceberg/catalog) or path.
    csv/tsv get sane defaults (header, inferSchema unless schema given)."""
    if table is not None:
        return spark.table(table)
    if path is None:
        raise ValueError("need path or table")
    fmt = fmt or guess_format_from_path(path)
    reader = spark.read
    opts = dict(reader_options or {})
    if fmt == "csv":
        opts.setdefault("header", "true")
        if path.endswith(".tsv"):
            opts.setdefault("sep", "\t")
        if schema is None:
            opts.setdefault("inferSchema", "true")
    if schema is not None:
        reader = reader.schema(schema)
    return reader.format(fmt).options(**opts).load(path)


# ---------------------------------------------------------------------------
# Splitters (partition -> batch); reference sparkdf_data_splitter.py
# ---------------------------------------------------------------------------


def split_on_whole_table(df: DataFrame) -> DataFrame:
    return df


def split_on_year(df: DataFrame, column: str, year: int) -> DataFrame:
    return df.filter(F.year(F.col(column)) == year)


def split_on_year_and_month(df: DataFrame, column: str, year: int, month: int) -> DataFrame:
    return df.filter(
        (F.year(F.col(column)) == year) & (F.month(F.col(column)) == month)
    )


def split_on_year_month_day(
    df: DataFrame, column: str, year: int, month: int, day: int
) -> DataFrame:
    return df.filter(
        (F.year(F.col(column)) == year)
        & (F.month(F.col(column)) == month)
        & (F.dayofmonth(F.col(column)) == day)
    )


_DATE_PART_FNS = {
    "year": F.year, "month": F.month, "day": F.dayofmonth,
    "hour": F.hour, "minute": F.minute,
}


def split_on_date_parts(
    df: DataFrame, column: str, date_parts: dict[str, int]
) -> DataFrame:
    # reference: sparkdf_data_splitter.py date_parts splitter
    cond = None
    for part, value in date_parts.items():
        c = _DATE_PART_FNS[part](F.col(column)) == value
        cond = c if cond is None else (cond & c)
    return df.filter(cond)


def split_on_column_value(df: DataFrame, column: str, value: Any) -> DataFrame:
    return df.filter(F.col(column).eqNullSafe(F.lit(value)))


def split_on_converted_datetime(
    df: DataFrame, column: str, date_format_string: str, value: str
) -> DataFrame:
    return df.filter(F.date_format(F.col(column), date_format_string) == value)


def split_on_divided_integer(
    df: DataFrame, column: str, divisor: int, quotient: int
) -> DataFrame:
    return df.filter(F.floor(F.col(column) / divisor) == quotient)


def split_on_mod_integer(df: DataFrame, column: str, mod: int, value: int) -> DataFrame:
    return df.filter(F.pmod(F.col(column), F.lit(mod)) == value)


def split_on_multi_column_values(
    df: DataFrame, values: dict[str, Any]
) -> DataFrame:
    cond = None
    for col, value in values.items():
        c = F.col(col).eqNullSafe(F.lit(value))
        cond = c if cond is None else (cond & c)
    return df.filter(cond)


def split_on_hashed_column(
    df: DataFrame, column: str, n_buckets: int, bucket: int
) -> DataFrame:
    """Hash-bucket splitter — the north-rule partitioning for doc_id: maps
    1:1 onto an Iceberg bucket(n, col) partition transform so a production
    read prunes to one bucket's files. xxhash64 (not md5-hexdigest like the
    reference's hash splitter) keeps it JVM-native and seed-stable."""
    return df.filter(F.pmod(F.xxhash64(F.col(column)), F.lit(n_buckets)) == bucket)


# ---------------------------------------------------------------------------
# Samplers; reference sparkdf_data_sampler.py
# ---------------------------------------------------------------------------


def sample_using_limit(df: DataFrame, n: int) -> DataFrame:
    return df.limit(n)


def sample_using_random(df: DataFrame, p: float, seed: int = 42) -> DataFrame:
    return df.sample(fraction=p, seed=seed)


def sample_using_mod(df: DataFrame, column: str, mod: int, value: int) -> DataFrame:
    return df.filter(F.pmod(F.col(column), F.lit(mod)) == value)


def sample_using_a_list(df: DataFrame, column: str, value_list: list[Any]) -> DataFrame:
    return df.filter(F.col(column).isin(list(value_list)))


def sample_using_hash(
    df: DataFrame, column: str, n_buckets: int = 10, bucket: int = 0
) -> DataFrame:
    """Deterministic 1/n_buckets sample by key hash — unlike random
    sampling this is stable across runs/partitionings, which matters for
    reproducible validation baselines."""
    return df.filter(F.pmod(F.xxhash64(F.col(column)), F.lit(n_buckets)) == bucket)
