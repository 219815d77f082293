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

import glob as _glob
import os
import re
from dataclasses import dataclass, field
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

# URI schemes handled by hadoop FS connectors — the path passes straight to
# spark.read; credentials/endpoint go through hadoop_conf
# (reference: PathBatchSpec S3/GCS handling + AzureBatchSpec,
# sparkdf_execution_engine.py:276-360)
CLOUD_SCHEMES = ("s3://", "s3a://", "s3n://", "gs://", "wasb://", "wasbs://",
                 "abfs://", "abfss://")


def apply_hadoop_conf(spark: SparkSession, conf: dict[str, str]) -> None:
    """Install hadoop FS configuration (credentials, endpoints) on the
    session — the hook the reference's cloud BatchSpecs use (AzureBatchSpec
    sets fs.azure.* keys, sparkdf_execution_engine.py:320-340)."""
    hconf = spark.sparkContext._jsc.hadoopConfiguration()  # noqa: SLF001
    for k, v in conf.items():
        hconf.set(k, str(v))


def azure_account_conf(storage_account: str, account_key: str) -> dict[str, str]:
    """The wasbs:// credential config the reference's AzureBatchSpec
    installs: fs.azure.account.key.<account>.blob.core.windows.net."""
    return {
        f"fs.azure.account.key.{storage_account}.blob.core.windows.net": account_key
    }


def read_glue_table(spark: SparkSession, database: str, table: str) -> DataFrame:
    """GlueDataCatalogBatchSpec analog: a catalog table read — on EMR the
    Glue catalog is wired in as the session catalog, so this is
    spark.table(db.tbl) (reference: sparkdf_execution_engine.py:342-360)."""
    return spark.table(f"{database}.{table}")


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
    hadoop_conf: dict[str, str] | None = None,
) -> DataFrame:
    """Materialize a batch: explicit table (Iceberg/Glue catalog) or path —
    local or cloud (s3a://, gs://, wasbs://, abfss:// pass through the
    hadoop connectors; credentials via ``hadoop_conf`` or
    ``azure_account_conf``). csv/tsv get sane defaults (header, inferSchema
    unless schema given)."""
    if hadoop_conf:
        apply_hadoop_conf(spark, hadoop_conf)
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
# Fluent file assets with batching regex
# (reference: datasource/fluent/spark_file_path_datasource.py:22-40 —
#  CSVAsset etc. slice a directory of files into batches by a regex whose
#  named groups become batch identifiers)
# ---------------------------------------------------------------------------


@dataclass
class FileAsset:
    """A directory of data files sliced into batches by ``batching_regex``.

    ``batching_regex`` named groups become batch parameters, e.g.
    ``r"events_(?P<year>\\d{4})-(?P<month>\\d{2})\\.csv"`` yields batches
    identified by {"year": ..., "month": ...}; ``get_batch(year="2021")``
    reads every file whose groups match the given subset.
    """

    base_dir: str
    batching_regex: str
    fmt: str | None = None
    reader_options: dict[str, Any] = field(default_factory=dict)

    def _matches(self) -> list[tuple[str, dict[str, str]]]:
        rx = re.compile(self.batching_regex)
        out = []
        for path in sorted(_glob.glob(os.path.join(self.base_dir, "*"))):
            m = rx.search(os.path.basename(path))
            if m:
                out.append((path, m.groupdict()))
        return out

    def batch_identifiers(self) -> list[dict[str, str]]:
        """All batch-parameter dicts present in the directory, in filename
        order."""
        return [ident for _, ident in self._matches()]

    def get_batch(self, spark: SparkSession, **params: str) -> DataFrame:
        """One DataFrame over every file whose regex groups match params
        (all files when no params given). Raises if nothing matches."""
        paths = [
            p for p, ident in self._matches()
            if all(str(ident.get(k)) == str(v) for k, v in params.items())
        ]
        if not paths:
            raise FileNotFoundError(
                f"no files under {self.base_dir} match "
                f"{self.batching_regex!r} with {params}"
            )
        fmt = self.fmt or guess_format_from_path(paths[0])
        opts = dict(self.reader_options)
        if fmt == "csv":
            opts.setdefault("header", "true")
            opts.setdefault("inferSchema", "true")
        return spark.read.format(fmt).options(**opts).load(paths)


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


def ensure_parallelism(df: DataFrame, min_fraction: float = 0.5) -> DataFrame:
    """Fan a small-file input out to the cluster's parallelism.

    A narrow expression-heavy stage (shingling, signature folds, regex
    profiling, Arrow scoring) inherits the INPUT's partitioning; a tiny
    single-file table therefore runs its whole pre-shuffle compute on one
    core. When the input has fewer partitions than min_fraction x
    defaultParallelism, repartition up — the shuffle moves only the small
    input's bytes. At production scale (file inputs already carrying >=
    cores partitions) this is a no-op, so no extra shuffle appears in the
    10^12-row plan."""
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(2.0, parallelism * min_fraction):
        return df.repartition(parallelism)
    return df
