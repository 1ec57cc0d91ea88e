"""CSV sources (S1-S3) — directory scan, multi-null normalize, datetime sniff.

Reference behavior (project/etl2.py:26-58): list a folder, read every
``*.csv`` with pandas (``na_values=['nan','?']``), derive the table name
from the filename by stripping ``olist_`` / ``_dataset``, sniff datetime
columns BY NAME (contains ``date``/``time``/``approved``) and re-read the
file with ``parse_dates``. The engine does one lazy scan per file: Spark's
csv reader handles a single null token, so extra tokens are normalized by
a fused post-read projection (S2), and datetime sniffing becomes a cast
pass — no second file read (the reference reads each file twice).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from _data_engineering_pipeline_project_spark.functions.expressions import (
    normalize_null_tokens,
)

_DATETIME_NAME_HINTS = ("date", "time", "approved")


def table_name_from_filename(path: str) -> str:
    """Strip ``olist_`` / ``_dataset`` / ``.csv`` (reference etl2:32)."""
    base = os.path.basename(path)
    base = re.sub(r"\.csv$", "", base)
    base = base.replace("olist_", "").replace("_dataset", "")
    return base


def read_csv_table(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    null_tokens: tuple[str, ...] = ("nan", "?"),
    sniff_datetimes: bool = True,
) -> DataFrame:
    """Read one CSV with the reference's parse semantics, lazily.

    With an explicit ``schema`` (preferred — SURVEY.md §2a S3) Spark casts
    during the scan and malformed values become NULL (PERMISSIVE mode),
    matching pandas ``errors='coerce'``. Without one, columns come back as
    strings; name-hinted columns are cast with ``to_timestamp`` (null on
    failure) and the rest are left for the type validator.
    """
    reader = spark.read.option("header", True).option("mode", "PERMISSIVE")
    if schema is not None:
        df = reader.schema(schema).csv(path)
    else:
        df = reader.option("inferSchema", True).csv(path)
    df = normalize_null_tokens(df, null_tokens)
    if sniff_datetimes and schema is None:
        for f in df.schema.fields:
            if isinstance(f.dataType, T.StringType) and any(
                h in f.name.lower() for h in _DATETIME_NAME_HINTS
            ):
                # try_to_timestamp: null on malformed input == pandas
                # errors='coerce' (ANSI mode makes plain to_timestamp throw)
                df = df.withColumn(f.name, F.try_to_timestamp(F.col(f.name)))
    return df


class CorruptCaptureResult:
    """``(clean, corrupt)`` pair plus a ``release()`` handle for the
    cache the read requires (same pattern as ``Scd2Result.release`` —
    without it, repeated ingestion calls accumulate cached partitions
    for the life of the session). Iterable, so existing
    ``clean, corrupt = read_csv_with_corrupt_capture(...)`` unpacking
    keeps working; callers should ``release()`` once both outputs are
    materialized."""

    def __init__(self, clean: DataFrame, corrupt: DataFrame, cached: DataFrame):
        self.clean = clean
        self.corrupt = corrupt
        self._cached = cached

    def release(self) -> None:
        self._cached.unpersist()

    def __iter__(self):
        return iter((self.clean, self.corrupt))


def read_csv_with_corrupt_capture(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    null_tokens: tuple[str, ...] = ("nan", "?"),
) -> CorruptCaptureResult:
    """Schema'd CSV read that ROUTES malformed rows instead of silently
    nulling them: returns ``(clean, corrupt)`` (a ``CorruptCaptureResult``
    — call ``.release()`` when done) where ``corrupt`` carries
    the raw offending line. The reference has no malformed-row path at
    all (a bad CSV line just produces NaNs that later checks may or may
    not catch); the engine treats parse failure itself as a first-class
    quality violation feeding the same error sink as the §2i checks.

    Mechanics: PERMISSIVE mode + ``columnNameOfCorruptRecord`` appends a
    string column holding the raw line for any row where parsing/casting
    failed; both outputs share ONE scan (lazy splits of the same plan).
    At scale this beats FAILFAST (one bad line kills a 100 TB job) and
    DROPMALFORMED (silent data loss, unauditable).
    """
    with_corrupt = T.StructType(
        schema.fields + [T.StructField("_corrupt_record", T.StringType())]
    )
    df = (
        spark.read.option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .schema(with_corrupt)
        .csv(path)
    )
    # Spark requires caching/materializing before filtering on the
    # corrupt-record column alone (SPARK-21610: the pushed-down projection
    # would otherwise never parse the full row)
    df = df.cache()
    clean = df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    clean = normalize_null_tokens(clean, null_tokens)
    corrupt = df.filter(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw_line")
    )
    return CorruptCaptureResult(clean, corrupt, df)


def read_csv_dir(
    spark: SparkSession,
    data_dir: str,
    schemas: dict[str, T.StructType] | None = None,
) -> dict[str, DataFrame]:
    """S1 — scan a folder of CSVs into a named-table dict (etl2:29-58)."""
    out: dict[str, DataFrame] = {}
    for fname in sorted(os.listdir(data_dir)):
        if not fname.endswith(".csv"):
            continue
        name = table_name_from_filename(fname)
        schema = (schemas or {}).get(name)
        out[name] = read_csv_table(spark, os.path.join(data_dir, fname), schema)
    return out
