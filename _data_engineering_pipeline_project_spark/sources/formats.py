"""Multi-format source/sink layer: JSON lines and ORC next to the
CSV/parquet paths (SURVEY §2a S1-S7).

The reference reads CSV only (reference project/etl2.py:29-58); a
Spark-native engine gets every columnar/row format from the same
DataFrameReader/Writer surface. These helpers pin the options that make
round-trips lossless and scale-safe:

- JSON: newline-delimited (splittable — a 100 TB JSON dataset still
  parallelizes per-line), explicit schema on read (no sampling pass over
  the data, which at scale is a full extra scan), ISO-8601 timestamps.
- ORC: native vectorized reader, predicate pushdown and column pruning
  like parquet (``spark.sql.orc.filterPushdown`` is on by default).
- Partitioned writes: ``partitionBy`` produces hive-style directories so
  downstream scans get partition pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TIMESTAMP_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"


def write_json(
    df: DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None
) -> None:
    """Newline-delimited JSON sink (splittable at scale; one object per
    line). Timestamps serialized ISO-8601 with offset so a schema'd read
    restores them exactly."""
    w = df.write.mode(mode).option("timestampFormat", TIMESTAMP_FMT)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.json(path)


def read_json(spark: SparkSession, path: str, schema: T.StructType | str) -> DataFrame:
    """Schema'd JSON-lines read. An explicit schema skips Spark's
    inference sampling pass — at 100 TB, inference is a full extra scan
    AND can mistype sparse columns; the engine's schema registry is the
    source of truth instead."""
    return (
        spark.read.schema(schema)
        .option("timestampFormat", TIMESTAMP_FMT)
        .option("mode", "PERMISSIVE")
        .json(path)
    )


def write_orc(
    df: DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None
) -> None:
    """ORC sink — columnar alternative to parquet with the same pushdown/
    pruning behavior; useful when the sink side of the pipeline is a
    Hive/Trino warehouse standardized on ORC."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)
