"""Deterministic sampling + storage maintenance.

Training-data pipelines need REPRODUCIBLE samples: ``df.sample()`` is
seed-and-partitioning dependent, so re-running on re-partitioned data
changes the sample. ``hash_sample`` instead keys the decision on a stable
content hash of the key column — the same rows are selected on any
cluster, any partitioning, any engine (the DuckDB oracle reproduces it
with the same md5 arithmetic).

``compact_parquet`` is the small-files maintenance pass: micro-batch
sinks accumulate per-trigger files; compaction rewrites a directory into
size-targeted partitions so downstream scans stop paying per-file open
costs (the classic 100 TB 'millions of tiny files' failure).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from _data_engineering_pipeline_project_spark.operators.dedup import md5_hash60


def hash_bucket(col: Column | str, buckets: int = 10_000) -> Column:
    """Stable bucket in [0, buckets) from the md5 of the key's string form."""
    c = F.col(col) if isinstance(col, str) else col
    return md5_hash60(c.cast("string")) % buckets


def hash_sample(
    df: DataFrame, key_col: str, rate: float, buckets: int = 10_000
) -> DataFrame:
    """Keep rows whose hash bucket < rate·buckets — deterministic,
    partitioning-independent, and stable across engines. Also gives
    CONSISTENT sampling: the 1% sample is a subset of the 10% sample."""
    keep = int(round(rate * buckets))
    return df.filter(hash_bucket(key_col, buckets) < keep)


def compact_parquet(
    spark: SparkSession,
    src_dir: str,
    dest_dir: str,
    target_file_mb: int = 128,
) -> int:
    """Rewrite a parquet directory into ~target-size files; returns the
    output file count. Uses the source's on-disk size to pick the
    partition count (AQE coalesce handles the final merge)."""
    import os

    total_bytes = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(src_dir)
        for f in fs
        if f.endswith(".parquet")
    )
    n = max(1, round(total_bytes / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(src_dir)
    df.repartition(n).write.mode("overwrite").parquet(dest_dir)
    return len(
        [
            f
            for dp, _, fs in os.walk(dest_dir)
            for f in fs
            if f.endswith(".parquet")
        ]
    )


def write_clustered(
    df: DataFrame,
    dest_dir: str,
    cluster_cols: list[str],
    n_files: int | None = None,
) -> None:
    """Data-skipping layout: repartition by range on ``cluster_cols`` and
    sort within each file, so parquet row-group min/max stats become
    SELECTIVE — a filter on the cluster column then skips whole row
    groups/files at scan time, the poor-man's Z-order (exact for 1-D
    clustering; multi-D keys get lexicographic locality).

    At 100 TB this is the difference between "pushed filter evaluated on
    every row group" and "row group never read": pushdown alone doesn't
    help when every file spans the whole key range (uniform writes give
    every row group min=global-min, max=global-max)."""
    parts = [F.col(c) for c in cluster_cols]
    w = df.repartitionByRange(*( [n_files] if n_files else [] ), *parts)
    w.sortWithinPartitions(*parts).write.mode("overwrite").parquet(dest_dir)
