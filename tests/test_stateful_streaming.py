"""Custom stateful streaming operator test: state persists across
micro-batches (two files → two batches with maxFilesPerTrigger default;
final per-user stats must reflect BOTH batches)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import types as T

from _data_engineering_pipeline_project_spark.streaming.stateful import (
    running_user_stats,
)

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def test_running_user_stats(spark, tmp_path):
    src = str(tmp_path / "src")
    t = datetime
    spark.createDataFrame(
        [(1, t(2024, 1, 1, 10), 1.0), (2, t(2024, 1, 1, 11), 2.0)], SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(
        [(1, t(2024, 1, 2, 9), 4.0), (1, t(2024, 1, 2, 10), 8.0)], SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)

    out = {
        r["user_id"]: (r["n_events"], r["total_value"], r["last_ts"])
        for r in running_user_stats(spark, src, SCHEMA, "t_user_stats").collect()
    }
    assert out[1] == (3, 13.0, t(2024, 1, 2, 10))
    assert out[2] == (1, 2.0, t(2024, 1, 1, 11))
