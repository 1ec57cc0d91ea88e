"""Round-trip tests for the JSON/ORC source-sink layer (SURVEY §2a)."""

from __future__ import annotations

from pyspark.sql import functions as F

from _data_engineering_pipeline_project_spark.sources.formats import (
    read_json,
    read_orc,
    write_json,
    write_orc,
)

SCHEMA = "id long, name string, amount double, flag boolean, ts timestamp"
ROWS = [
    (1, "alpha", 10.25, True, "2024-01-01 00:00:00"),
    (2, "beta", -3.5, False, "2024-06-15 12:34:56.789"),
    (3, None, None, None, None),
    (4, "déjà ✓", 0.0, True, "1969-12-31 23:59:59"),  # pre-epoch + unicode
]


def _df(spark):
    raw = spark.createDataFrame(
        ROWS, "id long, name string, amount double, flag boolean, ts string"
    )
    return raw.withColumn("ts", F.to_timestamp("ts"))


def _rows(df):
    return sorted(df.collect(), key=lambda r: r["id"])


def test_json_roundtrip_lossless(spark, tmp_path):
    df = _df(spark)
    path = str(tmp_path / "j")
    write_json(df, path)
    back = read_json(spark, path, SCHEMA)
    assert back.schema == df.schema
    assert _rows(back) == _rows(df)


def test_orc_roundtrip_lossless(spark, tmp_path):
    df = _df(spark)
    path = str(tmp_path / "o")
    write_orc(df, path)
    back = read_orc(spark, path)
    assert back.schema == df.schema
    assert _rows(back) == _rows(df)


def test_partitioned_json_write_prunes_directories(spark, tmp_path):
    df = _df(spark).withColumn("part", F.col("id") % 2)
    path = str(tmp_path / "jp")
    write_json(df, path, partition_by=["part"])
    # hive-style layout exists → downstream scans can partition-prune
    dirs = {p.name for p in (tmp_path / "jp").iterdir() if p.is_dir()}
    assert dirs == {"part=0", "part=1"}
    back = read_json(spark, path, SCHEMA + ", part long")
    assert back.filter("part = 1").count() == 2


def test_json_read_uses_registry_schema_not_inference(spark, tmp_path):
    # a sparse column typed only by the schema: inference would drop or
    # mistype it; the schema'd read keeps it as a typed all-null column
    df = _df(spark)
    path = str(tmp_path / "js")
    write_json(df, path)
    back = read_json(spark, path, SCHEMA + ", missing_col int")
    assert back.schema["missing_col"].dataType.typeName() == "integer"
    assert back.filter(F.col("missing_col").isNotNull()).count() == 0
