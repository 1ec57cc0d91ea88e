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


def test_jdbc_roundtrip_scd2_diff(spark, tmp_path):
    """S5 ungated (VERDICT r1 'Next' #4): a real JDBC round-trip against
    embedded Derby (bundled in Spark's jars), mirroring the reference's
    read_sql_table diff loop (reference project/etl2.py:262-267,311):
    write the sink table over JDBC, read it back over JDBC, snapshot-diff
    a changed source against the read-back state."""
    from _data_engineering_pipeline_project_spark.operators.joins import (
        snapshot_diff,
    )
    from _data_engineering_pipeline_project_spark.sources.sinks import (
        derby_url,
        read_jdbc,
        write_jdbc,
    )

    url = derby_url(str(tmp_path / "derbydb"))
    base = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)],
        "id int, name string, price double",
    )
    write_jdbc(base, url, "customers")

    back = read_jdbc(spark, url, "customers")
    assert back.count() == 3
    assert {f.name for f in back.schema.fields} == {"ID", "NAME", "PRICE"} or {
        f.name for f in back.schema.fields
    } == {"id", "name", "price"}
    back = back.toDF(*[c.lower() for c in back.columns])

    incoming = spark.createDataFrame(
        [(1, "a", 9.0), (2, "b", 2.0), (4, "d", 4.0)],
        "id int, name string, price double",
    )
    diff = {
        r["id"]: r["change_type"]
        for r in snapshot_diff(incoming, back, ["id"]).collect()
    }
    assert diff == {1: "update", 2: "unchanged", 3: "delete", 4: "insert"}

    # append mode (the reference's chunked to_sql append, etl2:301)
    write_jdbc(incoming.filter("id = 4"), url, "customers", mode="append")
    assert read_jdbc(spark, url, "customers").count() == 4


def test_parquet_file_stats_reflect_clustering(spark, tmp_path):
    """Footer stats over a range-clustered write show disjoint per-file
    key spans (the property data skipping relies on), and total rows
    reconcile."""
    from _data_engineering_pipeline_project_spark.operators.sampling import (
        write_clustered,
    )
    from _data_engineering_pipeline_project_spark.sources.formats import (
        parquet_file_stats,
    )

    df = spark.range(10_000).selectExpr("id", "id % 97 as v")
    dest = tmp_path / "clustered"
    write_clustered(df, str(dest), ["id"], n_files=8)

    stats = parquet_file_stats(spark, str(dest), "id").collect()
    assert sum(r.n_rows for r in stats) == 10_000
    spans = sorted((int(r.cmin), int(r.cmax)) for r in stats)
    for (alo, ahi), (blo, bhi) in zip(spans, spans[1:]):
        assert ahi < blo  # disjoint: each file owns a compact key slice


def test_streaming_jdbc_sink_idempotent_on_retry(spark, tmp_path):
    """Streaming → JDBC exactly-once: drain a file stream into Derby via
    the delete-then-insert foreachBatch sink, then REPLAY a batch (the
    at-least-once failure mode) and a partial-crash retry — table state
    must be unchanged in both cases."""
    from _data_engineering_pipeline_project_spark.sources.sinks import (
        derby_url,
        read_jdbc,
    )
    from _data_engineering_pipeline_project_spark.streaming.jdbcsink import (
        run_stream_jdbc_sink,
    )

    src = tmp_path / "src"
    src.mkdir()
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id int, name string")
    df2 = spark.createDataFrame([(3, "c")], "id int, name string")
    df1.coalesce(1).write.mode("append").parquet(str(src))
    df2.coalesce(1).write.mode("append").parquet(str(src))

    url = derby_url(str(tmp_path / "derbydb"))
    sink = run_stream_jdbc_sink(
        spark,
        str(src),
        "id int, name string",
        str(tmp_path / "ckpt"),
        url,
        "stream_sink",
    )
    back = read_jdbc(spark, url, "stream_sink")
    assert back.count() == 3

    # replay batch 1 verbatim (foreachBatch retry): no duplicates
    sink.process_batch(df2, 1)
    assert read_jdbc(spark, url, "stream_sink").count() == 3

    # crash-mid-insert simulation: a partial copy of batch 1 exists, the
    # retry must converge to exactly one full copy
    from _data_engineering_pipeline_project_spark.streaming.jdbcsink import (
        _execute_update,
    )

    _execute_update(
        spark, url, "INSERT INTO stream_sink VALUES (3, 'c', 1)"
    )
    assert read_jdbc(spark, url, "stream_sink").count() == 4
    sink.process_batch(df2, 1)
    assert read_jdbc(spark, url, "stream_sink").count() == 3


def test_streaming_jdbc_sink_restart_does_not_wipe(spark, tmp_path):
    """A RESTARTED sink (fresh driver object, existing table) must take
    the idempotent append path — not the create-with-overwrite path that
    would wipe previously committed batches."""
    from _data_engineering_pipeline_project_spark.sources.sinks import (
        derby_url,
        read_jdbc,
    )
    from _data_engineering_pipeline_project_spark.streaming.jdbcsink import (
        JdbcIdempotentSink,
    )

    url = derby_url(str(tmp_path / "derbydb2"))
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id int, name string")
    sink = JdbcIdempotentSink(spark, url, "restart_sink")
    sink.process_batch(df1, 0)
    assert read_jdbc(spark, url, "restart_sink").count() == 2

    # driver restart: brand-new sink object, no in-memory state
    sink2 = JdbcIdempotentSink(spark, url, "restart_sink")
    df2 = spark.createDataFrame([(3, "c")], "id int, name string")
    sink2.process_batch(df2, 1)
    back = read_jdbc(spark, url, "restart_sink")
    assert back.count() == 3          # batch 0 SURVIVED the restart
    # and the restarted sink is still retry-idempotent
    sink2.process_batch(df2, 1)
    assert read_jdbc(spark, url, "restart_sink").count() == 3


def test_xml_roundtrip_lossless(spark, tmp_path):
    """Spark 4 built-in xml format: schema'd round-trip including
    nulls, pre-epoch timestamps, unicode, and XML-hostile characters
    (&, <, >) — the writer's entity escaping must be lossless."""
    from _data_engineering_pipeline_project_spark.sources.formats import (
        read_xml,
        write_xml,
    )

    df = _df(spark).withColumn(
        "name",
        F.when(F.col("id") == 1, F.lit("a&b <tag> \"q\"")).otherwise(
            F.col("name")
        ),
    )
    path = str(tmp_path / "x")
    write_xml(df, path)
    back = read_xml(spark, path, SCHEMA)
    assert back.schema == df.schema
    assert _rows(back) == _rows(df)


def test_xml_read_uses_registry_schema_not_inference(spark, tmp_path):
    """A sparse column typed by the registry schema stays typed even
    when the sampled rows can't prove it (the read_json discipline)."""
    from _data_engineering_pipeline_project_spark.sources.formats import (
        read_xml,
        write_xml,
    )

    df = _df(spark)
    path = str(tmp_path / "x2")
    write_xml(df, path)
    back = read_xml(
        spark, path, "id long, name string, amount double, missing double"
    )
    assert [f.name for f in back.schema.fields] == [
        "id",
        "name",
        "amount",
        "missing",
    ]
    assert back.filter(F.col("missing").isNotNull()).count() == 0
