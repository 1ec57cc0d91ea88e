"""Spark 4 Python DataSource connector (sources/pydatasource.py):
filter-pushdown partition pruning, batch parity, and streaming
offset-replay across checkpointed restarts."""

from __future__ import annotations

import os

from pyspark.sql.datasource import GreaterThanOrEqual, IsNotNull, LessThan

from _data_engineering_pipeline_project_spark.sources import pydatasource as P


def test_pushfilters_prunes_partitions_unit():
    r = P._SyntheticDocsReader({"n": "500", "parts": "8"})
    leftover = list(
        r.pushFilters(
            [
                GreaterThanOrEqual(("doc_id",), 100),
                LessThan(("doc_id",), 110),
                IsNotNull(("lang",)),
            ]
        )
    )
    # range predicates absorbed, the unrelated filter handed back
    assert leftover == [IsNotNull(("lang",))]
    parts = r.partitions()
    assert min(p.start for p in parts) == 100
    assert max(p.end for p in parts) == 110
    assert sum(p.end - p.start for p in parts) == 10


def test_batch_read_filtered_and_plan(spark):
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    P.register(spark)
    df = (
        spark.read.format("synthetic_docs")
        .option("n", 500)
        .option("parts", 8)
        .load()
        .filter("doc_id >= 100 and doc_id < 110")
    )
    rows = sorted((r["doc_id"], r["text"]) for r in df.collect())
    assert rows == sorted((i, P.gen_row(i)[1]) for i in range(100, 110))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchScan synthetic_docs" in plan
    # the range predicates were absorbed by the source, not re-applied
    assert ">= 100" not in plan and "< 110" not in plan


def test_stream_drains_across_restarts(spark, tmp_path):
    """availableNow processes what the source declares available (one
    batch); re-running with the SAME checkpoint resumes from the
    committed offset — three runs drain 100+100+50 of n=250 with no
    dupes and md5-exact contents (offsets are replayable)."""
    P.register(spark)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    for _ in range(3):
        q = (
            spark.readStream.format("synthetic_docs")
            .option("n", 250)
            .option("batch_size", 100)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    got = sorted(
        (r["doc_id"], r["text"], r["lang"], r["source"], r["n_chars"])
        for r in spark.read.parquet(out).collect()
    )
    assert got == [P.gen_row(i) for i in range(250)]


def test_stream_recovery_does_not_duplicate(spark, tmp_path):
    """Kill between runs is implicit above; here: a fourth run after
    the source is exhausted must append nothing."""
    P.register(spark)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    for _ in range(4):
        q = (
            spark.readStream.format("synthetic_docs")
            .option("n", 120)
            .option("batch_size", 60)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    assert spark.read.parquet(out).count() == 120


def test_jsonl_writer_roundtrip_multi_partition(spark, tmp_path):
    import glob

    P.register_sink(spark)
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").repartition(4)
    out = str(tmp_path / "out")
    ev.write.format("pyjsonl").option("path", out).mode("append").save()
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    assert not os.path.exists(os.path.join(out, "_tmp"))
    files = glob.glob(out + "/part-*.jsonl")
    assert len(files) == 4
    back = spark.read.json(out)
    assert back.count() == ev.count()
    a = {r["event_id"] for r in ev.collect()}
    b = {r["event_id"] for r in back.collect()}
    assert a == b


def test_jsonl_writer_abort_leaves_no_visible_output(spark, tmp_path):
    """A failing task must abort the job with NO committed files and no
    _SUCCESS — readers never see partial output."""
    import glob

    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    P.register_sink(spark)

    @F.udf(returnType=LongType())
    def boom(x):
        if x == 7:
            raise RuntimeError("injected task failure")
        return x

    df = spark.range(0, 16, 1, 4).select(boom(F.col("id")).alias("id"))
    out = str(tmp_path / "out")
    import pytest as _pytest

    with _pytest.raises(Exception):
        df.write.format("pyjsonl").option("path", out).mode("append").save()
    assert glob.glob(out + "/part-*.jsonl") == []
    assert not os.path.exists(os.path.join(out, "_SUCCESS"))
