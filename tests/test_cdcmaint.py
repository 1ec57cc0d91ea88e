"""CdcSnapshotMaintainer: streaming changelog compaction — batch
equivalence, tombstone persistence across batches, redelivery no-ops,
restart recovery, and an end-to-end availableNow drain."""

from __future__ import annotations

import os

from pyspark.sql import Row
from pyspark.sql import types as T

from _data_engineering_pipeline_project_spark.operators.cdc import apply_changelog
from _data_engineering_pipeline_project_spark.streaming.cdcmaint import (
    CdcSnapshotMaintainer,
)

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("v", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("op", T.StringType()),
    ]
)


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _snap(m):
    return {r["k"]: (r["v"], r["seq"], r["op"]) for r in m.snapshot().collect()}


def test_incremental_equals_batch_apply(spark, tmp_path):
    b1 = [Row(k=1, v="a", seq=1, op="I"), Row(k=2, v="x", seq=1, op="I")]
    b2 = [Row(k=1, v="b", seq=2, op="U"), Row(k=3, v="n", seq=1, op="I"),
          Row(k=2, v=None, seq=2, op="D")]
    m = CdcSnapshotMaintainer(spark, str(tmp_path / "cdc"), ["k"], ["seq"])
    m.merge_batch(_df(spark, b1), 0)
    m.merge_batch(_df(spark, b2), 1)
    want = {
        r["k"]: (r["v"], r["seq"], r["op"])
        for r in apply_changelog(_df(spark, b1 + b2), ["k"], ["seq"]).collect()
    }
    assert _snap(m) == want == {1: ("b", 2, "U"), 3: ("n", 1, "I")}


def test_tombstone_blocks_late_lower_seq_change(spark, tmp_path):
    """The reason state keeps tombstones: a delete applied in batch 1
    must still beat a STRAGGLER update with a lower sequence arriving
    in batch 2 (without the tombstone the key would resurrect)."""
    m = CdcSnapshotMaintainer(spark, str(tmp_path / "cdc"), ["k"], ["seq"])
    m.merge_batch(
        _df(spark, [Row(k=1, v="a", seq=1, op="I"), Row(k=1, v=None, seq=3, op="D")]),
        0,
    )
    m.merge_batch(_df(spark, [Row(k=1, v="late", seq=2, op="U")]), 1)
    assert _snap(m) == {}
    # but a genuinely NEWER change does resurrect
    m.merge_batch(_df(spark, [Row(k=1, v="new", seq=4, op="U")]), 2)
    assert _snap(m) == {1: ("new", 4, "U")}


def test_redelivered_batch_is_noop(spark, tmp_path):
    m = CdcSnapshotMaintainer(spark, str(tmp_path / "cdc"), ["k"], ["seq"])
    m.merge_batch(_df(spark, [Row(k=1, v="a", seq=1, op="I")]), 0)
    v = m.version
    m.merge_batch(_df(spark, [Row(k=1, v="dup", seq=9, op="U")]), 0)  # replay id
    assert m.version == v and _snap(m) == {1: ("a", 1, "I")}


def test_restart_resumes_committed_version(spark, tmp_path):
    base = str(tmp_path / "cdc")
    m1 = CdcSnapshotMaintainer(spark, base, ["k"], ["seq"])
    m1.merge_batch(_df(spark, [Row(k=1, v="a", seq=1, op="I")]), 0)
    m1.merge_batch(_df(spark, [Row(k=1, v="b", seq=2, op="U")]), 1)
    m2 = CdcSnapshotMaintainer(spark, base, ["k"], ["seq"])
    assert m2.version == m1.version
    assert _snap(m2) == {1: ("b", 2, "U")}
    # redelivery watermark also survives the restart
    m2.merge_batch(_df(spark, [Row(k=1, v="ghost", seq=9, op="U")]), 1)
    assert _snap(m2) == {1: ("b", 2, "U")}


def test_available_now_end_to_end(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    m = CdcSnapshotMaintainer(spark, str(tmp_path / "cdc"), ["k"], ["seq"])
    ckpt = str(tmp_path / "ckpt")
    _df(spark, [Row(k=1, v="a", seq=1, op="I"), Row(k=2, v="x", seq=1, op="I")]).write.mode(
        "append"
    ).parquet(src)
    m.run_available_now(src, SCHEMA, ckpt)
    assert _snap(m) == {1: ("a", 1, "I"), 2: ("x", 1, "I")}
    _df(spark, [Row(k=2, v=None, seq=2, op="D"), Row(k=1, v="b", seq=2, op="U")]).write.mode(
        "append"
    ).parquet(src)
    m.run_available_now(src, SCHEMA, ckpt)
    assert _snap(m) == {1: ("b", 2, "U")}
