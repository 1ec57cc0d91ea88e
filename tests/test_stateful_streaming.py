"""Custom stateful streaming operator test: state persists across
micro-batches (two files → two batches with maxFilesPerTrigger default;
final per-user stats must reflect BOTH batches)."""

from __future__ import annotations

from datetime import datetime

import pytest

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


def test_threshold_alerts_across_batches(spark, tmp_path):
    # transformWithStateInPandas runs a protobuf-based state-server worker;
    # this container lacks google.protobuf, so the operator is deploy-gated
    # (same policy as the PIL-gated image decode)
    pytest.importorskip("google.protobuf")
    from _data_engineering_pipeline_project_spark.streaming.transform_state import (
        cumulative_threshold_alerts,
    )

    src = str(tmp_path / "tsrc")
    t = datetime
    # batch 1: user 1 reaches 7.0 (no crossing at 10), user 2 reaches 25.0
    # (crosses 10 and 20 in one event)
    spark.createDataFrame(
        [(1, t(2024, 1, 1, 10), 7.0), (2, t(2024, 1, 1, 11), 25.0)], SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)
    # batch 2: user 1 adds 5.0 -> 12.0 (crosses 10); user 2 adds 4.0 -> 29.0
    # (no new crossing) — requires state to have survived batch 1
    spark.createDataFrame(
        [(1, t(2024, 1, 2, 9), 5.0), (2, t(2024, 1, 2, 9), 4.0)], SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)

    rows = cumulative_threshold_alerts(spark, src, SCHEMA, 10.0).collect()
    alerts = sorted(
        (r["user_id"], r["crossed_multiple"], r["running_total"]) for r in rows
    )
    assert alerts == [
        (1, 1, 12.0),   # crossed 10 only once state carried 7.0 forward
        (2, 1, 25.0),   # one event crossing two multiples -> two alerts
        (2, 2, 25.0),
    ]


def test_fold_alerts_pure_semantics():
    from _data_engineering_pipeline_project_spark.streaming.transform_state import (
        fold_alerts,
    )

    # resume from carried state: 7.0 + 5.0 crosses 10 exactly once
    total, crossings, alerts = fold_alerts(7.0, 0, [5.0], 10.0)
    assert (total, crossings, alerts) == (12.0, 1, [(1, 12.0)])
    # one event crossing two multiples fires two alerts
    total, crossings, alerts = fold_alerts(0.0, 0, [25.0], 10.0)
    assert alerts == [(1, 25.0), (2, 25.0)]
    # no re-alerting on multiples already crossed
    total, crossings, alerts = fold_alerts(total, crossings, [4.0], 10.0)
    assert alerts == []
    # landing exactly ON a multiple counts as crossed
    _, _, alerts = fold_alerts(5.0, 0, [5.0], 10.0)
    assert alerts == [(1, 10.0)]


def test_streaming_topk_heavy_hitters(spark, tmp_path):
    """Weighted Misra-Gries top-k across micro-batches: bounded state,
    heavy items guaranteed present, estimates within W/capacity of truth,
    final answer = latest state version per group."""
    import os

    from pyspark.sql import types as T

    from _data_engineering_pipeline_project_spark.streaming.stateful import (
        streaming_topk,
    )

    schema = T.StructType(
        [
            T.StructField("event_type", T.StringType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    src = str(tmp_path / "topk_src")
    os.makedirs(src)
    # group 'click': user 1 dominates (weight 100 over two batches),
    # user 2 second (40); a tail of 20 one-weight users forces evictions
    # at capacity 8. Batch split checks cross-batch merging.
    b1 = [("click", 1, 60.0), ("click", 2, 15.0)] + [
        ("click", 100 + i, 1.0) for i in range(10)
    ]
    b2 = [("click", 1, 40.0), ("click", 2, 25.0)] + [
        ("click", 200 + i, 1.0) for i in range(10)
    ]
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(
        os.path.join(src, "b1")
    )
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(
        os.path.join(src, "b2")
    )

    out = streaming_topk(
        spark,
        src + "/*/",
        schema,
        group_col="event_type",
        item_col="user_id",
        weight_col="value",
        k=2,
        capacity=8,
        query_name="topk_t",
    ).collect()
    got = {r["rank"]: (r["item"], r["est_weight"]) for r in out}
    assert got[1][0] == 1 and got[2][0] == 2  # true heavy hitters, in order
    W = 60 + 15 + 10 + 40 + 25 + 10  # total stream weight = 160
    for rank, truth in ((1, 100.0), (2, 40.0)):
        est = got[rank][1]
        assert truth - W / 8 <= est <= truth  # MG underestimate bound
