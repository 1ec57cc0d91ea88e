"""Custom stateful streaming operator — applyInPandasWithState.

``running_user_stats``: per-user running aggregate (event count, value
sum, last-seen timestamp) maintained across micro-batches in the state
store. This is the engine's pattern for stateful logic Structured
Streaming's built-in aggregations can't express (per-key custom state
machines, CDC-style accumulators, session objects).

State layout: one row per user_id — (count, total, last_ts) — updated per
micro-batch from the Arrow-batched group iterator. Output mode "update":
each batch emits the refreshed rows for keys it touched.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_ts", T.TimestampType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_ts", T.TimestampType()),
    ]
)


def _update_user(
    key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total, last_ts = state.get
    else:
        n, total, last_ts = 0, 0.0, None
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        batch_max = pdf["ts"].max()
        last_ts = batch_max if last_ts is None else max(last_ts, batch_max)
    state.update((n, total, last_ts))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [total],
            "last_ts": [last_ts],
        }
    )


def running_user_stats(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    query_name: str = "user_stats",
) -> DataFrame:
    """Drain the source with AvailableNow, maintaining per-user state."""
    stream = spark.readStream.format("parquet").schema(schema).load(source_dir)
    out = (
        stream.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(
        f"SELECT user_id, max_by(n_events, n_events) AS n_events, "
        f"max_by(total_value, n_events) AS total_value, "
        f"max_by(last_ts, n_events) AS last_ts "
        f"FROM {query_name} GROUP BY user_id"
    )


# --------------------------------------------------------------------------
# Streaming top-k heavy hitters — weighted Misra-Gries summary per group
# --------------------------------------------------------------------------
TOPK_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("group_key", T.StringType()),
        T.StructField("item", T.LongType()),
        T.StructField("est_weight", T.DoubleType()),
        T.StructField("rank", T.IntegerType()),
        T.StructField("version", T.LongType()),
    ]
)

TOPK_STATE_SCHEMA = T.StructType(
    [
        T.StructField("items", T.ArrayType(T.LongType())),
        T.StructField("weights", T.ArrayType(T.DoubleType())),
        T.StructField("version", T.LongType()),
    ]
)


def _merge_mg(counters: dict, updates: dict, capacity: int) -> dict:
    """Merge two weighted Misra-Gries summaries (Agarwal et al., 'Mergeable
    Summaries'): sum counters item-wise, then subtract the (capacity+1)-th
    largest counter from all and keep the positive ones. Guarantees every
    item with true weight > W/capacity survives, with estimates
    underestimating by at most W/capacity (W = total stream weight)."""
    for item, w in updates.items():
        counters[item] = counters.get(item, 0.0) + w
    if len(counters) > capacity:
        spill = sorted(counters.values(), reverse=True)[capacity]
        counters = {
            i: w - spill for i, w in counters.items() if w - spill > 0
        }
    return counters


def _make_topk_updater(k: int, capacity: int):
    def _update(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (group_key,) = key
        counters: dict = {}
        version = 0
        if state.exists:
            items, weights, version = state.get
            counters = dict(zip(items, weights))
        batch: dict = {}
        for pdf in pdfs:
            for item, w in pdf.groupby("item")["weight"].sum().items():
                batch[item] = batch.get(item, 0.0) + float(w)
        counters = _merge_mg(counters, batch, capacity)
        version += 1
        state.update(
            (list(counters.keys()), list(counters.values()), version)
        )
        top = sorted(counters.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        yield pd.DataFrame(
            {
                "group_key": [group_key] * len(top),
                "item": [i for i, _ in top],
                "est_weight": [w for _, w in top],
                "rank": list(range(1, len(top) + 1)),
                "version": [version] * len(top),
            }
        )

    return _update


def streaming_topk(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    group_col: str,
    item_col: str,
    weight_col: str,
    k: int = 5,
    capacity: int = 64,
    query_name: str = "stream_topk",
) -> DataFrame:
    """Streaming top-k per group with BOUNDED state: a weighted
    Misra-Gries heavy-hitter summary (``capacity`` counters per group,
    mergeable across micro-batches) lives in the state store; each batch
    emits the group's refreshed top-``k``. Unlike a per-item running
    aggregate — whose state grows with item cardinality, the failure
    mode of naive streaming top-k — state here is O(groups × capacity)
    forever, and any item holding > 1/capacity of the group's total
    weight is guaranteed present (estimates low by ≤ W/capacity).
    Exact-at-the-top for skewed distributions, which is the regime
    top-k dashboards serve. Drains with AvailableNow; the last batch per
    group is the answer."""
    updater = _make_topk_updater(k, capacity)
    stream = spark.readStream.format("parquet").schema(schema).load(source_dir)
    out = (
        stream.select(
            F.col(group_col).cast("string").alias("gk"),
            F.col(item_col).cast("long").alias("item"),
            F.col(weight_col).cast("double").alias("weight"),
        )
        .groupBy("gk")
        .applyInPandasWithState(
            updater,
            outputStructType=TOPK_OUTPUT_SCHEMA,
            stateStructType=TOPK_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # each batch re-emits the group's full top-k stamped with the state
    # version; the group's LATEST version is its answer
    return spark.sql(
        f"SELECT group_key, item, est_weight, rank FROM ("
        f"  SELECT *, max(version) OVER (PARTITION BY group_key) AS _vmax"
        f"  FROM {query_name}) WHERE version = _vmax"
    )
