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
