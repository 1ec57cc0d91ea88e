"""Custom stateful operator on the transformWithStateInPandas API
(Spark 4's successor to applyInPandasWithState — explicit named state
variables, timers, TTL; backed by the RocksDB state store on a cluster).

``cumulative_threshold_alerts``: per-key running total over a value
stream; emits one alert row each time the cumulative total crosses
another multiple of ``threshold`` — the shape of quota tracking, billing
tiers, and rate alerting. The operator is deterministic given batch
contents (rows within a batch are folded in (ts, value) order), so the
test can assert exact alerts.

Scale notes: state is one (total, crossings) pair per key — O(keys), not
O(events); the state store shards by the groupBy key alongside the
shuffle, so a 100 TB stream with 10^9 keys distributes state across
executors with no driver involvement. ValueState round-trips via Arrow
per key-batch, not per row.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("crossed_multiple", T.LongType()),
        T.StructField("running_total", T.DoubleType()),
    ]
)

STATE_SCHEMA = "total double, crossings bigint"


def fold_alerts(
    total: float, crossings: int, values: list[float], threshold: float
) -> tuple[float, int, list[tuple[int, float]]]:
    """Pure fold: feed ``values`` into the running total, returning the new
    (total, crossings) state and the (multiple, total_at_alert) alerts
    fired. Separated from the processor so the semantics are unit-testable
    without the streaming runtime."""
    alerts: list[tuple[int, float]] = []
    for v in values:
        total += float(v)
        new_crossings = int(total // threshold)
        for m in range(crossings + 1, new_crossings + 1):
            alerts.append((m, total))
        crossings = max(crossings, new_crossings)
    return total, crossings, alerts


class ThresholdAlertProcessor(StatefulProcessor):
    def __init__(self, threshold: float):
        self.threshold = threshold

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.state = handle.getValueState("running", STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        total, crossings = (
            self.state.get() if self.state.exists() else (0.0, 0)
        )
        out: list[tuple[int, int, float]] = []
        for pdf in rows:
            # deterministic intra-batch fold order
            vals = list(pdf.sort_values(["ts", "value"])["value"])
            total, crossings, alerts = fold_alerts(
                total, crossings, vals, self.threshold
            )
            out += [(user_id, m, t) for m, t in alerts]
        self.state.update((total, crossings))
        if out:
            yield pd.DataFrame(
                out, columns=["user_id", "crossed_multiple", "running_total"]
            )

    def close(self) -> None:
        pass


def cumulative_threshold_alerts(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    threshold: float,
    query_name: str = "threshold_alerts",
) -> DataFrame:
    """Drain ``source_dir`` with AvailableNow, emitting threshold-crossing
    alerts; state (running totals) survives across micro-batches."""
    stream = spark.readStream.format("parquet").schema(schema).load(source_dir)
    out = (
        stream.select("user_id", "ts", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            ThresholdAlertProcessor(threshold),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="append",
            timeMode="none",
        )
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)
