"""Incremental materialized-aggregate maintenance.

The reference recomputes everything every 8-minute cycle (reference
project/etl2.py:462-467 re-reads the world and reloads every table). The
scale-correct pattern for a KPI/rollup table over a 100 TB fact stream is
*incremental view maintenance*: aggregate only the NEW micro-batch, then
merge the partial aggregate into the stored rollup. Per-batch cost is
O(batch), not O(history) — the rollup table never rescans the past.

Works because count/sum/min/max are commutative monoids: the merge of two
partial aggregates is expressible column-wise (counts add, sums add, mins
take least, maxes take greatest). avg derives as sum/count at read time.
Non-decomposable aggregates (exact median, distinct count) need either a
sketch (HLL merge — also a monoid) or a full recompute; the engine keeps
those out of the incremental path on purpose.

Storage follows the Scd2Table pattern: each merge writes a new versioned
parquet directory (atomic swap, readers never see a half-written rollup);
with Delta/Iceberg this collapses into a ``MERGE INTO`` on one table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def partial_agg(df: DataFrame, key_cols: list[str], value_col: str) -> DataFrame:
    """One micro-batch's partial aggregate: ``key -> (n, total, vmin, vmax)``."""
    v = F.col(value_col)
    return df.groupBy(*key_cols).agg(
        F.count(v).alias("n"),
        F.sum(v).alias("total"),
        F.min(v).alias("vmin"),
        F.max(v).alias("vmax"),
    )


def merge_rollup(
    part: DataFrame, cur: DataFrame | None, key_cols: list[str]
) -> DataFrame:
    """Monoid-merge a batch partial aggregate into the stored rollup:
    counts/sums add, mins take least, maxes take greatest (least/greatest
    ignore the NULL side a full-outer join produces for keys present in
    only one input). Pure plan — no I/O — so it composes with any storage
    layer and is oracle-checkable."""
    if cur is None:
        return part
    c = cur.select(
        *key_cols,
        F.col("n").alias("_n"),
        F.col("total").alias("_total"),
        F.col("vmin").alias("_vmin"),
        F.col("vmax").alias("_vmax"),
    )
    # zero literal cast to the column's OWN type: an integral sum stays
    # long (exact past 2^53) and the rollup schema never drifts from the
    # batch partial's schema — the monoid identity, not a double
    zero = F.lit(0).cast(part.schema["total"].dataType)
    return part.join(c, key_cols, "full_outer").select(
        *key_cols,
        (F.coalesce("n", F.lit(0)) + F.coalesce("_n", F.lit(0))).alias("n"),
        (F.coalesce("total", zero) + F.coalesce("_total", zero)).alias("total"),
        F.least("vmin", "_vmin").alias("vmin"),
        F.greatest("vmax", "_vmax").alias("vmax"),
    )


class AggMaintainer:
    """Maintain ``key_cols -> (n, total, vmin, vmax)`` over ``value_col``
    incrementally across micro-batches.

    Restart-safe: the committed rollup version persists in a ``_CURRENT``
    pointer file (atomic ``os.replace`` swap, same protocol as
    ``Scd2Table``), so a fresh AggMaintainer over an existing ``base_dir``
    resumes the rollup instead of silently resetting it to the next batch.
    """

    _POINTER = "_CURRENT"

    def __init__(
        self,
        spark: SparkSession,
        base_dir: str,
        key_cols: list[str],
        value_col: str,
    ):
        self.spark = spark
        self.base_dir = base_dir
        self.key_cols = key_cols
        self.value_col = value_col
        self.rollup_dir = os.path.join(base_dir, "rollup")
        os.makedirs(base_dir, exist_ok=True)
        self._version, self._last_batch_id = self._recover_version()

    def _pointer_path(self) -> str:
        return os.path.join(self.base_dir, self._POINTER)

    def _recover_version(self) -> tuple[int, int | None]:
        import json
        import re

        if os.path.exists(self._pointer_path()):
            with open(self._pointer_path()) as f:
                meta = json.load(f)
            self._checkpoint_token = meta.get("checkpoint_token")
            return int(meta["version"]), meta.get("last_batch_id")
        best = 0
        pat = re.compile(r"^rollup_v(\d+)$")
        for name in os.listdir(self.base_dir):
            m = pat.match(name)
            if m and os.path.exists(os.path.join(self.base_dir, name, "_SUCCESS")):
                best = max(best, int(m.group(1)))
        return best, None

    def _commit(self, version: int, batch_id: int | None = None) -> None:
        import json

        tmp = self._pointer_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "version": version,
                    "last_batch_id": batch_id,
                    "checkpoint_token": getattr(
                        self, "_checkpoint_token", None
                    ),
                },
                f,
            )
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._pointer_path())

    @property
    def version(self) -> int:
        return self._version

    def current(self) -> DataFrame | None:
        if self._version == 0:
            return None
        return self.spark.read.parquet(f"{self.rollup_dir}_v{self._version}")

    def result(self) -> DataFrame:
        """The maintained rollup with derived columns (avg = sum/count)."""
        cur = self.current()
        if cur is None:
            raise ValueError("no batches merged yet")
        return cur.withColumn("vavg", F.col("total") / F.col("n"))

    def merge_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """foreachBatch hook: aggregate the batch, monoid-merge into the
        stored rollup. One shuffle over the BATCH (not the history); the
        stored side joins by rollup key — at scale the rollup is orders of
        magnitude smaller than the fact history it summarizes.

        foreachBatch is at-least-once: a re-delivered batch id at or
        below the committed watermark is a no-op (sums/counts are not
        idempotent under re-merge)."""
        if (
            self._last_batch_id is not None
            and batch_id <= self._last_batch_id
        ):
            return
        part = partial_agg(batch_df, self.key_cols, self.value_col)
        merged = merge_rollup(part, self.current(), self.key_cols)
        nxt = self._version + 1
        merged.write.mode("overwrite").parquet(f"{self.rollup_dir}_v{nxt}")
        self._commit(nxt, batch_id)
        self._version = nxt
        self._last_batch_id = batch_id


    def bind_checkpoint(self, token: str) -> None:
        """Guard against a silent streaming-checkpoint reset: foreachBatch
        ids restart at 0 when the checkpoint dir is recreated, and the
        last_batch_id watermark would then absorb real data as
        "redelivery" (code-review r3). The pointer records which
        checkpoint the watermark belongs to; a DIFFERENT checkpoint must
        fail loudly — the operator either restores the checkpoint or
        starts a fresh maintainer base_dir. A maintainer with no recorded
        token (pre-guard pointer, or direct merge_batch use in tests)
        adopts the first token offered."""
        stored = getattr(self, "_checkpoint_token", None)
        if stored is None:
            self._checkpoint_token = token
            return
        if stored != token:
            raise ValueError(
                "streaming checkpoint mismatch: maintainer state was built "
                f"under checkpoint {stored!r} but this run uses {token!r}; "
                "batch ids would restart and the redelivery watermark "
                "would silently drop data. Restore the original "
                "checkpoint or start a new maintainer base_dir."
            )

    def _guarded_hook(self, checkpoint_dir: str):
        """foreachBatch wrapper: resolve the checkpoint IDENTITY (the
        query id in <checkpoint>/metadata — it exists only after the
        query starts) and bind it before delegating; a recreated
        checkpoint at the same path gets a new id and fails loudly."""
        from _data_engineering_pipeline_project_spark.streaming.ckptid import (
            checkpoint_identity,
        )

        def hook(batch_df, batch_id):
            self.bind_checkpoint(checkpoint_identity(checkpoint_dir))
            self.merge_batch(batch_df, batch_id)

        return hook

    def run_available_now(
        self,
        source_dir: str,
        schema: T.StructType,
        checkpoint_dir: str,
        source_format: str = "parquet",
    ) -> None:
        """Drain new files from ``source_dir``, maintaining the rollup.
        The checkpoint makes file discovery incremental: a file merged
        once is never re-aggregated (exactly-once per batch)."""
        stream = (
            self.spark.readStream.format(source_format)
            .schema(schema)
            .load(source_dir)
        )
        q = (
            stream.writeStream.foreachBatch(self._guarded_hook(checkpoint_dir))
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
