"""Streaming CDC snapshot maintenance: an insert/update/delete
changelog stream upserted into a versioned snapshot, micro-batch by
micro-batch.

The reference's sink updates are online row-level SQL statements
(etl2.py:371-380). The lake-side shape is *incremental changelog
compaction*: each micro-batch of changes is merged into the stored
compacted state with ``operators/cdc.apply_changelog`` — per-batch cost
is one PK-keyed window over (stored state ∪ batch), and sequence order
(not arrival order) decides winners, so late and replayed deliveries
are harmless.

Two state subtleties the batch operator alone doesn't cover:

- **Tombstones are state.** The stored form keeps delete winners
  (``keep_tombstones=True``): a tombstone at seq s must outlive the
  batch that delivered it, or a straggler change with a lower sequence
  in a LATER batch would resurrect the key. ``snapshot()`` filters
  tombstones at read time.
- **Redelivery + checkpoint identity.** foreachBatch is at-least-once:
  batch ids at or below the committed watermark are no-ops, and the
  watermark is tokened to the streaming checkpoint's IDENTITY
  (streaming/ckptid.py) so a recreated checkpoint fails loudly instead
  of silently absorbing real batches as "redelivery".

Storage follows the Scd2Table/AggMaintainer protocol: each merge writes
``state_v{n}`` then atomically swaps a ``_CURRENT`` pointer
(``os.replace``), so readers never observe a half-written snapshot and
a restart resumes from the committed version.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql import functions as F

from _data_engineering_pipeline_project_spark.operators.cdc import (
    apply_changelog,
)


class CdcSnapshotMaintainer:
    """Maintain the compacted state of a CDC changelog across
    micro-batches; ``snapshot()`` is the live (tombstone-free) view."""

    _POINTER = "_CURRENT"

    def __init__(
        self,
        spark: SparkSession,
        base_dir: str,
        key_cols: list[str],
        seq_cols: list[str],
        op_col: str = "op",
        delete_op: str = "D",
    ):
        self.spark = spark
        self.base_dir = base_dir
        self.key_cols = key_cols
        self.seq_cols = seq_cols
        self.op_col = op_col
        self.delete_op = delete_op
        self.state_dir = os.path.join(base_dir, "state")
        os.makedirs(base_dir, exist_ok=True)
        self._checkpoint_token: str | None = None
        self._version, self._last_batch_id = self._recover_version()

    # -- pointer protocol (same as AggMaintainer / Scd2Table) ------------
    def _pointer_path(self) -> str:
        return os.path.join(self.base_dir, self._POINTER)

    def _recover_version(self) -> tuple[int, int | None]:
        if os.path.exists(self._pointer_path()):
            with open(self._pointer_path()) as f:
                meta = json.load(f)
            self._checkpoint_token = meta.get("checkpoint_token")
            return int(meta["version"]), meta.get("last_batch_id")
        best = 0
        pat = re.compile(r"^state_v(\d+)$")
        for name in os.listdir(self.base_dir):
            m = pat.match(name)
            if m and os.path.exists(os.path.join(self.base_dir, name, "_SUCCESS")):
                best = max(best, int(m.group(1)))
        return best, None

    def _commit(self, version: int, batch_id: int | None = None) -> None:
        tmp = self._pointer_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "version": version,
                    "last_batch_id": batch_id,
                    "checkpoint_token": self._checkpoint_token,
                },
                f,
            )
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._pointer_path())

    @property
    def version(self) -> int:
        return self._version

    def current_state(self) -> DataFrame | None:
        """Compacted state INCLUDING tombstones (the merge input)."""
        if self._version == 0:
            return None
        return self.spark.read.parquet(f"{self.state_dir}_v{self._version}")

    def snapshot(self) -> DataFrame:
        """The live table: latest winner per key, deletes excluded."""
        cur = self.current_state()
        if cur is None:
            raise ValueError("no batches merged yet")
        return cur.filter(F.col(self.op_col) != self.delete_op)

    # -- merge -----------------------------------------------------------
    def merge_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """foreachBatch hook: compact (stored state ∪ batch) by
        (key, seq) — one window keyed on the PK; the stored side is the
        compacted state (one row per live-or-tombstoned key), not the
        history."""
        if self._last_batch_id is not None and batch_id <= self._last_batch_id:
            return
        cur = self.current_state()
        allc = batch_df if cur is None else cur.unionByName(batch_df)
        merged = apply_changelog(
            allc,
            self.key_cols,
            self.seq_cols,
            self.op_col,
            self.delete_op,
            keep_tombstones=True,
        )
        nxt = self._version + 1
        merged.write.mode("overwrite").parquet(f"{self.state_dir}_v{nxt}")
        self._commit(nxt, batch_id)
        self._version = nxt
        self._last_batch_id = batch_id

    # -- checkpoint identity guard (same protocol as AggMaintainer) ------
    def bind_checkpoint(self, token: str) -> None:
        stored = self._checkpoint_token
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
        """Drain new changelog files from ``source_dir`` into the
        snapshot (exactly-once per batch via the checkpoint +
        watermark)."""
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
