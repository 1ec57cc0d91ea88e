"""Change-data-capture apply: reconstruct the latest snapshot from an
insert/update/delete changelog (the Debezium/Delta-CDF compaction step).

The reference applies row-level UPDATEs directly against its SQL sink
(etl2.py:371-380) — online, one statement per row. The lake-side
equivalent ingests an append-only changelog and periodically compacts
it to a snapshot: per key keep the HIGHEST-sequence change, drop keys
whose last change is a delete. That is one window (or max_by aggregate)
keyed on the primary key — a single shuffle, no per-row statements, and
late/out-of-order changes are handled by the sequence ordering rather
than arrival order. Replayed changes (at-least-once transports deliver
dupes) collapse because (key, seq) ties keep exactly one row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def apply_changelog(
    changes: DataFrame,
    key_cols: list[str],
    seq_cols: list[str],
    op_col: str = "op",
    delete_op: str = "D",
    keep_tombstones: bool = False,
) -> DataFrame:
    """Compact a changelog to its latest snapshot.

    ``changes``: one row per change with key columns, ordering columns
    (monotone per key — commit LSN, timestamp+batch, …), an op column
    ('I'/'U'/'D'), and the payload. Highest (seq, op) wins per key —
    including op in the tie-break makes exact (key, seq) replays
    deterministic; the snapshot excludes keys whose winner is a delete.

    ``keep_tombstones=True`` retains delete winners (the INCREMENTAL
    compaction state): dropping a tombstone loses the information that
    the key died at seq s, so a LATE change with a LOWER sequence
    arriving in a later batch would wrongly resurrect it. Streaming
    maintainers store the tombstoned form and filter deletes at read.
    """
    order = [F.col(c).desc() for c in seq_cols] + [F.col(op_col).desc()]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    if keep_tombstones:
        return latest
    return latest.filter(F.col(op_col) != delete_op)
