"""Small-file compaction maintainer — the lakehouse OPTIMIZE loop.

A streaming sink (micro-batch appends, `streaming/microbatch.py`) or a
chunked loader (`sources/sinks.py`) accretes many small parquet files;
at 100 TB the scan cost of a table is dominated by file-open overhead
and un-skippable row groups long before bytes matter. The standard
maintenance loop — Delta/Iceberg ``OPTIMIZE [ZORDER BY]`` — rewrites
accumulated small files into target-sized, optionally z-ordered files.
This module is that loop composed from Spark primitives:

- **Detection** is metadata-only: one driver-side file listing (the
  same information a table format's manifest holds); no data scan
  decides whether to compact.
- **Rewrite** is one distributed job over ONLY the small files:
  ``repartitionByRange`` on the cluster key (or the Morton key of two
  keys, `operators/sampling.py:zorder_value`) + ``sortWithinPartitions``
  → each output file covers a tight key range, so row-group min/max
  stats prune reads on the clustered column(s).
- **Commit** follows the house `Scd2Table` protocol: the compacted
  generation lands in a fresh ``gen_v{N}`` directory, then a
  ``_CURRENT`` pointer file swaps atomically (``os.replace``) — readers
  resolve the pointer and never see a half-written generation; a
  crashed compaction leaves an orphan directory, not a broken table.
  Files that arrive DURING a compaction are not lost: they stay in the
  landing directory and ride the next generation.

The reference has no counterpart (single-node pandas appends to CSV,
project/etl2.py); this is pure Spark operational machinery, pytest-
pinned (rows preserved bit-exactly, stats tightened, no-op when below
threshold, crash leaves previous generation readable).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

_POINTER = "_CURRENT"


def _landing_files(landing_dir: str) -> list[str]:
    if not os.path.isdir(landing_dir):
        return []
    return sorted(
        os.path.join(landing_dir, f)
        for f in os.listdir(landing_dir)
        if f.endswith(".parquet")
    )


class CompactionMaintainer:
    """Compact a parquet LANDING directory into versioned, clustered
    GENERATIONS under ``table_dir``.

    Parameters
    ----------
    landing_dir : where the stream/loader appends small files.
    table_dir : home of ``gen_v{N}`` generations + the ``_CURRENT``
        pointer; ``read_current`` serves the union of the committed
        generation and any not-yet-compacted landing files (so readers
        always see every committed row, compacted or not).
    cluster_cols : 1 or 2 columns to cluster output files by. Two
        columns cluster on their Morton interleave (z-order), one on
        its own range — both via ``repartitionByRange`` +
        ``sortWithinPartitions`` so every output file is a tight slice.
    min_files : compaction triggers only when the landing directory
        holds at least this many files (the OPTIMIZE debounce — running
        on every tiny append would churn write amplification).
    target_rows_per_file : output sizing knob (rows, since the local
        harness has no reliable size estimator; a deployment would size
        by bytes from the listing's file sizes the same way).
    """

    def __init__(
        self,
        landing_dir: str,
        table_dir: str,
        cluster_cols: list[str],
        min_files: int = 8,
        target_rows_per_file: int = 100_000,
    ) -> None:
        if not 1 <= len(cluster_cols) <= 2:
            raise ValueError("cluster_cols must name 1 or 2 columns")
        self.landing_dir = landing_dir
        self.table_dir = table_dir
        self.cluster_cols = cluster_cols
        self.min_files = min_files
        self.target_rows_per_file = target_rows_per_file
        os.makedirs(table_dir, exist_ok=True)

    # -- pointer protocol (Scd2Table pattern) ---------------------------
    def _pointer_path(self) -> str:
        return os.path.join(self.table_dir, _POINTER)

    def current_version(self) -> int | None:
        try:
            with open(self._pointer_path()) as fh:
                return int(fh.read().strip())
        except (FileNotFoundError, ValueError):
            return None

    def _gen_dir(self, version: int) -> str:
        return os.path.join(self.table_dir, f"gen_v{version}")

    def _commit(self, version: int) -> None:
        tmp = self._pointer_path() + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(str(version))
        os.replace(tmp, self._pointer_path())  # atomic on POSIX

    # -- read path ------------------------------------------------------
    def read_current(self, spark: SparkSession) -> DataFrame:
        """Committed generation ∪ not-yet-compacted landing files —
        every committed row is visible whether or not it was compacted
        yet (the table-format contract)."""
        sources = []
        v = self.current_version()
        if v is not None:
            sources.append(self._gen_dir(v))
        sources.extend(_landing_files(self.landing_dir))
        if not sources:
            raise FileNotFoundError(
                f"no generation and no landing files under {self.table_dir}"
            )
        return spark.read.parquet(*sources)

    # -- maintenance tick ----------------------------------------------
    def run_once(self, spark: SparkSession) -> dict:
        """One maintenance tick: if the landing directory holds ≥
        ``min_files`` files, fold them PLUS the current generation into
        a new clustered generation, commit the pointer, and delete the
        consumed landing files (only after the commit — a crash between
        write and commit leaves the old generation + all landing files,
        i.e. no data loss, just an orphan ``gen_v`` dir).

        Returns a summary dict (``compacted`` False = debounced no-op).
        """
        files = _landing_files(self.landing_dir)
        if len(files) < self.min_files:
            return {"compacted": False, "landing_files": len(files)}

        v = self.current_version()
        sources = ([self._gen_dir(v)] if v is not None else []) + files
        df = spark.read.parquet(*sources)
        n_rows = df.count()
        n_out = max(1, -(-n_rows // self.target_rows_per_file))

        if len(self.cluster_cols) == 2:
            from _data_engineering_pipeline_project_spark.operators.sampling import (
                zorder_value,
            )

            key = zorder_value(self.cluster_cols[0], self.cluster_cols[1])
        else:
            from pyspark.sql import functions as F

            key = F.col(self.cluster_cols[0])
        clustered = (
            df.withColumn("__ck", key)
            .repartitionByRange(n_out, "__ck")
            .sortWithinPartitions("__ck")
            .drop("__ck")
        )
        new_v = (v or 0) + 1
        clustered.write.mode("overwrite").parquet(self._gen_dir(new_v))
        self._commit(new_v)
        for f in files:  # consumed — safe only AFTER the pointer swap
            os.remove(f)
        return {
            "compacted": True,
            "version": new_v,
            "rows": n_rows,
            "input_files": len(sources),
            "output_files": n_out,
        }
