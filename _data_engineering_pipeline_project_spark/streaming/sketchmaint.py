"""Incremental sketch maintenance: KMV distinct-count and fixed-range
histogram sketches merged across micro-batches.

AggMaintainer (aggmaint.py) keeps count/sum/min/max rollups incremental
because they are monoids; it deliberately excludes distinct counts,
whose exact form is not decomposable. This module closes that gap with
the KMV sketch (operators/sketches.py): the k smallest distinct hashes
are ALSO a monoid (merge = k smallest of the union), so a distinct-user
rollup over an unbounded stream costs O(batch) per cycle and
O(k · groups) state — never a rescan of history — and, because
k-smallest merging is EXACT, the maintained sketch equals the one-shot
sketch over all data ever seen (pinned in tests: time-mergeability is
the same property as the partition-mergeability the batch operator
pins).

Storage follows the AggMaintainer/Scd2Table versioned-dir + atomic
pointer protocol; with Delta/Iceberg this is a MERGE INTO on the state
table.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from _data_engineering_pipeline_project_spark.operators.sketches import (
    _HASH_SPACE,
    _hash60,
)


class KmvMaintainer:
    """Maintain a per-group KMV distinct sketch of ``value_col`` across
    micro-batches."""

    _POINTER = "_CURRENT"
    _STATE_NAME = "kmv"

    def __init__(
        self,
        spark: SparkSession,
        base_dir: str,
        group_col: str,
        value_col: str,
        k: int = 64,
    ):
        self.spark = spark
        self.base_dir = base_dir
        self.group_col = group_col
        self.value_col = value_col
        self.k = k
        self.state_dir = os.path.join(base_dir, "kmv")
        os.makedirs(base_dir, exist_ok=True)
        self._version, self._last_batch_id = self._recover_version()

    # --- versioned-state plumbing (Scd2Table protocol) -------------------

    def _pointer_path(self) -> str:
        return os.path.join(self.base_dir, self._POINTER)

    def _recover_version(self) -> tuple[int, int | None]:
        if os.path.exists(self._pointer_path()):
            with open(self._pointer_path()) as f:
                meta = json.load(f)
            self._checkpoint_token = meta.get("checkpoint_token")
            return int(meta["version"]), meta.get("last_batch_id")
        best = 0
        pat = re.compile(rf"^{type(self)._STATE_NAME}_v(\d+)$")
        for name in os.listdir(self.base_dir):
            m = pat.match(name)
            if m and os.path.exists(
                os.path.join(self.base_dir, name, "_SUCCESS")
            ):
                best = max(best, int(m.group(1)))
        return best, None

    def _commit(self, version: int, batch_id: int | None = None) -> None:
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

    def _already_merged(self, batch_id: int) -> bool:
        """foreachBatch is at-least-once: a retried/re-delivered batch id
        at or below the committed watermark must be a no-op (counts are
        not idempotent under re-merge; KMV technically is, but the guard
        keeps both maintainers exactly-once by construction)."""
        return (
            self._last_batch_id is not None
            and batch_id <= self._last_batch_id
        )

    @property
    def version(self) -> int:
        return self._version

    def current(self) -> DataFrame | None:
        if self._version == 0:
            return None
        return self.spark.read.parquet(f"{self.state_dir}_v{self._version}")

    # --- sketch maintenance ----------------------------------------------

    def _batch_sketch(self, batch_df: DataFrame) -> DataFrame:
        """One batch's partial sketch: k smallest distinct hashes per
        group — one distinct + one group-keyed window over the BATCH."""
        hashed = batch_df.select(
            F.col(self.group_col).cast("string").alias("g"),
            _hash60(F.col(self.value_col)).alias("h"),
        ).distinct()
        w = Window.partitionBy("g").orderBy("h")
        return (
            hashed.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= self.k)
            .select("g", "h")
        )

    def merge_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """foreachBatch hook: sketch the batch, monoid-merge with the
        stored sketch (k smallest of the union — exact, so batch
        boundaries are invisible in the result)."""
        if self._already_merged(batch_id):
            return
        part = self._batch_sketch(batch_df)
        cur = self.current()
        merged = part if cur is None else part.unionByName(cur).distinct()
        w = Window.partitionBy("g").orderBy("h")
        topk = (
            merged.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= self.k)
            .select("g", "h")
        )
        nxt = self._version + 1
        topk.write.mode("overwrite").parquet(f"{self.state_dir}_v{nxt}")
        self._commit(nxt, batch_id)
        self._version = nxt
        self._last_batch_id = batch_id

    def estimates(self) -> DataFrame:
        """(group, n_kmv, est_distinct) from the maintained state — the
        same estimator as the batch operator."""
        cur = self.current()
        if cur is None:
            raise ValueError("no batches merged yet")
        return (
            cur.groupBy("g")
            .agg(
                F.count(F.lit(1)).alias("n_kmv"),
                F.round(
                    F.when(
                        F.count(F.lit(1)) < self.k,
                        F.count(F.lit(1)).cast("double"),
                    ).otherwise(
                        (F.lit(self.k - 1) * _HASH_SPACE)
                        / F.max("h").cast("double")
                    ),
                    4,
                ).alias("est_distinct"),
            )
            .select(
                F.col("g").alias(self.group_col), "n_kmv", "est_distinct"
            )
        )


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
        """Drain new files from ``source_dir``, maintaining the sketch;
        the checkpoint makes file discovery exactly-once per batch."""
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


class HistogramMaintainer:
    """Maintain per-group fixed-range bin counts across micro-batches;
    quantiles derive at read time.

    Unlike the batch ``binned_quantiles`` (which bins inside the
    observed [min, max] — a range that would SHIFT as new data arrives,
    breaking incremental merges), the maintained histogram fixes
    ``(lo, hi)`` at construction: bin counts then form a plain additive
    monoid in time, the same trade every production histogram metric
    (Prometheus buckets, HDR histograms) makes. Out-of-range values
    clamp into the edge bins, and the estimate degrades gracefully —
    still never a rescan of history.
    """

    _POINTER = "_CURRENT"
    _STATE_NAME = "hist"

    def __init__(
        self,
        spark: SparkSession,
        base_dir: str,
        group_col: str,
        value_col: str,
        lo: float,
        hi: float,
        bins: int = 256,
    ):
        if not hi > lo:
            raise ValueError("hi must exceed lo")
        self.spark = spark
        self.base_dir = base_dir
        self.group_col = group_col
        self.value_col = value_col
        self.lo = float(lo)
        self.hi = float(hi)
        self.bins = bins
        self.state_dir = os.path.join(base_dir, "hist")
        os.makedirs(base_dir, exist_ok=True)
        self._version, self._last_batch_id = self._recover_version()

    _pointer_path = KmvMaintainer._pointer_path
    _commit = KmvMaintainer._commit
    _recover_version = KmvMaintainer._recover_version
    _already_merged = KmvMaintainer._already_merged

    @property
    def version(self) -> int:
        return self._version

    def current(self) -> DataFrame | None:
        if self._version == 0:
            return None
        return self.spark.read.parquet(f"{self.state_dir}_v{self._version}")

    def _batch_hist(self, batch_df: DataFrame) -> DataFrame:
        width = (self.hi - self.lo) / float(self.bins)
        v = F.col(self.value_col).cast("double")
        bin_ = F.least(
            F.greatest(F.floor((v - F.lit(self.lo)) / F.lit(width)), F.lit(0)),
            F.lit(self.bins - 1),
        ).cast("int")
        return (
            batch_df.filter(v.isNotNull())
            .select(
                F.col(self.group_col).cast("string").alias("g"),
                bin_.alias("bin"),
            )
            .groupBy("g", "bin")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )

    def merge_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        if self._already_merged(batch_id):
            return  # at-least-once redelivery: bin counts must not double
        part = self._batch_hist(batch_df)
        cur = self.current()
        merged = (
            part
            if cur is None
            else part.unionByName(cur)
            .groupBy("g", "bin")
            .agg(F.sum("cnt").alias("cnt"))
        )
        nxt = self._version + 1
        merged.write.mode("overwrite").parquet(f"{self.state_dir}_v{nxt}")
        self._commit(nxt, batch_id)
        self._version = nxt
        self._last_batch_id = batch_id

    def quantiles(self, probs: tuple = (0.5, 0.9, 0.99)) -> DataFrame:
        """(group, p, quantile_est) from the maintained counts — same
        interpolation as operators.sketches.binned_quantiles, over the
        FIXED [lo, hi] range."""
        cur = self.current()
        if cur is None:
            raise ValueError("no batches merged yet")
        w = Window.partitionBy("g").orderBy("bin").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        cum = cur.withColumn("cum", F.sum("cnt").over(w)).withColumn(
            "cum_below", F.col("cum") - F.col("cnt")
        )
        totals = cur.groupBy("g").agg(F.sum("cnt").alias("n"))
        targets = totals.select(
            "g",
            "n",
            F.explode(F.array(*[F.lit(float(p)) for p in probs])).alias("p"),
        ).withColumn("target", F.col("p") * F.col("n"))
        width = (self.hi - self.lo) / float(self.bins)
        hit = (
            targets.join(cum, "g")
            .filter(F.col("cum") >= F.col("target"))
            .groupBy("g", "p", "target")
            .agg(
                F.min_by(
                    F.struct(F.col("bin"), F.col("cnt"), F.col("cum_below")),
                    F.col("bin"),
                ).alias("b")
            )
        )
        est = F.lit(self.lo) + F.lit(width) * (
            F.col("b.bin")
            + F.greatest(
                (F.col("target") - F.col("b.cum_below").cast("double"))
                / F.col("b.cnt").cast("double"),
                F.lit(0.0),
            )
        )
        return hit.select(
            F.col("g").alias(self.group_col),
            "p",
            F.round(est, 6).alias("quantile_est"),
        )
