"""Incremental embedding-drift maintenance across micro-batches.

The batch drift audit (``queries_ext10.py:
embedding_drift_audit_embeddings``) compares two SNAPSHOTS by
recomputing per-dimension mean/variance from exact integer power sums.
A deployed drift monitor asks the same question CONTINUOUSLY — "is the
encoder's output distribution moving?" — and recomputing history every
tick is the reference's recompute-the-world anti-pattern
(project/etl2.py:462-467). The per-dim power sums are the same
commutative monoid the gram covariance partials already ride
(``operators/pca.py``): (n, Σv, Σv²) per dimension, exact integers on
the 2^20 quantized lane, so maintaining them incrementally is a
versioned-dir merge bounded by ``d`` rows per tick — O(batch) hashing,
never a history rescan — exactly the AggMaintainer economics applied
to embedding space.

State relation: ``(i0, n, s, sii)`` — dimension index, count, sum,
sum-of-squares, the integer sums held as DECIMAL(38,0) (Σv² reaches
n·2^44, past int64 at ~500k rows; decimal keeps the monoid EXACT
through petabyte counts, the covariance-lane discipline). Mean and
variance derive at READ time with the identical double-division
sequence the batch audit uses, so the maintained stats after N ticks
are BIT-IDENTICAL to a one-shot recompute over the union of batches
(pinned by test) — the property that makes the maintained monitor as
trustworthy as the oracled audit.

Baselining: ``mark_baseline()`` pins the CURRENT version as the
reference distribution (recorded in the pointer; ``vacuum_versions``
never drops it). ``drift_report()`` then emits the audit-shaped
relation — per-dim baseline-vs-now mean shift and variance ratio, top
shifted dims first — from two bounded d-row reads. The operational
loop: accumulate a trusted window, mark it, keep merging ticks, alert
on the report; re-mark after an accepted encoder change.

Versioned-dir + fsync'd atomic pointer + checkpoint-identity guard:
the house maintainer protocol (aggmaint.py / bloommaint.py).
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from _data_engineering_pipeline_project_spark.operators.pca import (
    QUANT_SCALE,
    quantized_elements,
)

_DEC = "decimal(38,0)"


def drift_partials(
    df: DataFrame, vec_col: str = "embedding", id_col: str | None = None
) -> DataFrame:
    """One batch's exact per-dimension power sums ``(i0, n, s, sii)``
    on the quantized lane — d output rows, one explode + one groupBy
    with map-side partials. NULL vectors are dropped (the embedding
    contract; a NULL would explode to nothing anyway)."""
    cols = df.columns
    key = id_col or cols[0]
    vq = quantized_elements(df, key, vec_col).filter(
        F.col("v").isNotNull()
    )
    return (
        vq.select(F.posexplode("v").alias("i0", "vi"))
        .groupBy("i0")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("vi").cast(_DEC)).alias("s"),
            F.sum((F.col("vi") * F.col("vi")).cast(_DEC)).alias("sii"),
        )
    )


def merge_partials(part: DataFrame, cur: DataFrame | None) -> DataFrame:
    """Monoid-merge: counts and decimal sums add; keys present on one
    side keep their values (full-outer + coalesce-to-zero). Exact —
    decimal addition never rounds."""
    if cur is None:
        return part
    c = cur.select(
        "i0",
        F.col("n").alias("_n"),
        F.col("s").alias("_s"),
        F.col("sii").alias("_sii"),
    )
    zero = F.lit(0).cast(_DEC)
    return part.join(c, "i0", "full_outer").select(
        "i0",
        (F.coalesce("n", F.lit(0)) + F.coalesce("_n", F.lit(0))).alias("n"),
        (F.coalesce("s", zero) + F.coalesce("_s", zero)).cast(_DEC).alias("s"),
        (F.coalesce("sii", zero) + F.coalesce("_sii", zero))
        .cast(_DEC)
        .alias("sii"),
    )


def moments_from_partials(parts: DataFrame) -> DataFrame:
    """(dim, mu, var) from the exact sums, with the IDENTICAL double
    arithmetic sequence as the batch drift audit (cast-to-double sums,
    ``s/n/scale`` and ``(n·sii − s²)/n²/scale²``) — so maintained
    moments equal a one-shot recompute bit-for-bit."""
    n = F.col("n")
    s = F.col("s").cast("double")
    sii = F.col("sii").cast("double")
    scale = float(QUANT_SCALE)
    return parts.select(
        (F.col("i0") + 1).cast("int").alias("dim"),
        "n",
        (s / n / F.lit(scale)).alias("mu"),
        ((n * sii - s * s) / (n * n) / F.lit(scale * scale)).alias("var"),
    )


class DriftMaintainer:
    """Maintain per-dimension embedding moments incrementally; compare
    against a pinned baseline. Batches are frames with the vector in
    ``vec_col`` (first column serves as the id for quantization)."""

    _POINTER = "_CURRENT"
    _STATE_NAME = "moments"

    def __init__(
        self, spark: SparkSession, base_dir: str, vec_col: str = "embedding"
    ):
        self.spark = spark
        self.base_dir = base_dir
        self.vec_col = vec_col
        self.state_dir = os.path.join(base_dir, self._STATE_NAME)
        os.makedirs(base_dir, exist_ok=True)
        self._checkpoint_token: str | None = None
        (
            self._version,
            self._last_batch_id,
            self._baseline_version,
        ) = self._recover()

    # --- pointer protocol -------------------------------------------------

    def _pointer_path(self) -> str:
        return os.path.join(self.base_dir, self._POINTER)

    def _recover(self) -> tuple[int, int | None, int | None]:
        try:
            with open(self._pointer_path()) as f:
                try:
                    meta = json.load(f)
                except json.JSONDecodeError as e:
                    raise ValueError(
                        f"corrupt {self._POINTER} pointer at "
                        f"{self.base_dir} (invalid JSON: {e}); the "
                        "batch-id watermark and the pinned baseline "
                        "version live only in the pointer, so the "
                        "state cannot be safely merged into. Restore "
                        "the pointer from backup or rebuild in a fresh "
                        "base_dir."
                    ) from e
            if "version" not in meta:
                raise ValueError(
                    f"corrupt {self._POINTER} pointer at {self.base_dir}"
                    " (no 'version' field — truncated or foreign write);"
                    " restore the pointer from backup or rebuild in a "
                    "fresh base_dir."
                )
            self._checkpoint_token = meta.get("checkpoint_token")
            self._dim = meta.get("dim")
            if meta.get("vec_col", self.vec_col) != self.vec_col:
                raise ValueError(
                    "drift geometry mismatch: state at "
                    f"{self.base_dir} tracks column "
                    f"{meta.get('vec_col')!r} but this maintainer was "
                    f"opened with vec_col={self.vec_col!r}; merging "
                    "moments of different columns is silent garbage. "
                    "Reopen with the recorded column or rebuild in a "
                    "fresh base_dir."
                )
            return (
                int(meta["version"]),
                meta.get("last_batch_id"),
                meta.get("baseline_version"),
            )
        except FileNotFoundError:
            pass
        self._dim = None
        # pointer lost with state dirs present: power sums are NOT
        # idempotent under re-merge (the watermark is load-bearing) and
        # the pinned baseline version is recorded only in the pointer —
        # adopting the newest moments_v* dir would double-count
        # redelivered batches AND silently forget which version the
        # drift report compares against. Fail loudly (the
        # Bm25Maintainer rule, extended per VERDICT r11 #7).
        pat = re.compile(rf"^{self._STATE_NAME}_v(\d+)$")
        if os.path.isdir(self.base_dir):
            orphaned = sorted(
                n
                for n in os.listdir(self.base_dir)
                if pat.match(n)
                and os.path.exists(os.path.join(self.base_dir, n, "_SUCCESS"))
            )
            if orphaned:
                raise ValueError(
                    f"drift maintainer state at {self.base_dir} has "
                    f"committed moments dirs ({orphaned}) but no "
                    f"{self._POINTER} pointer; the batch-id watermark "
                    "and baseline version live only in the pointer and "
                    "power-sum merges are not idempotent, so this "
                    "state cannot be safely adopted. Restore the "
                    "pointer from backup or rebuild in a fresh "
                    "base_dir."
                )
        return 0, None, None

    def _commit(self, version: int, batch_id: int | None = None) -> None:
        tmp = self._pointer_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "version": version,
                    "last_batch_id": batch_id,
                    "baseline_version": self._baseline_version,
                    "checkpoint_token": self._checkpoint_token,
                    "vec_col": self.vec_col,
                    "dim": self._dim,
                },
                f,
            )
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._pointer_path())

    @property
    def version(self) -> int:
        return self._version

    @property
    def baseline_version(self) -> int | None:
        return self._baseline_version

    def current(self) -> DataFrame | None:
        if self._version == 0:
            return None
        return self.spark.read.parquet(f"{self.state_dir}_v{self._version}")

    # --- maintenance --------------------------------------------------------

    def merge_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """foreachBatch hook: quantize + power-sum the batch (one
        shuffle over the BATCH), decimal-merge into the stored d-row
        state, commit the next version. At-least-once safe via the
        batch-id watermark (sums are not idempotent under re-merge)."""
        if (
            self._last_batch_id is not None
            and batch_id <= self._last_batch_id
        ):
            return
        # cached so the width guard's count and the merge write share
        # ONE batch aggregation (the frame is d rows — trivial storage)
        part = drift_partials(batch_df, self.vec_col).cache()
        try:
            # width guard (adversarial sweep r11): moments of a d=8
            # stream and a d=16 stream union into a relation where the
            # extra dims silently carry partial counts — garbage no
            # downstream read can detect. The partials frame is d rows,
            # so the check is a bounded count; the first batch pins the
            # width into the pointer.
            d_batch = part.count()
            if d_batch == 0:
                return  # empty/all-NULL batch: nothing to merge
            if self._dim is None:
                self._dim = int(d_batch)
            elif int(d_batch) != self._dim:
                raise ValueError(
                    f"drift geometry mismatch: state at {self.base_dir} "
                    f"tracks {self._dim}-dim vectors but this batch has "
                    f"width {d_batch}; a changed encoder width needs a "
                    "new base_dir (and a new baseline)."
                )
            merged = merge_partials(part, self.current())
            nxt = self._version + 1
            merged.coalesce(1).write.mode("overwrite").parquet(
                f"{self.state_dir}_v{nxt}"
            )
            self._commit(nxt, batch_id)
            self._version = nxt
            self._last_batch_id = batch_id
        finally:
            part.unpersist()

    def moments(self) -> DataFrame:
        """(dim, n, mu, var) of everything merged so far."""
        cur = self.current()
        if cur is None:
            raise ValueError("no batches merged yet")
        return moments_from_partials(cur)

    # --- baselining + report ------------------------------------------------

    def mark_baseline(self) -> int:
        """Pin the current version as the reference distribution. The
        pointer records it (crash-safe) and vacuum never drops it."""
        if self._version == 0:
            raise ValueError("no batches merged yet")
        self._baseline_version = self._version
        self._commit(self._version, self._last_batch_id)
        return self._baseline_version

    def drift_report(self, top: int = 10) -> DataFrame:
        """Audit-shaped drift relation — per-dim baseline-vs-now mean
        shift and variance ratio, largest mean shift first (the
        ``embedding_drift_audit`` columns, so dashboards and oracles
        transfer). Two bounded d-row reads; no corpus scan."""
        if self._baseline_version is None:
            raise ValueError("no baseline marked (call mark_baseline)")
        base = moments_from_partials(
            self.spark.read.parquet(
                f"{self.state_dir}_v{self._baseline_version}"
            )
        ).select(
            "dim", F.col("mu").alias("mu_a"), F.col("var").alias("var_a")
        )
        now = self.moments().select(
            "dim", F.col("mu").alias("mu_b"), F.col("var").alias("var_b")
        )
        return (
            base.join(now, "dim")
            .select(
                "dim",
                F.round("mu_a", 8).alias("mean_a"),
                F.round("mu_b", 8).alias("mean_b"),
                F.round(F.abs(F.col("mu_a") - F.col("mu_b")), 8).alias(
                    "mean_shift"
                ),
                F.round("var_a", 8).alias("var_a"),
                F.round("var_b", 8).alias("var_b"),
                F.round(F.col("var_b") / F.col("var_a"), 6).alias(
                    "var_ratio"
                ),
            )
            .orderBy(F.col("mean_shift").desc(), "dim")
            .limit(top)
        )

    # --- streaming glue (house pattern) ---------------------------------------

    def bind_checkpoint(self, token: str) -> None:
        if self._checkpoint_token is None:
            self._checkpoint_token = token
            return
        if self._checkpoint_token != token:
            raise ValueError(
                "streaming checkpoint mismatch: maintainer state was "
                f"built under checkpoint {self._checkpoint_token!r} but "
                f"this run uses {token!r}. Restore the original "
                "checkpoint or start a new maintainer base_dir."
            )

    def _guarded_hook(self, checkpoint_dir: str):
        from _data_engineering_pipeline_project_spark.streaming.ckptid import (
            checkpoint_identity,
        )

        def hook(batch_df: DataFrame, batch_id: int) -> None:
            self.bind_checkpoint(checkpoint_identity(checkpoint_dir))
            self.merge_batch(batch_df, batch_id)

        return hook

    def run_available_now(
        self,
        source_dir: str,
        schema: T.StructType | str,
        checkpoint_dir: str,
        source_format: str = "parquet",
    ) -> None:
        """Drain new files from ``source_dir`` into the moment state."""
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

    def vacuum_versions(self, keep_last: int = 2) -> list[str]:
        """Drop moments_v* older than the last ``keep_last`` versions,
        ALWAYS keeping the pinned baseline version."""
        import shutil

        removed = []
        pat = re.compile(
            re.escape(os.path.basename(self.state_dir)) + r"_v(\d+)$"
        )
        for name in os.listdir(self.base_dir):
            m = pat.match(name)
            if not m:
                continue
            v = int(m.group(1))
            if v == self._baseline_version:
                continue
            if v <= self._version - keep_last:
                shutil.rmtree(os.path.join(self.base_dir, name))
                removed.append(name)
        return removed
