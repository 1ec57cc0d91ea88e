"""Maintained exact covariance / PCA sufficient statistics.

``operators/pca.py:pca_fit`` trains the rotation every OPQ/PCA build
needs with one corpus scan (exact integer-lane power sums → driver
eigh). At 100 TB that scan is the single most expensive step of a
re-bootstrap — and it is also completely avoidable: the quantities it
aggregates (count n, per-dim sums Sᵢ, per-pair sums Sᵢⱼ — the Gram
triangle) are EXACT ADDITIVE MONOIDS over the quantized integer lane.
This maintainer keeps them as standing state:

- **state** is d(d+1)/2 + d + 1 DECIMAL(38,0) rows — a few KB at
  d=64, ~2 MB at d=1024 — FOREVER, regardless of rows ingested
  (the DriftMaintainer economics, extended from per-dim moments to
  the full second-moment triangle).
- **tick** = one ``_gram_parts`` pass over the BATCH (numpy XᵀX per
  Arrow batch — the measured gram path, 8.5× the explode form at
  d=256) + one decimal merge of ~d²/2 rows. O(batch·d) compute,
  O(d²) state, no history.
- **serve** — ``covariance_pairs()`` / ``mean()`` / ``model()``
  rebuild the exact doubles with the IDENTICAL final IEEE sequences
  as ``pca_fit(union, method="gram")``: decimal sums are
  associativity-free, so after any tick split the served model is
  BIT-FOR-BIT the one-shot model (pinned by test). That makes this
  the missing half of the re-bootstrap loop: ``BlueGreenIndex.swap``
  can re-train an OPQ rotation from maintained statistics WITHOUT
  re-scanning history — the corpus is touched only to re-encode.

Crash-safety: the house protocol (versioned sums dirs + fsync'd
``_CURRENT`` pointer + batch-id watermark + checkpoint-identity
guard). Sums are not idempotent under re-merge, so the watermark is
load-bearing (the CountMinMaintainer rule). Geometry (dim, columns,
quant scale) is the state's identity — mismatched reopen fails loudly.

CONTRACT: batches are NEW vectors only (append-only corpus — the
Bm25Maintainer rule); updates/deletes are a rebuild. NULL elements /
ragged vectors fail loudly inside ``_gram_parts`` (the gram-form
contract).
"""

from __future__ import annotations

import json
import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_FORMAT = "cov-sums-v1"
_DEC = "decimal(38,0)"


class CovarianceMaintainer:
    """Maintain exact PCA sufficient statistics (n, Sᵢ, Gram triangle)
    over append-only vector batches; the served covariance/mean/model
    equal ``pca_fit(union, method='gram')`` bit-for-bit."""

    _POINTER = "_CURRENT"

    def __init__(
        self,
        spark: SparkSession,
        base_dir: str,
        dim: int,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ):
        self.spark = spark
        self.base_dir = base_dir
        self.dim = int(dim)
        self.id_col = id_col
        self.vec_col = vec_col
        os.makedirs(base_dir, exist_ok=True)
        self._checkpoint_token: str | None = None
        self._meta = self._recover()
        # eager v0 pointer (review r13): sums_v1 lands before the first
        # pointer commit; without a pinned manifest a crash in that
        # window would brick recovery on the orphan guard
        if not os.path.exists(self._pointer_path()):
            self._commit(self._meta)

    # --- pointer protocol -------------------------------------------------
    def _geometry(self) -> dict:
        from _data_engineering_pipeline_project_spark.operators.pca import (
            QUANT_SCALE,
        )

        return {
            "dim": self.dim,
            "id_col": self.id_col,
            "vec_col": self.vec_col,
            "quant_scale": int(QUANT_SCALE),
        }

    def _pointer_path(self) -> str:
        return os.path.join(self.base_dir, self._POINTER)

    def _recover(self) -> dict:
        try:
            with open(self._pointer_path()) as fh:
                try:
                    meta = json.load(fh)
                except json.JSONDecodeError as e:
                    raise ValueError(
                        f"corrupt {self._POINTER} pointer at "
                        f"{self.base_dir} (invalid JSON: {e}); the live "
                        "version and watermark live only in the pointer. "
                        "Restore it from backup or rebuild in a fresh "
                        "base_dir."
                    ) from e
            if meta.get("format") != _FORMAT:
                raise ValueError(
                    f"covariance maintainer state at {self.base_dir} has "
                    f"format {meta.get('format')!r}, expected {_FORMAT!r}"
                )
            want = self._geometry()
            got = {k: meta.get(k) for k in want}
            if got != want:
                raise ValueError(
                    "covariance geometry mismatch: state at "
                    f"{self.base_dir} was built with {got} but this "
                    f"maintainer was opened with {want}; the quantized "
                    "sums are meaningless under a different geometry. "
                    "Reopen with the recorded geometry or rebuild in a "
                    "fresh base_dir."
                )
            self._checkpoint_token = meta.get("checkpoint_token")
            return meta
        except FileNotFoundError:
            pass
        if os.path.isdir(self.base_dir):
            orphaned = sorted(
                n
                for n in os.listdir(self.base_dir)
                if re.match(r"^sums_v\d+$", n)
                and os.path.exists(os.path.join(self.base_dir, n, "_SUCCESS"))
            )
            if orphaned:
                raise ValueError(
                    f"covariance maintainer state at {self.base_dir} has "
                    f"committed sums dirs ({orphaned}) but no "
                    f"{self._POINTER} pointer; the live version lives "
                    "only in the pointer, so this state cannot be safely "
                    "adopted. Restore the pointer from backup or rebuild "
                    "in a fresh base_dir."
                )
        return {
            "format": _FORMAT,
            "version": 0,
            "last_batch_id": None,
            **self._geometry(),
        }

    def _commit(self, meta: dict) -> None:
        meta = {**meta, "checkpoint_token": self._checkpoint_token}
        tmp = self._pointer_path() + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(meta, fh)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, self._pointer_path())
        self._meta = meta

    @property
    def version(self) -> int:
        return int(self._meta["version"])

    def _sums_dir(self, v: int) -> str:
        return os.path.join(self.base_dir, f"sums_v{v}")

    # --- state relation ----------------------------------------------------
    def sums(self) -> DataFrame:
        """(kind, idx, val) exact DECIMAL(38,0) sums: kind 'n' (one
        row, idx 0), 's' (d rows, idx = 0-based dim), 'g' (d(d+1)/2
        rows, idx = upper-triangle slot)."""
        if self.version == 0:
            raise ValueError("no batches merged yet")
        return self.spark.read.parquet(self._sums_dir(self.version))

    # --- maintenance --------------------------------------------------------
    def merge_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """Fold one batch of NEW vectors: one gram pass over the batch,
        one decimal merge of the d²-bounded state. Redelivered batch
        ids at or below the watermark are no-ops (sums are not
        idempotent — the watermark is load-bearing)."""
        last = self._meta.get("last_batch_id")
        if last is not None and batch_id <= last:
            return
        from _data_engineering_pipeline_project_spark.operators.pca import (
            _gram_parts,
        )

        parts = _gram_parts(
            batch_df, self.id_col, self.vec_col, self.dim
        ).persist()
        try:
            self._merge_parts(parts, batch_id)
        finally:
            parts.unpersist()

    def _merge_parts(self, parts: DataFrame, batch_id: int) -> None:
        g = parts.select(F.posexplode("g_part").alias("idx", "v")).select(
            F.lit("g").alias("kind"),
            "idx",
            F.col("v").cast(_DEC).alias("val"),
        )
        s = parts.select(F.posexplode("s_part").alias("idx", "v")).select(
            F.lit("s").alias("kind"),
            "idx",
            F.col("v").cast(_DEC).alias("val"),
        )
        n = parts.select(
            F.lit("n").alias("kind"),
            F.lit(0).alias("idx"),
            F.col("n_part").cast(_DEC).alias("val"),
        )
        batch_sums = (
            g.unionByName(s)
            .unionByName(n)
            .groupBy("kind", "idx")
            .agg(F.sum("val").cast(_DEC).alias("val"))
        )
        v = self.version
        if v > 0:
            cur = self.sums().select(
                "kind", "idx", F.col("val").alias("_val")
            )
            merged = batch_sums.join(
                cur, ["kind", "idx"], "full_outer"
            ).select(
                "kind",
                "idx",
                (
                    F.coalesce(F.col("val"), F.lit(0).cast(_DEC))
                    + F.coalesce(F.col("_val"), F.lit(0).cast(_DEC))
                )
                .cast(_DEC)
                .alias("val"),
            )
        else:
            merged = batch_sums
        nxt = v + 1
        merged.coalesce(1).write.mode("overwrite").parquet(
            self._sums_dir(nxt)
        )
        self._commit(
            {**self._meta, "version": nxt, "last_batch_id": batch_id}
        )
        # GC every superseded sums dir, not just the immediate
        # predecessor — a crash between a past commit and its rmtree
        # would otherwise strand that version forever (review r13);
        # idempotent, and the pointer no longer references any of them
        for name in os.listdir(self.base_dir):
            m = re.match(r"^sums_v(\d+)$", name)
            if m and int(m.group(1)) < nxt:
                shutil.rmtree(
                    os.path.join(self.base_dir, name), ignore_errors=True
                )

    # --- serving ------------------------------------------------------------
    def covariance_pairs(self, include_diagonal: bool = True) -> DataFrame:
        """(dim_i, dim_j, cov) from the maintained sums — the IDENTICAL
        final double arithmetic as ``_covariance_pairs_gram`` (decimal
        sums cast to double, then (n·Sij − Si·Sj)/n²/scale²), so the
        relation equals a one-shot ``covariance_pairs`` over the union
        bit-for-bit."""
        from _data_engineering_pipeline_project_spark.operators.pca import (
            QUANT_SCALE,
        )

        sums = self.sums()
        sij = sums.filter(F.col("kind") == "g").select(
            F.col("idx").alias("t"),
            F.col("val").cast("double").alias("sij"),
        )
        n_row = sums.filter(F.col("kind") == "n").select(
            F.col("val").cast("long").alias("n")
        )
        dims = (
            sums.filter(F.col("kind") == "s")
            .select(
                F.col("idx").alias("i0"),
                F.col("val").cast("double").alias("s"),
            )
            .crossJoin(F.broadcast(n_row))
        )
        dim = self.dim
        tri = [
            (t, i, j)
            for t, (i, j) in enumerate(
                (i, j) for i in range(dim) for j in range(i, dim)
            )
        ]
        from _data_engineering_pipeline_project_spark.functions.localrel import (
            local_df,
        )

        tmap = local_df(self.spark, tri, "t int, i0 int, j0 int")
        di = dims.select(
            F.col("i0").alias("__i"), F.col("s").alias("si"), "n"
        )
        dj = dims.select(F.col("i0").alias("__j"), F.col("s").alias("sj"))
        joined = (
            sij.join(F.broadcast(tmap), "t")
            .join(F.broadcast(di), F.col("i0") == F.col("__i"))
            .join(F.broadcast(dj), F.col("j0") == F.col("__j"))
        )
        n = F.col("n")
        scale2 = float(QUANT_SCALE) * float(QUANT_SCALE)
        res = joined.select(
            (F.col("i0") + 1).cast("int").alias("dim_i"),
            (F.col("j0") + 1).cast("int").alias("dim_j"),
            (
                (n * F.col("sij") - F.col("si") * F.col("sj"))
                / (n * n)
                / F.lit(scale2)
            ).alias("cov"),
        )
        if not include_diagonal:
            res = res.filter(F.col("dim_i") != F.col("dim_j"))
        return res

    def model(self) -> dict:
        """The ``pca_fit`` model dict rebuilt from maintained sums —
        same cov doubles, same mean division, same numpy ``eigh`` +
        descending order, so it is BIT-IDENTICAL to
        ``pca_fit(union, method='gram')`` (pinned by test). Feed it to
        ``opq_allocate`` / ``save_opq_index(model=)`` /
        ``IvfOpqIndexMaintainer.bootstrap(model=)`` to re-train an
        index WITHOUT a history scan."""
        import numpy as np

        from _data_engineering_pipeline_project_spark.operators.pca import (
            QUANT_SCALE,
        )

        dim = self.dim
        rows = self.covariance_pairs(include_diagonal=True).collect()
        if not rows:
            raise ValueError("no sums merged yet; model is undefined")
        cov = np.zeros((dim, dim))
        for r in rows:
            cov[r["dim_i"] - 1, r["dim_j"] - 1] = r["cov"]
            cov[r["dim_j"] - 1, r["dim_i"] - 1] = r["cov"]
        sums = self.sums()
        n_row = sums.filter(F.col("kind") == "n").select(
            F.col("val").cast("long").alias("n")
        )
        mean_rows = (
            sums.filter(F.col("kind") == "s")
            .crossJoin(F.broadcast(n_row))
            .select(
                F.col("idx").alias("i0"),
                (
                    F.col("val").cast("double")
                    / F.col("n")
                    / F.lit(float(QUANT_SCALE))
                ).alias("m"),
            )
            .orderBy("i0")
            .collect()
        )  # bounded: d rows
        w, v = np.linalg.eigh(cov)
        order = np.argsort(w)[::-1]
        return {
            "eigenvalues": [float(w[i]) for i in order],
            "components": [[float(x) for x in v[:, i]] for i in order],
            "mean": [float(r["m"]) for r in mean_rows],
            "dim": dim,
        }

    # --- streaming glue ------------------------------------------------------
    def bind_checkpoint(self, token: str) -> None:
        if self._checkpoint_token is None:
            # commit-on-adopt (the Bm25Maintainer rule, review r13): an
            # in-memory-only token lets a recreated checkpoint slip past
            # the guard whenever the early batches no-op on the
            # watermark and nothing else commits
            self._checkpoint_token = token
            self._commit(self._meta)
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
        """Drain new vector files from ``source_dir`` into the sums."""
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
