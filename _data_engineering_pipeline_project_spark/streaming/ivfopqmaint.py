"""Maintained IVF-OPQ: the production ANN index form (FAISS IVF-OPQ
``add()``), composed from the engine's two incremental halves.

``OpqIndexMaintainer`` maintains the FROZEN-rotation PQ codes (bytes
per candidate); ``IvfIndexMaintainer`` maintains the coarse inverted
lists (candidates per query). r11 shipped them separately and the
registered ``embedding_topk_ivfopq`` served a session-memoized
recompute — this class (VERDICT r11 #1) is the composition that makes
the FAISS-standard index form incrementally maintained END TO END:

- **bootstrap** — one offline job: ``save_opq_index`` trains the
  rotation + codebooks and encodes the seed (frozen thereafter), the
  IVF quantizer is fit on the ROTATED seed (``ivf_seed_centroids`` —
  centroids live in code space, exactly FAISS's OPQ-then-IVF layout),
  and the rotated seed is ingested into the lists.
- **tick** — rotate the BATCH with the frozen model (O(batch) Arrow
  map), append its codes (inner maintainer, batch-id watermarked) and
  its list assignments (broadcast-centroid ``ivf_assign`` + a
  partitioned append). Cost is O(batch·m·ksub + batch·C) — no shuffle
  or rewrite of history; flat in index size (measured, SCALE.md).
- **serve** — rotate only the QUERY vectors, probe the ``nprobe``
  nearest lists, read ONLY probed lists' files (the
  ``IvfIndexMaintainer`` resolver), ADC-score candidates against the
  maintained codes: the exact ``ivfpq_topk`` arithmetic, so after any
  number of ticks the served top-k equals a one-shot frozen-model
  build over the accumulated corpus BIT-FOR-BIT (pinned by test).

Crash-safety composition: the codes half is exactly-once (versioned
batch dirs + fsync'd pointer + watermark — the OpqIndexMaintainer
protocol). The lists half is an immutable-file APPEND with no
watermark of its own, so a crash between the codes commit and the
outer pointer commit can leave a redelivered batch's assignments in
the lists TWICE. Assignment is deterministic (same frozen centroids →
same list, identical rows), so the serve path collapses duplicates
with a DISTINCT on the candidate sliver — (query, id) pairs after the
probe restriction, never the corpus — making served results exact
under any crash/redelivery interleaving (pinned by test). The outer
pointer only carries the watermark + checkpoint identity; state
recovery follows the house rules (orphaned halves fail loudly through
their own maintainers' guards).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_FORMAT = "ivf-opq-v1"


class IvfOpqIndexMaintainer:
    """Composed maintained IVF-OPQ index under ``base_dir``:
    ``opq/`` (an ``OpqIndexMaintainer`` — frozen rotation + codebooks
    + growing codes), ``ivf/`` (an ``IvfIndexMaintainer`` over rotated
    vectors — frozen coarse quantizer + growing lists), ``_CURRENT``
    (outer watermark)."""

    _POINTER = "_CURRENT"

    def __init__(
        self, spark: SparkSession, base_dir: str, num_centroids: int = 8
    ):
        from _data_engineering_pipeline_project_spark.streaming.annmaint import (
            IvfIndexMaintainer,
        )
        from _data_engineering_pipeline_project_spark.streaming.opqmaint import (
            OpqIndexMaintainer,
        )

        self.spark = spark
        self.base_dir = base_dir
        self.num_centroids = int(num_centroids)
        os.makedirs(base_dir, exist_ok=True)
        self._checkpoint_token: str | None = None
        self._meta = self._recover()
        self.codes = OpqIndexMaintainer(spark, os.path.join(base_dir, "opq"))
        # lists carry ROTATED vectors: dim resolves lazily from the
        # frozen params once bootstrapped (r = m·sub_dim)
        self.lists = IvfIndexMaintainer(
            os.path.join(base_dir, "ivf"),
            dim=-1,
            num_centroids=self.num_centroids,
        )

    # --- pointer protocol -------------------------------------------------

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
                        f"{self.base_dir} (invalid JSON: {e}); the "
                        "watermark lives only in the pointer. Restore "
                        "it from backup or rebuild in a fresh base_dir."
                    ) from e
            if meta.get("format") != _FORMAT:
                raise ValueError(
                    f"IVF-OPQ maintainer state at {self.base_dir} has "
                    f"format {meta.get('format')!r}, expected "
                    f"{_FORMAT!r} — rebuild"
                )
            if meta.get("num_centroids") != self.num_centroids:
                raise ValueError(
                    "IVF-OPQ geometry mismatch: state at "
                    f"{self.base_dir} was fit with num_centroids="
                    f"{meta.get('num_centroids')} but this maintainer "
                    f"was opened with {self.num_centroids}; the coarse "
                    "quantizer is the index's identity. Reopen with "
                    "the recorded geometry or rebuild in a fresh "
                    "base_dir."
                )
            self._checkpoint_token = meta.get("checkpoint_token")
            return meta
        except FileNotFoundError:
            pass
        # committed content only: the OPQ half's own pointer or the IVF
        # half's written quantizer. Bare opq/ or ivf/ dirs are NOT
        # orphans — constructing the maintainer makedirs opq/ before
        # bootstrap, and treating that as adoptable state permanently
        # bricked a never-bootstrapped base_dir (r12 review finding).
        if os.path.exists(
            os.path.join(self.base_dir, "opq", "_CURRENT")
        ) or os.path.exists(
            os.path.join(self.base_dir, "ivf", "centroids", "_SUCCESS")
        ):
            raise ValueError(
                f"IVF-OPQ maintainer state at {self.base_dir} has "
                f"bootstrapped halves but no {self._POINTER} pointer; "
                "the watermark lives only in the pointer, so this "
                "state cannot be safely adopted. Restore the pointer "
                "or re-bootstrap in a fresh base_dir."
            )
        return {
            "format": _FORMAT,
            "bootstrapped": False,
            "num_centroids": self.num_centroids,
            "last_batch_id": None,
        }

    def _commit(self, meta: dict) -> None:
        tmp = self._pointer_path() + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(meta, fh)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, self._pointer_path())
        self._meta = meta

    # --- bootstrap ----------------------------------------------------------

    def bootstrap(
        self,
        corpus: DataFrame,
        dim: int,
        m: int,
        sub_dim: int,
        ksub: int = 64,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        model: dict | None = None,
    ) -> None:
        """One offline training job: freeze rotation + codebooks +
        seed codes (``OpqIndexMaintainer.bootstrap``), fit the coarse
        quantizer on the ROTATED seed, ingest the rotated seed into
        the lists. ``model`` optionally reuses an already-fit
        allocated model (deterministic train-once share)."""
        if self._meta.get("bootstrapped"):
            raise ValueError(
                f"IVF-OPQ maintainer at {self.base_dir} is already "
                "bootstrapped; re-bootstrap into a fresh base_dir and "
                "swap (frozen quantizers are the index's identity)"
            )
        self.codes.bootstrap(
            corpus,
            dim=dim,
            m=m,
            sub_dim=sub_dim,
            ksub=ksub,
            id_col=id_col,
            vec_col=vec_col,
            model=model,
        )
        rot = self._rotate(corpus)
        self.lists.id_col = id_col
        self.lists.vec_col = vec_col
        self.lists.fit(rot)
        self.lists.ingest(rot)
        self._commit(
            {
                "format": _FORMAT,
                "bootstrapped": True,
                "num_centroids": self.num_centroids,
                "last_batch_id": None,
                "checkpoint_token": self._checkpoint_token,
            }
        )

    def _rotate(self, df: DataFrame) -> DataFrame:
        from _data_engineering_pipeline_project_spark.operators.pca import (
            pca_project_batch,
        )

        ix = self.codes._loaded()
        p = ix["params"]
        # a reopened handle learns the column names from the frozen
        # artifact's params, not from IvfIndexMaintainer defaults
        self.lists.id_col = p["id_col"]
        self.lists.vec_col = p["vec_col"]
        return pca_project_batch(
            df,
            ix["model"],
            r=p["m"] * p["sub_dim"],
            id_col=p["id_col"],
            vec_col=p["vec_col"],
            out_col=p["vec_col"],
        )

    # --- ticks ----------------------------------------------------------------

    def merge_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """One tick: append the batch's frozen-model codes (inner
        exactly-once protocol) and its list assignments (immutable
        append). Redelivered ids at or below the outer watermark are
        no-ops; a crash anywhere inside re-runs safely (codes half
        no-ops on its own watermark; a duplicated list append is
        collapsed at serve time — see module docstring)."""
        last = self._meta.get("last_batch_id")
        if last is not None and batch_id <= last:
            return
        if not self._meta.get("bootstrapped"):
            raise ValueError("not bootstrapped yet (call bootstrap)")
        self.codes.merge_batch(batch_df, batch_id)
        self.lists.ingest(self._rotate(batch_df))
        self._commit({**self._meta, "last_batch_id": batch_id})

    # --- serving ----------------------------------------------------------------

    def topk(self, queries: DataFrame, k: int = 5, nprobe: int = 2) -> DataFrame:
        """IVF-OPQ ADC top-k over the maintained index: rotate only the
        query vectors, open only the ``nprobe`` probed lists' files,
        score candidates with the maintained codes — the exact
        ``ivfpq_topk`` arithmetic over maintained relations."""
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from _data_engineering_pipeline_project_spark.operators.similarity import (
            _nearest_centroid_scores,
            ivfpq_topk,
        )

        ix = self.codes._loaded()
        p = ix["params"]
        rot_q = self._rotate(queries)
        centroids = self.lists.centroids(self.spark)
        # probed list ids (aggregate-sized collect — ≤ num_centroids
        # values), so the list resolver opens ONLY probed lists' files
        q = rot_q.select(
            F.col(p["id_col"]).alias("query_id"),
            F.col(p["vec_col"]).alias("__qvec"),
        )
        wq = Window.partitionBy("query_id").orderBy(
            F.col("__cos").desc(), F.col("centroid_id")
        )
        probed = [
            r["centroid_id"]
            for r in _nearest_centroid_scores(
                q, centroids, "query_id", "__qvec"
            )
            .withColumn("__rnk", F.row_number().over(wq))
            .filter(F.col("__rnk") <= nprobe)
            .select("centroid_id")
            .distinct()
            .collect()
        ]
        assigned = self.lists.stored(self.spark, centroid_ids=probed).select(
            p["id_col"], "centroid_id"
        )
        return ivfpq_topk(
            rot_q,  # unused when index= is given
            rot_q,
            k=k,
            num_centroids=self.num_centroids,
            nprobe=nprobe,
            m=p["m"],
            sub_dim=p["sub_dim"],
            ksub=p["ksub"],
            id_col=p["id_col"],
            vec_col=p["vec_col"],
            index=(centroids, assigned, ix["codebooks"], self.codes.codes()),
        )

    # --- maintenance ----------------------------------------------------------

    def compact(self) -> dict:
        """Both halves' compaction on the table cadence: fold the codes
        batch dirs into the base relation and fold hot lists into
        clustered generations. Served results unchanged (pinned by
        test)."""
        p = self.codes._loaded()["params"]
        self.lists.id_col = p["id_col"]
        self.lists.vec_col = p["vec_col"]
        self.codes.compact()
        return self.lists.compact_hot_lists(self.spark)

    # --- streaming glue ---------------------------------------------------------

    def bind_checkpoint(self, token: str) -> None:
        if self._checkpoint_token is None:
            self._checkpoint_token = token
            self._commit({**self._meta, "checkpoint_token": token})
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
        """Drain new files from ``source_dir`` into the index."""
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
