"""Incremental ANN (IVF) index maintenance over an embedding stream.

A training-data pipeline ingests embeddings continuously (new crawl
shards, fresh encoder runs); rebuilding an ANN index per batch is
O(corpus), so production systems keep the COARSE QUANTIZER (the IVF
centroids) fixed and assign only the NEW vectors — exactly the
DiskANN/FAISS operational split: retrain centroids offline when drift
warrants, stream assignments online. This maintainer composes that
loop from the engine's own IVF operators (`operators/similarity.py`):

- **fit** — deterministic seed centroids (``ivf_seed_centroids``:
  md5-smallest sample, engine-portable) written once to the index dir.
  Centroids are immutable thereafter; re-fit = new index dir (an index
  whose routing changes under queries returns wrong buckets for
  already-stored vectors).
- **ingest** — per batch: ``ivf_assign`` (broadcast centroids +
  max_by partial agg — the batch shuffles one row per vector) then an
  APPEND to parquet **partitioned by centroid_id**. The directory
  layout IS the inverted list: no compaction or pointer protocol is
  needed for CORRECTNESS because files are immutable and list
  membership never changes.
- **compact_hot_lists** (r7 — closes the small-file accretion gap):
  each hot list runs ONE ``CompactionMaintainer``
  (`streaming/compactmaint.py`) with the list's partition directory as
  its landing dir — the versioned-generation + ``_CURRENT`` pointer +
  ``_CONSUMED``-manifest protocol, now crash-safe in BOTH windows
  (write→commit loses nothing; commit→GC duplicates nothing),
  composed per inverted list. Compacted generations are clustered by
  vector id, so each output file covers a tight id range. Lists stay
  independent: compacting a hot list never rewrites a cold one.
  Maintenance ticks are single-writer (the house maintainer contract —
  ingest and compaction are serialized by the maintenance loop).
- **search** — probe the ``nprobe`` nearest centroids per query
  (distinct probed list ids are aggregate-sized — ≤ num_centroids —
  and collected driver-side), then read ONLY those lists' files: the
  resolver opens the probed lists' committed generation + live landing
  files and nothing else, so a search reads |corpus|·nprobe/C rows off
  disk, never the corpus (pinned by test on ``inputFiles()`` — a
  stronger check than the pre-r7 PartitionFilters grep, since it pins
  the actual file set, not a plan string). Scoring is the exact cosine
  + per-query top-k window — same ranking arithmetic as
  ``topk_cosine_ivf``, so batch and incremental indexes return
  identical results over identical data (pinned by test).

At this num_centroids the per-list union in ``stored`` is a handful of
branches; a production deployment with C ≈ √n lists would hold the
same layout in a manifest-backed table format, with the identical
per-list generation protocol behind the manifest.

The reference has no counterpart (no vector surface at all); this is
the streaming-ingest completion of the engine's ANN family.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


class IvfIndexMaintainer:
    """Maintain an IVF index directory: ``centroids/`` (written once by
    :meth:`fit`) + ``lists/centroid_id=*/`` (appended by
    :meth:`ingest`, immutable files)."""

    def __init__(
        self,
        index_dir: str,
        dim: int,
        num_centroids: int = 8,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> None:
        self.index_dir = index_dir
        self.dim = dim
        self.num_centroids = num_centroids
        self.id_col = id_col
        self.vec_col = vec_col
        self._centroid_dir = os.path.join(index_dir, "centroids")
        self._list_dir = os.path.join(index_dir, "lists")

    # -- lifecycle ------------------------------------------------------
    def fit(self, seed_corpus: DataFrame) -> None:
        """Write the immutable coarse quantizer from a seed corpus
        (deterministic md5-sample centroids). Refusing to re-fit an
        existing index is the contract — stored assignments would go
        stale silently."""
        if os.path.isdir(self._centroid_dir):
            raise FileExistsError(
                f"index already fit: {self._centroid_dir} (make a new "
                "index dir to retrain the quantizer)"
            )
        from _data_engineering_pipeline_project_spark.operators.similarity import (
            ivf_seed_centroids,
        )

        ivf_seed_centroids(
            seed_corpus, self.num_centroids, self.id_col, self.vec_col
        ).write.mode("errorifexists").parquet(self._centroid_dir)

    def centroids(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self._centroid_dir)

    def ingest(self, batch: DataFrame) -> None:
        """Assign a batch to lists and append — one broadcast-assign
        pass + one partitioned write; cost is O(batch), independent of
        index size. (r13 optimization: this used to ``return
        batch.count()`` — a SECOND full evaluation of the input, which
        for the IVF-OPQ maintainer is the whole Arrow-rotated corpus at
        bootstrap and the rotated batch every tick, purely to produce a
        value no caller read. The write is the only action now.
        API NOTE: the return type changed int -> None in r13; external
        callers needing a count should read the written files' parquet
        metadata instead of forcing a second evaluation.)"""
        from _data_engineering_pipeline_project_spark.operators.similarity import (
            ivf_assign,
        )

        spark = batch.sparkSession
        assigned = ivf_assign(
            batch, self.centroids(spark), self.id_col, self.vec_col
        )
        assigned.write.mode("append").partitionBy("centroid_id").parquet(
            self._list_dir
        )

    # -- per-list compaction (r7) ---------------------------------------
    def _list_ids(self) -> list[int]:
        """Centroid ids present in the index (landing partition dirs ∪
        compacted per-list tables) — pure directory metadata."""
        ids: set[int] = set()
        if os.path.isdir(self._list_dir):
            for d in os.listdir(self._list_dir):
                if d.startswith("centroid_id="):
                    ids.add(int(d.split("=", 1)[1]))
        comp = os.path.join(self.index_dir, "lists_compact")
        if os.path.isdir(comp):
            for d in os.listdir(comp):
                if d.isdigit():
                    ids.add(int(d))
        return sorted(ids)

    def _list_maintainer(self, centroid_id: int):
        """The inverted list's own ``CompactionMaintainer``: landing dir
        = the list's partition directory, generations + pointer +
        consumed-manifest under ``lists_compact/<id>`` — the exact
        crash-safe protocol of `streaming/compactmaint.py`, composed
        per list. Output generations cluster by vector id, so every
        compacted file covers a tight id slice of its list."""
        from _data_engineering_pipeline_project_spark.streaming.compactmaint import (
            CompactionMaintainer,
        )

        return CompactionMaintainer(
            landing_dir=os.path.join(
                self._list_dir, f"centroid_id={centroid_id}"
            ),
            table_dir=os.path.join(
                self.index_dir, "lists_compact", str(centroid_id)
            ),
            cluster_cols=[self.id_col],
            min_files=self._compact_min_files,
            target_rows_per_file=1_000_000,
        )

    _compact_min_files = 4

    def compact_hot_lists(
        self, spark: SparkSession, min_files: int = 4
    ) -> dict:
        """One maintenance tick over every list: lists whose landing
        directory holds ≥ ``min_files`` live files fold into a fresh
        clustered generation (pointer-committed, manifest-shielded, GC
        idempotent); cold lists are untouched. Cost is O(hot lists'
        rows) — never a corpus rewrite. Returns per-list summaries."""
        self._compact_min_files = min_files
        out = {}
        for cid in self._list_ids():
            out[cid] = self._list_maintainer(cid).run_once(spark)
        return out

    # -- query ----------------------------------------------------------
    def stored(
        self, spark: SparkSession, centroid_ids: list[int] | None = None
    ) -> DataFrame:
        """Index contents — committed generation ∪ live landing files
        per list, with the list id re-attached as a column.
        ``centroid_ids`` restricts the read to those lists' FILES (the
        resolver never opens an unprobed list — file-level pruning,
        pinned by test on ``inputFiles()``)."""
        ids = self._list_ids() if centroid_ids is None else sorted(
            set(centroid_ids)
        )
        frames = []
        for cid in ids:
            m = self._list_maintainer(cid)
            try:
                df = m.read_current(spark)
            except FileNotFoundError:
                continue  # probed list with no stored vectors yet
            frames.append(
                df.withColumn(
                    "centroid_id", F.lit(cid).cast("int")
                )
            )
        if not frames:
            raise FileNotFoundError(f"empty index under {self._list_dir}")
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        return out

    def search(
        self,
        queries: DataFrame,
        k: int = 5,
        nprobe: int = 2,
    ) -> DataFrame:
        """Exact cosine top-k within the ``nprobe`` nearest lists per
        query. The probe set is queries×C scored against broadcast
        centroids (tiny); the DISTINCT probed list ids (≤ num_centroids
        values — aggregate-sized) are collected driver-side and handed
        to the resolver, so only probed lists' files are ever opened.

        Probe ranking and candidate scoring reuse the batch IVF's exact
        arithmetic (`operators/similarity.py`: 6-digit rounding BEFORE
        every row_number, id tie-breaks), so this returns bit-identical
        rows to ``topk_cosine_ivf`` over the same data + centroids —
        pinned by test, including across compactions (a layout-only
        rewrite)."""
        from _data_engineering_pipeline_project_spark.operators.similarity import (
            _nearest_centroid_scores,
            dot,
            l2_norm,
        )

        spark = queries.sparkSession
        q = queries.select(
            F.col(self.id_col).alias("query_id"),
            F.col(self.vec_col).alias("__qvec"),
        )
        wq = Window.partitionBy("query_id").orderBy(
            F.col("__cos").desc(), F.col("centroid_id")
        )
        probes = (
            _nearest_centroid_scores(
                q, self.centroids(spark), "query_id", "__qvec"
            )
            .withColumn("__rnk", F.row_number().over(wq))
            .filter(F.col("__rnk") <= nprobe)
            .select(
                "query_id",
                "__qvec",
                "centroid_id",
                l2_norm("__qvec").alias("__qn"),
            )
        )
        # distinct probed list ids: bounded by num_centroids, so this
        # collect is aggregate-sized; it lets the resolver open ONLY
        # probed lists' files (the read-less-than-the-corpus contract)
        probed = [
            r["centroid_id"]
            for r in probes.select("centroid_id").distinct().collect()
        ]
        scored = (
            self.stored(spark, centroid_ids=probed)
            .withColumn("__cn", l2_norm(self.vec_col))
            .join(F.broadcast(probes), on="centroid_id")
            .filter(F.col("query_id") != F.col(self.id_col))
            .select(
                "query_id",
                F.col(self.id_col).alias("neighbor_id"),
                F.round(
                    dot(F.col(self.vec_col), F.col("__qvec"))
                    / (F.col("__cn") * F.col("__qn")),
                    6,
                ).alias("cosine"),
            )
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cosine").desc(), F.col("neighbor_id")
        )
        return (
            scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select("query_id", "neighbor_id", "cosine", "rnk")
        )
