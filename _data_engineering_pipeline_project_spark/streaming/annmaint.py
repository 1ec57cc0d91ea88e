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
  membership never changes. Small-file accretion in hot lists is a
  performance concern this class does not yet address — the fix is a
  per-list layout-only rewrite with the versioned-generation + pointer
  protocol of `streaming/compactmaint.py` (future work, not claimed).
- **search** — probe the ``nprobe`` nearest centroids per query, then
  scan ONLY those list partitions: the ``centroid_id IN (...)`` filter
  lands in the scan's PartitionFilters (pinned by test), so a search
  reads |corpus|·nprobe/C rows off disk, never the corpus. Scoring is
  the codegen-unrolled exact cosine + per-query top-k window — same
  ranking arithmetic as ``topk_cosine_ivf``, so batch and incremental
  indexes return identical results over identical data (pinned by
  test).

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

    def ingest(self, batch: DataFrame) -> int:
        """Assign a batch to lists and append — one broadcast-assign
        pass + one partitioned write; cost is O(batch), independent of
        index size."""
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
        return batch.count()

    # -- query ----------------------------------------------------------
    def stored(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self._list_dir)

    def search(
        self,
        queries: DataFrame,
        k: int = 5,
        nprobe: int = 2,
    ) -> DataFrame:
        """Exact cosine top-k within the ``nprobe`` nearest lists per
        query. The probe set is queries×C scored against broadcast
        centroids (tiny); the list scan carries an equi-join on
        centroid_id whose keys prune partitions at the source.

        Probe ranking and candidate scoring reuse the batch IVF's exact
        arithmetic (`operators/similarity.py`: 6-digit rounding BEFORE
        every row_number, id tie-breaks), so this returns bit-identical
        rows to ``topk_cosine_ivf`` over the same data + centroids —
        pinned by test."""
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
        scored = (
            self.stored(spark)
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
