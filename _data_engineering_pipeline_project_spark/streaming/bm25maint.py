"""Incremental BM25 inverted-index maintenance.

``operators/ranking.py:save_bm25_index`` builds the lexical serving
artifact in one offline job; at 100 TB that build amortizes only if
APPENDS don't trigger full rebuilds (VERDICT r9 next #2). This
maintainer merges a new-docs micro-batch into the artifact at
O(batch) + O(vocabulary) cost per tick, never O(corpus):

- **postings** append cleanly: a new doc's (doc, term, tf, dl) rows
  are disjoint from every existing posting, so each batch writes its
  own term-range-clustered directory ``postings/b{id}`` and serving
  reads the union — parquet min/max term skipping works per batch
  directory exactly as it does for the one-shot artifact.
- **dictionary** (term, df) and **stats** are commutative monoids:
  dfs add under full-outer join on term (the ``aggmaint.merge_rollup``
  shape), n_docs and total_dl add as scalars. The maintainer stores
  ``total_dl`` (exact long) rather than ``avgdl`` and derives
  avgdl = total_dl / n_docs at serve time — the SAME long-sum /
  long-count division Spark's ``avg`` performs inside the one-shot
  build, which is what makes incrementally-served scores bit-identical
  to a one-shot rebuild (test-pinned).
- **commit** follows the house pointer protocol (``Scd2Table`` /
  ``AggMaintainer``): batch postings and the merged ``meta_v{N}``
  (dictionary, stats, params) land fully before the ``_CURRENT``
  pointer swaps, so a crash leaves the previous version serving and an
  orphan directory, never a torn index. foreachBatch redelivery is a
  watermark no-op (df sums are not idempotent under re-merge).

CONTRACT: batches are NEW documents only — a doc_id must appear in
exactly one batch, or its df/tf contributions double (the same
append-only contract as ``dedupmaint``'s seen-state). Updating or
deleting documents is a rebuild (or a tombstone design this engine
does not need for training-data corpora, which are append-only).

Fragmentation: each tick adds one postings directory; serving cost
grows with directory count only through file-open overhead, so the
maintainer exposes ``compact()`` — fold all batch directories into one
re-clustered directory (the ``CompactionMaintainer`` cadence applies;
RUNBOOK.md). No reference counterpart (project/etl2.py recomputes the
world per cycle).
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from _data_engineering_pipeline_project_spark.operators import textstats as TS

_POINTER = "_CURRENT"
_FORMAT = "dl-in-postings-v2"


class Bm25Maintainer:
    """Maintain a served BM25 index over append-only document batches.

    ``serve_index()`` returns the same dict shape as
    ``ranking.load_bm25_index``, so ``ranking.bm25_scores_from_index``
    serves from a maintained index unchanged.
    """

    def __init__(
        self,
        spark: SparkSession,
        base_dir: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        files_per_batch: int = 4,
    ) -> None:
        self.spark = spark
        self.base_dir = base_dir
        self.id_col = id_col
        self.text_col = text_col
        self.files_per_batch = files_per_batch
        os.makedirs(base_dir, exist_ok=True)
        self._meta = self._recover()

    # -- pointer protocol -------------------------------------------------
    def _pointer_path(self) -> str:
        return os.path.join(self.base_dir, _POINTER)

    def _recover(self) -> dict:
        try:
            with open(self._pointer_path()) as fh:
                meta = json.load(fh)
            if meta.get("format") != _FORMAT:
                raise ValueError(
                    f"BM25 maintainer state at {self.base_dir} has format "
                    f"{meta.get('format')!r}, expected {_FORMAT!r} — rebuild"
                )
            return meta
        except FileNotFoundError:
            pass
        # pointer lost: unlike the bloom/agg maintainers, committed
        # state here is a meta dir PLUS an ordered batch list only the
        # pointer records — the postings dirs alone cannot be safely
        # re-adopted (a half-written batch dir is indistinguishable
        # from a committed one). Silently returning version 0 would
        # RESTART the index over live state — fail loudly instead
        # (adversarial-artifact sweep r11).
        if os.path.isdir(self.base_dir):
            orphaned = [
                n
                for n in os.listdir(self.base_dir)
                if re.match(r"^meta_v(\d+)$", n)
                and os.path.exists(
                    os.path.join(self.base_dir, n, "stats", "_SUCCESS")
                )
            ]
            if orphaned:
                raise ValueError(
                    f"BM25 maintainer state at {self.base_dir} has "
                    f"committed meta dirs ({sorted(orphaned)}) but no "
                    f"{_POINTER} pointer; the batch ordering lives "
                    "only in the pointer, so this state cannot be "
                    "safely adopted. Restore the pointer from backup or "
                    "rebuild in a fresh base_dir."
                )
        return {
            "version": 0,
            "last_batch_id": None,
            "batches": [],
            "format": _FORMAT,
        }

    def _commit(self, meta: dict) -> None:
        tmp = self._pointer_path() + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(meta, fh)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, self._pointer_path())
        self._meta = meta

    @property
    def version(self) -> int:
        return self._meta["version"]

    def _meta_dir(self, version: int) -> str:
        return os.path.join(self.base_dir, f"meta_v{version}")

    def _batch_dir(self, name: str) -> str:
        return os.path.join(self.base_dir, "postings", name)

    # -- merge tick --------------------------------------------------------
    def merge_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """Fold one batch of NEW documents into the index: O(batch)
        tokenize + postings write, O(vocab) dictionary merge, O(1)
        stats merge. Redelivered batch ids at or below the watermark
        are no-ops."""
        last = self._meta["last_batch_id"]
        if last is not None and batch_id <= last:
            return
        bname = f"b{batch_id}"
        dl = batch_df.select(
            F.col(self.id_col), TS.token_count(self.text_col).alias("dl")
        )
        postings = (
            batch_df.select(
                F.col(self.id_col),
                F.explode(TS.tokens(self.text_col)).alias("term"),
            )
            .filter(F.length("term") > 0)
            .groupBy(self.id_col, "term")
            .agg(F.count(F.lit(1)).alias("tf"))
            .join(dl, self.id_col)
        )
        (
            postings.repartitionByRange(self.files_per_batch, "term")
            .sortWithinPartitions("term")
            .write.mode("overwrite")
            .parquet(self._batch_dir(bname))
        )
        # dictionary merge: batch dfs from the JUST-WRITTEN postings
        # (no second tokenize), monoid-added into the current dictionary;
        # the read-back carries the known schema (r14) so it skips the
        # footer schema-inference job
        batch_dict = (
            self.spark.read.schema(postings.schema)
            .parquet(self._batch_dir(bname))
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("df"))
        )
        # stats from the batch's dl frame, NOT the postings: a doc with
        # EMPTY text has no posting rows but still counts toward n_docs
        # and avgdl in the one-shot build — deriving from postings would
        # silently drop it and desync incrementally-served scores
        batch_stats = dl.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.coalesce(F.sum("dl"), F.lit(0)).cast("long").alias("total_dl"),
        )
        v = self._meta["version"]
        if v > 0:
            cur_dict = self.spark.read.parquet(
                os.path.join(self._meta_dir(v), "dictionary")
            ).select("term", F.col("df").alias("_df"))
            merged_dict = batch_dict.join(cur_dict, "term", "full_outer").select(
                "term",
                (
                    F.coalesce("df", F.lit(0)) + F.coalesce("_df", F.lit(0))
                ).alias("df"),
            )
            # fold the current 1-row stats in via a join instead of a
            # driver collect (r14, guide §1.2): same exact long adds,
            # one fewer action per tick
            cur_stats = self.spark.read.parquet(
                os.path.join(self._meta_dir(v), "stats")
            ).select(
                F.col("n_docs").alias("_n"), F.col("total_dl").alias("_t")
            )
            merged_stats = batch_stats.crossJoin(
                F.broadcast(cur_stats)
            ).select(
                (F.col("n_docs") + F.col("_n")).alias("n_docs"),
                (F.col("total_dl") + F.col("_t")).alias("total_dl"),
            )
        else:
            merged_dict, merged_stats = batch_dict, batch_stats

        nxt = v + 1
        # the dictionary and stats relations are independent, go to
        # independent pre-pointer dirs: overlap the writes (guide §2.6);
        # the pointer commits strictly after both, as before
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as pool:
            futs = [
                pool.submit(
                    lambda: merged_dict.write.mode("overwrite").parquet(
                        os.path.join(self._meta_dir(nxt), "dictionary")
                    )
                ),
                pool.submit(
                    lambda: merged_stats.coalesce(1)
                    .write.mode("overwrite")
                    .parquet(os.path.join(self._meta_dir(nxt), "stats"))
                ),
            ]
            for f in futs:
                f.result()
        self._commit(
            {
                **self._meta,  # preserves checkpoint_token and format
                "version": nxt,
                "last_batch_id": batch_id,
                "batches": self._meta["batches"] + [bname],
            }
        )

    def bind_checkpoint(self, token: str) -> None:
        """Same guard as ``AggMaintainer.bind_checkpoint`` (review r3):
        foreachBatch ids restart at 0 when a streaming checkpoint is
        recreated, and the last_batch_id watermark would then absorb
        real data as "redelivery". A different checkpoint must fail
        loudly; a maintainer with no recorded token adopts the first."""
        stored = self._meta.get("checkpoint_token")
        if stored is None:
            self._commit({**self._meta, "checkpoint_token": token})
            return
        if stored != token:
            raise ValueError(
                "streaming checkpoint mismatch: BM25 maintainer state was "
                f"built under checkpoint {stored!r} but this run uses "
                f"{token!r}; batch ids would restart and the redelivery "
                "watermark would silently drop data. Restore the original "
                "checkpoint or start a new maintainer base_dir."
            )

    def _guarded_hook(self, checkpoint_dir: str):
        """foreachBatch wrapper (the ``AggMaintainer`` pattern): resolve
        the checkpoint IDENTITY once the query exists and bind it before
        delegating, so a recreated checkpoint at the same path fails
        loudly instead of replaying batch ids into the watermark."""
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
        schema,
        checkpoint_dir: str,
        source_format: str = "parquet",
    ) -> None:
        """Drain new document files from ``source_dir`` into the index.
        The streaming checkpoint makes file discovery incremental —
        each file's docs are tokenized and folded exactly once, which
        is precisely the maintainer's append-only contract."""
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

    # -- maintenance -------------------------------------------------------
    def compact(self) -> None:
        """Fold every batch postings directory into ONE re-clustered
        directory (the index-level OPTIMIZE): one range shuffle over
        the accumulated postings — columnar in, columnar out, no
        re-tokenize. Dictionary and stats are already merged; only the
        pointer's batch list changes."""
        if not self._meta["batches"]:
            return
        v = self._meta["version"]
        cname = f"compacted_v{v}"
        n = max(
            self.files_per_batch,
            self.spark.sparkContext.defaultParallelism,
        )
        (
            self.spark.read.parquet(
                *[self._batch_dir(b) for b in self._meta["batches"]]
            )
            .repartitionByRange(n, "term")
            .sortWithinPartitions("term")
            .write.mode("overwrite")
            .parquet(self._batch_dir(cname))
        )
        self._commit({**self._meta, "batches": [cname]})
        # old batch dirs are debris the pointer no longer references;
        # GC is idempotent (a crash here just leaves orphans)
        import shutil

        for b in self._meta["batches"]:
            if b != cname:
                shutil.rmtree(self._batch_dir(b), ignore_errors=True)

    # -- serving -----------------------------------------------------------
    def serve_index(self) -> dict:
        """The maintained index in ``load_bm25_index``'s dict shape —
        ``ranking.bm25_scores_from_index`` serves from it unchanged.
        avgdl derives as exact-long total_dl / n_docs, the identical
        division the one-shot build's ``avg(dl)`` performs."""
        if not self._meta["batches"]:
            raise ValueError(f"no batches merged yet under {self.base_dir}")
        v = self._meta["version"]
        return {
            "postings": self.spark.read.parquet(
                *[self._batch_dir(b) for b in self._meta["batches"]]
            ),
            "dictionary": self.spark.read.parquet(
                os.path.join(self._meta_dir(v), "dictionary")
            ),
            "stats": self.spark.read.parquet(
                os.path.join(self._meta_dir(v), "stats")
            ).select(
                "n_docs", (F.col("total_dl") / F.col("n_docs")).alias("avgdl")
            ),
            "params": {
                "id_col": self.id_col,
                "text_col": self.text_col,
                "format": _FORMAT,
            },
        }
