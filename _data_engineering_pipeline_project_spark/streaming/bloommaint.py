"""Incremental Bloom-filter maintenance across micro-batches.

The membership artifact (``operators/membership.py``) is a monoid:
merging per-batch word relations with ``bit_or`` yields EXACTLY the
words of building over the union of all keys ever seen (pinned at the
operator level by ``test_round10b.py``). That makes the filter
incrementally maintainable with the same versioned-dir + atomic
pointer protocol as the sibling maintainers (KMV sketches, the dedup
seen-state, BM25 postings): a tick costs O(batch keys) to hash plus a
merge bounded by the word-table size ``min(total_keys·k, m/60)`` rows
— never a rescan of history — and the maintained filter serves the
ingest-time "definitely new?" question from state that is orders of
magnitude smaller than the seen-key relation DedupMaintainer keeps.

The two maintainers are complements, not rivals: DedupMaintainer's
seen set is exact and admits batches; BloomMaintainer's words are the
cheap pre-answer a 100 TB ingest consults FIRST (no false negatives,
so a "not seen" verdict is final), reserving the exact state for the
Bloom-positive sliver. Fill ratio only grows as batches accumulate —
the FP-audit queries (queries_ext10.py) are the monitoring; past ~50%
fill the fix is a rebuild at larger m, which is one
``save_bloom_index`` over the exact seen set.

Geometry (m_bits, k) is frozen at first commit and recorded in the
pointer: merging words of DIFFERENT geometry is silent garbage, so a
mismatched reopen fails loudly instead.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from _data_engineering_pipeline_project_spark.operators.membership import (
    bloom_build,
    bloom_merge,
    bloom_probe,
)


class BloomMaintainer:
    """Maintain a Bloom membership filter over the FIRST column of each
    batch (the key relation), versioned under ``base_dir``."""

    _POINTER = "_CURRENT"
    _STATE_NAME = "words"

    def __init__(
        self,
        spark: SparkSession,
        base_dir: str,
        m_bits: int = 1 << 20,
        k: int = 3,
    ):
        self.spark = spark
        self.base_dir = base_dir
        self.m_bits = int(m_bits)
        self.k = int(k)
        self.state_dir = os.path.join(base_dir, self._STATE_NAME)
        os.makedirs(base_dir, exist_ok=True)
        self._checkpoint_token: str | None = None
        self._version, self._last_batch_id = self._recover_version()

    # --- versioned-state plumbing (Scd2Table protocol) -------------------

    def _pointer_path(self) -> str:
        return os.path.join(self.base_dir, self._POINTER)

    def _recover_version(self) -> tuple[int, int | None]:
        try:
            with open(self._pointer_path()) as f:
                meta = json.load(f)
            self._checkpoint_token = meta.get("checkpoint_token")
            if (meta.get("m_bits"), meta.get("k")) != (self.m_bits, self.k):
                raise ValueError(
                    "bloom geometry mismatch: state at "
                    f"{self.base_dir} was built with m_bits="
                    f"{meta.get('m_bits')}, k={meta.get('k')} but this "
                    f"maintainer was opened with m_bits={self.m_bits}, "
                    f"k={self.k}; merging mixed geometry is silent "
                    "garbage. Reopen with the recorded geometry or "
                    "rebuild in a fresh base_dir."
                )
            return int(meta["version"]), meta.get("last_batch_id")
        except FileNotFoundError:
            pass
        # pointer lost: adopt the highest finished words_v* (the sibling
        # maintainers' recovery rule). Geometry can't be re-verified
        # without the pointer — the ctor args are trusted, which is why
        # the pointer is fsync'd and atomically replaced.
        best = 0
        pat = re.compile(rf"^{self._STATE_NAME}_v(\d+)$")
        if os.path.isdir(self.base_dir):
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
                    "checkpoint_token": self._checkpoint_token,
                    "m_bits": self.m_bits,
                    "k": self.k,
                },
                f,
            )
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._pointer_path())

    def _already_merged(self, batch_id: int) -> bool:
        """foreachBatch is at-least-once; bit_or IS idempotent under
        re-merge, but the watermark keeps the version chain and
        last_batch_id exactly-once like the siblings."""
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

    # --- filter maintenance ----------------------------------------------

    def merge_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """foreachBatch hook: bloom the batch's key column, bit_or-merge
        with the stored words, commit the next version (word_idx-
        clustered, the artifact layout)."""
        if self._already_merged(batch_id):
            return
        key = F.col(batch_df.columns[0])
        part = bloom_build(batch_df, key, self.m_bits, self.k)
        cur = self.current()
        merged = part if cur is None else bloom_merge(part, cur)
        nxt = self._version + 1
        (
            merged.repartitionByRange(
                max(1, self.spark.sparkContext.defaultParallelism // 4),
                "word_idx",
            )
            .sortWithinPartitions("word_idx")
            .write.mode("overwrite")
            .parquet(f"{self.state_dir}_v{nxt}")
        )
        self._commit(nxt, batch_id)
        self._version = nxt
        self._last_batch_id = batch_id

    def probe(self, df: DataFrame, key: F.Column | str) -> DataFrame:
        """Membership flags for ``df`` against the maintained filter
        (no false negatives over every accepted batch)."""
        cur = self.current()
        if cur is None:
            raise ValueError("no batches merged yet")
        key = F.col(key) if isinstance(key, str) else key
        return bloom_probe(cur, df, key, self.m_bits, self.k)

    # --- streaming glue (sibling-maintainer pattern) -----------------------

    def bind_checkpoint(self, token: str) -> None:
        """Same reset guard as DedupMaintainer.bind_checkpoint: batch
        ids restart at 0 under a recreated checkpoint and the watermark
        would absorb real data as redelivery — fail loudly instead."""
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
        """Drain new files from ``source_dir`` into the filter."""
        stream = (
            self.spark.readStream.format(source_format)
            .schema(schema)
            .load(source_dir)
        )
        q = (
            stream.writeStream.foreachBatch(
                self._guarded_hook(checkpoint_dir)
            )
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def vacuum_versions(self, keep_last: int = 2) -> list[str]:
        """Drop words_v* dirs older than the last ``keep_last`` committed
        versions."""
        import shutil

        removed = []
        pat = re.compile(
            re.escape(os.path.basename(self.state_dir)) + r"_v(\d+)$"
        )
        for name in os.listdir(self.base_dir):
            m = pat.match(name)
            if m and int(m.group(1)) <= self._version - keep_last:
                shutil.rmtree(os.path.join(self.base_dir, name))
                removed.append(name)
        return removed


class RotatingBloomMaintainer:
    """Retention-windowed membership: a ring of ``generations``
    independent :class:`BloomMaintainer` slots. Batches merge into the
    CURRENT slot; :meth:`rotate` (called on the retention cadence —
    daily, per-epoch, per-corpus-version) advances the ring and RESETS
    the slot it lands on; :meth:`probe` ORs the live slots' words.

    This is how a plain Bloom filter — which cannot delete — serves
    the "have we seen this key in the last N windows?" question every
    retention-bounded ingest dedup actually asks: keys older than N
    rotations age out when their slot is reused, while within the
    window the no-false-negative guarantee holds per slot and
    therefore over the OR (bit_or of words relations IS the filter of
    the union). Fill is bounded per slot by one window's key volume,
    so m is sized for a WINDOW, not for all history — the standing
    fix for the monotone-fill problem the FP audit monitors.

    Crash discipline (advice r10 — pointer FIRST, then reset): the old
    ordering (reset slot, then commit pointer) had a lost-membership
    anomaly: a crash between the two left the wiped slot OFFICIALLY
    LIVE, so keys from a still-in-retention window probed "definitely
    new" — a false negative, the one direction the tier promises never
    to produce. rotate() now (1) commits the advanced pointer with
    ``needs_reset=true`` (fsync + atomic replace, the house protocol),
    (2) resets the slot, (3) commits ``needs_reset=false``. Every
    crash point is safe: before (1) the rotation simply never
    happened; between (1) and (2) recovery sees ``needs_reset`` and
    re-resets the current slot BEFORE any merge (no stale keys
    resurrected — and had recovery not run, the anomaly would be
    over-retention: extra false positives, the safe direction);
    between (2) and (3) recovery re-resets an already-empty slot
    (idempotent). No committed window is ever lost, and no aged-out
    key ever resurrects. Pinned by the crash-mid-rotate test
    (``tests/test_round11.py``).
    """

    _POINTER = "_RING"

    def __init__(
        self,
        spark: SparkSession,
        base_dir: str,
        m_bits: int = 1 << 20,
        k: int = 3,
        generations: int = 4,
    ):
        if generations < 2:
            raise ValueError("need at least 2 generations to rotate")
        self.spark = spark
        self.base_dir = base_dir
        self.generations = int(generations)
        self.m_bits = int(m_bits)
        self.k = int(k)
        os.makedirs(base_dir, exist_ok=True)
        self._current, self._rotations, needs_reset = self._recover()
        self._slots = [
            BloomMaintainer(
                spark, os.path.join(base_dir, f"gen_{g}"), m_bits, k
            )
            for g in range(self.generations)
        ]
        if needs_reset:
            # a crash interrupted rotate() after the pointer advanced:
            # finish the rotation BEFORE any merge/probe can see the
            # stale (aged-out) keys still sitting in the current slot
            self._reset_slot(self._current)
            self._commit_ring(needs_reset=False)

    def _pointer_path(self) -> str:
        return os.path.join(self.base_dir, self._POINTER)

    def _recover(self) -> tuple[int, int, bool]:
        try:
            with open(self._pointer_path()) as f:
                meta = json.load(f)
            if meta.get("generations") != self.generations:
                raise ValueError(
                    "ring geometry mismatch: state has "
                    f"{meta.get('generations')} generations, maintainer "
                    f"opened with {self.generations}"
                )
            return (
                int(meta["current"]),
                int(meta["rotations"]),
                bool(meta.get("needs_reset", False)),
            )
        except FileNotFoundError:
            return 0, 0, False

    def _commit_ring(self, needs_reset: bool = False) -> None:
        tmp = self._pointer_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "current": self._current,
                    "rotations": self._rotations,
                    "generations": self.generations,
                    "needs_reset": needs_reset,
                },
                f,
            )
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._pointer_path())

    def _reset_slot(self, g: int) -> None:
        """Wipe slot ``g`` and rebuild a fresh (empty) maintainer for
        it — idempotent, so the crash-recovery re-reset is safe."""
        import shutil

        slot_dir = os.path.join(self.base_dir, f"gen_{g}")
        if os.path.isdir(slot_dir):
            shutil.rmtree(slot_dir)
        self._slots[g] = BloomMaintainer(
            self.spark, slot_dir, self.m_bits, self.k
        )

    @property
    def current_slot(self) -> int:
        return self._current

    def merge_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        self._slots[self._current].merge_batch(batch_df, batch_id)

    def rotate(self) -> int:
        """Advance the ring: commit the advanced pointer (flagged
        ``needs_reset``), THEN reset the slot it landed on (its keys
        age out), then clear the flag. Pointer-first means a crash can
        never leave a wiped slot officially live (lost membership =
        false negatives); the worst crash residue is a pending reset
        that recovery completes. Returns the new current slot."""
        nxt = (self._current + 1) % self.generations
        self._current = nxt
        self._rotations += 1
        self._commit_ring(needs_reset=True)
        self._reset_slot(nxt)
        self._commit_ring(needs_reset=False)
        return nxt

    def live_words(self) -> DataFrame | None:
        """bit_or union of every non-empty slot's words — the filter of
        the union of live keys."""
        from _data_engineering_pipeline_project_spark.operators.membership import (
            bloom_merge,
        )

        words = [s.current() for s in self._slots]
        words = [w for w in words if w is not None]
        if not words:
            return None
        return words[0] if len(words) == 1 else bloom_merge(*words)

    def probe(self, df: DataFrame, key) -> DataFrame:
        from pyspark.sql import functions as FF

        from _data_engineering_pipeline_project_spark.operators.membership import (
            bloom_probe,
        )

        w = self.live_words()
        if w is None:
            raise ValueError("no batches merged yet")
        key = FF.col(key) if isinstance(key, str) else key
        return bloom_probe(w, df, key, self.m_bits, self.k)
