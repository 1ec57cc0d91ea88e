"""Custom Spark 4 Python DataSource: a deterministic synthetic document
generator with batch read, predicate-pushdown partition pruning, and a
micro-batch streaming reader.

Why it exists: the reference ingests from files and a SQL sink
(etl2.py's CSV directory + SQLAlchemy reads); a production pipeline
also pulls from bespoke systems with no built-in connector (internal
APIs, tape formats, simulators). Spark 4's Python DataSource API
(`pyspark.sql.datasource`) is the sanctioned way to write those
connectors without JVM code — this module exercises the full surface:

- ``partitions()`` → N range-partitioned splits, so reads parallelize
  across executors exactly like a parquet scan;
- ``pushFilters()`` → doc_id range predicates are absorbed by the
  source and PRUNE partitions before any row is generated (the Python
  analogue of parquet row-group pruning — `.explain` shows the filter
  leaving the plan);
- ``SimpleDataSourceStreamReader`` → the same rows as a rate-limited
  micro-batch stream with replayable offsets (offset = next row id),
  so Structured Streaming checkpoint/recovery semantics apply to a
  pure-Python source.

Everything generated is a pure function of the row id via md5, so the
DuckDB oracle reproduces the byte-identical table from ``range(n)`` —
the correctness gate covers a connector, not just a query.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)

SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars int"
_LANGS = ("en", "de", "fr", "es")
_SRCS = ("web", "books", "code")


def gen_row(i: int) -> tuple:
    """Deterministic row for id ``i`` — md5-derived, engine-reproducible
    (the DuckDB oracle mirrors this arithmetic on ``md5(CAST(i AS
    VARCHAR))``)."""
    h = hashlib.md5(str(i).encode()).hexdigest()
    x1, x2, x3 = int(h[0:2], 16), int(h[2:4], 16), int(h[4:6], 16)
    text = f"w{x1 % 16} w{x2 % 16} w{x3 % 16}"
    return (i, text, _LANGS[x1 % 4], _SRCS[x2 % 3], len(text))


@dataclass
class _RangePartition(InputPartition):
    start: int
    end: int


class _SyntheticDocsReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n = int(options.get("n", 500))
        self.parts = max(1, int(options.get("parts", 8)))
        # pushdown-narrowed id range [lo, hi)
        self.lo, self.hi = 0, self.n

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Absorb doc_id range predicates (partition pruning at the
        source); everything else is returned for Spark to re-apply."""
        for f in filters:
            attr = getattr(f, "attribute", None)
            if attr == ("doc_id",):
                if isinstance(f, GreaterThan):
                    self.lo = max(self.lo, f.value + 1)
                    continue
                if isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, f.value)
                    continue
                if isinstance(f, LessThan):
                    self.hi = min(self.hi, f.value)
                    continue
                if isinstance(f, LessThanOrEqual):
                    self.hi = min(self.hi, f.value + 1)
                    continue
            yield f

    def partitions(self) -> list[InputPartition]:
        lo, hi = self.lo, max(self.lo, self.hi)
        span = hi - lo
        if span == 0:
            return [_RangePartition(lo, lo)]
        step = max(1, (span + self.parts - 1) // self.parts)
        return [
            _RangePartition(s, min(s + step, hi)) for s in range(lo, hi, step)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield gen_row(i)


class _SyntheticDocsStreamReader(SimpleDataSourceStreamReader):
    """Replayable micro-batch stream over the same deterministic rows:
    offset = next row id to emit; each trigger emits ≤ batch_size rows
    until n is exhausted. readBetweenOffsets regenerates any range, so
    checkpoint recovery replays exactly."""

    def __init__(self, options) -> None:
        self.n = int(options.get("n", 500))
        self.batch = int(options.get("batch_size", 100))

    def initialOffset(self) -> dict:
        return {"next": 0}

    def read(self, start: dict):
        # contract: (ITERATOR of rows, next offset) — Spark's prefetch
        # wrapper calls next() on it, a plain list raises TypeError
        lo = start["next"]
        hi = min(self.n, lo + self.batch)
        return (iter([gen_row(i) for i in range(lo, hi)]), {"next": hi})

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([gen_row(i) for i in range(start["next"], end["next"])])


class SyntheticDocsDataSource(DataSource):
    """``spark.read.format("synthetic_docs")`` / ``readStream`` source.

    Options: ``n`` (row count, default 500), ``parts`` (batch read
    splits, default 8), ``batch_size`` (streaming rows per trigger,
    default 100)."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> _SyntheticDocsReader:
        return _SyntheticDocsReader(self.options)

    def simpleStreamReader(self, schema) -> _SyntheticDocsStreamReader:
        return _SyntheticDocsStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration (re-registering the same name in one
    session raises; second call is a no-op)."""
    try:
        spark.dataSource.register(SyntheticDocsDataSource)
    except Exception:
        pass


# ---------------------------------------------------------------------------
# Python DataSource WRITER: JSON-lines sink with a task-commit protocol
# ---------------------------------------------------------------------------
import json as _json
import uuid as _uuid
from dataclasses import dataclass as _dataclass

from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage


@_dataclass
class _JsonlCommit(WriterCommitMessage):
    tmp_file: str
    final_file: str
    n_rows: int


class _JsonLinesWriter(DataSourceWriter):
    """Executor-side writer with the standard two-phase task commit:
    every task writes to a uuid-named file under ``<path>/_tmp/`` and
    reports it in its commit message; the DRIVER's ``commit()`` renames
    the reported files into place and drops a ``_SUCCESS`` manifest,
    while ``abort()`` deletes the temp files. A reader therefore never
    observes partial output: speculative/retried tasks leave orphan
    temp files that were never reported, and they are ignored (and
    swept) by commit — the same contract as Hadoop's
    FileOutputCommitter v1."""

    def __init__(self, options) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("pyjsonl writer requires option 'path'")

    def write(self, iterator) -> _JsonlCommit:
        import os

        from pyspark import TaskContext

        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else 0
        tmp_dir = os.path.join(self.path, "_tmp")
        os.makedirs(tmp_dir, exist_ok=True)
        name = f"part-{pid:05d}-{_uuid.uuid4().hex}.jsonl"
        tmp = os.path.join(tmp_dir, name)
        n = 0
        with open(tmp, "w") as f:
            for row in iterator:
                f.write(_json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return _JsonlCommit(
            tmp_file=tmp, final_file=os.path.join(self.path, name), n_rows=n
        )

    def commit(self, messages) -> None:
        import os
        import shutil

        total = 0
        for m in messages:
            os.replace(m.tmp_file, m.final_file)
            total += m.n_rows
        shutil.rmtree(os.path.join(self.path, "_tmp"), ignore_errors=True)
        with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
            _json.dump({"files": len(messages), "rows": total}, f)

    def abort(self, messages) -> None:
        import os
        import shutil

        for m in messages:
            try:
                os.remove(m.tmp_file)
            except OSError:
                pass
        shutil.rmtree(os.path.join(self.path, "_tmp"), ignore_errors=True)


class JsonLinesDataSource(DataSource):
    """``df.write.format("pyjsonl").option("path", dir).save()`` — a
    pure-Python JSON-lines sink exercising the WRITE half of the Spark
    4 Python DataSource API (the synthetic_docs source covers batch
    read + pushdown + streaming read). Atomicity comes from the
    temp-file + driver-rename commit protocol above."""

    @classmethod
    def name(cls) -> str:
        return "pyjsonl"

    def schema(self) -> str:  # writer-only source; schema comes from the df
        return "doc_id bigint"

    def writer(self, schema, overwrite: bool) -> _JsonLinesWriter:
        return _JsonLinesWriter(self.options)


def register_sink(spark) -> None:
    try:
        spark.dataSource.register(JsonLinesDataSource)
    except Exception:
        pass
