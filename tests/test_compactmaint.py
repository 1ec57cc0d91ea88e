"""Compaction maintainer (`streaming/compactmaint.py`): the OPTIMIZE
loop must preserve rows bit-exactly, tighten per-file min/max stats,
debounce below the file threshold, and never lose data across a crash
between generation write and pointer commit."""

from __future__ import annotations

import os

import pyarrow.parquet as pq

from _data_engineering_pipeline_project_spark.streaming.compactmaint import (
    CompactionMaintainer,
)


def _append_batch(spark, landing, rows, schema="k long, v long"):
    import uuid

    df = spark.createDataFrame(rows, schema)
    tmp = os.path.join(landing, f"_tmp_{uuid.uuid4().hex}")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
    os.makedirs(landing, exist_ok=True)
    os.replace(
        os.path.join(tmp, part),
        os.path.join(landing, f"{uuid.uuid4().hex}.parquet"),
    )
    import shutil

    shutil.rmtree(tmp)


def test_compaction_preserves_rows_and_debounces(spark, tmp_path):
    landing = str(tmp_path / "landing")
    table = str(tmp_path / "table")
    m = CompactionMaintainer(
        landing, table, ["k"], min_files=8, target_rows_per_file=10_000
    )
    expect = []
    for b in range(10):
        rows = [(int(i), int(b)) for i in range(b * 10, b * 10 + 10)]
        expect.extend(rows)
        _append_batch(spark, landing, rows)

    # below-threshold tick after manual drain would be a no-op; with 10
    # files the first tick compacts everything into one generation
    out = m.run_once(spark)
    assert out["compacted"] and out["rows"] == 100 and out["version"] == 1
    assert len(os.listdir(landing)) == 0  # consumed
    got = sorted(tuple(r) for r in m.read_current(spark).collect())
    assert got == sorted(expect)

    # debounce: nothing landed since -> no-op, same generation serves
    out2 = m.run_once(spark)
    assert out2 == {"compacted": False, "landing_files": 0}
    assert m.current_version() == 1

    # new landing files are readable BEFORE the next compaction
    _append_batch(spark, landing, [(999, 99)])
    got = sorted(tuple(r) for r in m.read_current(spark).collect())
    assert (999, 99) in got and len(got) == 101


def test_compaction_tightens_file_stats(spark, tmp_path):
    """Each compacted file must cover a narrow slice of the cluster key
    (row-group min/max selective), while the landing files — written in
    arrival order — each spanned the whole domain."""
    landing = str(tmp_path / "landing")
    table = str(tmp_path / "table")
    m = CompactionMaintainer(
        landing, table, ["k"], min_files=4, target_rows_per_file=250
    )
    # every batch spans the FULL key domain 0..999 (arrival order ⊥ key)
    for b in range(8):
        _append_batch(
            spark, landing, [(int(i), int(b)) for i in range(0, 1000, 8)]
        )
    out = m.run_once(spark)
    assert out["compacted"] and out["output_files"] >= 4
    gen = os.path.join(table, f"gen_v{out['version']}")
    spans = []
    for f in os.listdir(gen):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(gen, f)).metadata
        if md.num_rows == 0:
            continue
        st = md.row_group(0).column(0).statistics
        spans.append(st.max - st.min)
    # narrow slices: each file ≤ ~1/3 of the domain (landing files: full)
    assert spans and all(s <= 400 for s in spans), spans


def test_crash_between_write_and_commit_loses_nothing(spark, tmp_path):
    """Simulated crash: a new generation directory exists but the
    pointer never swapped and landing files were not deleted — readers
    still see the OLD generation + ALL landing rows; the next tick
    re-compacts cleanly."""
    landing = str(tmp_path / "landing")
    table = str(tmp_path / "table")
    m = CompactionMaintainer(
        landing, table, ["k"], min_files=2, target_rows_per_file=10_000
    )
    _append_batch(spark, landing, [(1, 1)])
    _append_batch(spark, landing, [(2, 2)])
    assert m.run_once(spark)["compacted"]

    _append_batch(spark, landing, [(3, 3)])
    _append_batch(spark, landing, [(4, 4)])
    # fake a crashed compaction: orphan gen dir, no pointer move
    spark.read.parquet(landing).write.mode("overwrite").parquet(
        os.path.join(table, "gen_v99")
    )
    assert m.current_version() == 1  # pointer untouched
    got = sorted(r["k"] for r in m.read_current(spark).collect())
    assert got == [1, 2, 3, 4]  # old gen + landing, orphan invisible

    out = m.run_once(spark)  # recovery tick
    assert out["compacted"] and out["version"] == 2
    got = sorted(r["k"] for r in m.read_current(spark).collect())
    assert got == [1, 2, 3, 4]


def test_crash_between_commit_and_gc_duplicates_nothing(
    spark, tmp_path, monkeypatch
):
    """The OTHER crash window (VERDICT r6 #3): the pointer has swapped to
    the new generation but the process dies before deleting the consumed
    landing files. Pre-manifest, those files were both folded into the
    generation AND still served / re-folded — permanent duplicates. Now
    the generation's ``_CONSUMED`` manifest must shield every read and
    the next tick, which GCs the remnants idempotently."""
    import _data_engineering_pipeline_project_spark.streaming.compactmaint as cm

    landing = str(tmp_path / "landing")
    table = str(tmp_path / "table")
    m = CompactionMaintainer(
        landing, table, ["k"], min_files=2, target_rows_per_file=10_000
    )
    _append_batch(spark, landing, [(1, 1)])
    _append_batch(spark, landing, [(2, 2)])

    # kill the GC loop: os.remove dies on the first consumed file —
    # exactly a crash after the pointer swap, before any deletion
    def _boom(path):
        raise OSError(f"simulated crash before GC of {path}")

    monkeypatch.setattr(cm.os, "remove", _boom)
    try:
        m.run_once(spark)
    except OSError:
        pass
    monkeypatch.undo()

    assert m.current_version() == 1  # commit landed
    assert len(os.listdir(landing)) == 2  # remnants still on disk

    # reads must NOT double-count the consumed-but-undeleted files
    got = sorted(r["k"] for r in m.read_current(spark).collect())
    assert got == [1, 2]

    # next tick: remnants are GC'd, not re-folded; new data compacts in
    _append_batch(spark, landing, [(3, 3)])
    _append_batch(spark, landing, [(4, 4)])
    out = m.run_once(spark)
    assert out["compacted"] and out["version"] == 2
    assert len(os.listdir(landing)) == 0  # remnants + new files consumed
    got = sorted(r["k"] for r in m.read_current(spark).collect())
    assert got == [1, 2, 3, 4]  # every row exactly once

    # a remnant-only debounced tick is also a clean GC path
    _append_batch(spark, landing, [(5, 5)])
    got = sorted(r["k"] for r in m.read_current(spark).collect())
    assert got == [1, 2, 3, 4, 5]
