"""Streaming incremental corpus dedup (streaming/dedupmaint.py):
batch-equivalence, redelivery idempotence, crash safety, and a real
AvailableNow file-stream run."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from _data_engineering_pipeline_project_spark.streaming.dedupmaint import (
    DedupMaintainer,
)

_SCHEMA = "doc_id long, text string"


def _df(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


def test_maintained_equals_batch_keep_first(spark, tmp_path):
    """The streaming admission over N batches equals one-shot exact
    dedup (keep first by (batch, id)) over the concatenation."""
    batches = [
        [(1, "alpha text"), (2, "beta text"), (3, "alpha  TEXT")],  # 3 dups 1
        [(10, "beta text"), (11, "gamma text")],  # 10 dups 2
        [(20, "alpha text"), (21, "delta text"), (22, "delta text")],
    ]
    m = DedupMaintainer(spark, str(tmp_path / "state"))
    for i, rows in enumerate(batches):
        m.accept_batch(_df(spark, rows), i)

    got = sorted(
        (r.doc_id, r.text) for r in m.accepted().select("doc_id", "text").collect()
    )
    # expected: first occurrence of each normalized fingerprint in
    # (batch, doc_id) order
    assert got == [
        (1, "alpha text"),
        (2, "beta text"),
        (11, "gamma text"),
        (21, "delta text"),
    ]


def test_within_batch_tie_keeps_smallest_id(spark, tmp_path):
    m = DedupMaintainer(spark, str(tmp_path / "state"))
    m.accept_batch(_df(spark, [(9, "same"), (3, "same"), (7, "same")]), 0)
    rows = m.accepted().collect()
    assert [r.doc_id for r in rows] == [3]


def test_redelivered_batch_is_noop(spark, tmp_path):
    m = DedupMaintainer(spark, str(tmp_path / "state"))
    m.accept_batch(_df(spark, [(1, "a"), (2, "b")]), 0)
    v = m.version
    m.accept_batch(_df(spark, [(1, "a"), (2, "b")]), 0)  # redelivery
    assert m.version == v
    assert m.accepted().count() == 2


def test_restart_recovers_and_continues(spark, tmp_path):
    base = str(tmp_path / "state")
    m1 = DedupMaintainer(spark, base)
    m1.accept_batch(_df(spark, [(1, "a"), (2, "b")]), 0)
    # new instance (process restart)
    m2 = DedupMaintainer(spark, base)
    assert m2.version == m1.version
    m2.accept_batch(_df(spark, [(3, "b"), (4, "c")]), 1)
    assert sorted(r.doc_id for r in m2.accepted().collect()) == [1, 2, 4]


def test_crash_before_commit_is_invisible_then_idempotent(spark, tmp_path):
    base = str(tmp_path / "state")
    m = DedupMaintainer(spark, base)
    m.accept_batch(_df(spark, [(1, "a")]), 0)
    # simulate a crash AFTER batch-1 wrote its output subdir + state dir
    # but BEFORE the pointer moved: write the artifacts manually
    _df(spark, [(5, "z")]).write.mode("overwrite").parquet(
        os.path.join(base, "accepted", "batch_id=1")
    )
    spark.createDataFrame([("deadbeef",)], "__fp string").write.mode(
        "overwrite"
    ).parquet(os.path.join(base, "seen_v2"))

    m2 = DedupMaintainer(spark, base)  # restart
    assert m2.version == 1  # uncommitted v2 invisible
    assert sorted(r.doc_id for r in m2.accepted().collect()) == [1]
    # redelivery of batch 1 recomputes and commits over the orphan
    m2.accept_batch(_df(spark, [(5, "z"), (6, "a")]), 1)
    assert sorted(r.doc_id for r in m2.accepted().collect()) == [1, 5]
    with open(os.path.join(base, "_CURRENT")) as f:
        assert json.load(f)["version"] == m2.version


def test_available_now_stream_end_to_end(spark, tmp_path):
    import glob
    import shutil

    src = tmp_path / "src"
    src.mkdir()

    def land(rows, name):
        # land a bare parquet FILE in the watched dir (the shape a
        # continuously-fed landing zone has)
        staging = str(tmp_path / "staging" / name)
        _df(spark, rows).coalesce(1).write.mode("overwrite").parquet(staging)
        part = glob.glob(os.path.join(staging, "part-*.parquet"))[0]
        shutil.copy(part, str(src / f"{name}.parquet"))

    land([(1, "one"), (2, "two")], "f1")
    base = str(tmp_path / "state")
    m = DedupMaintainer(spark, base)
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    m.run_available_now(str(src), schema, str(tmp_path / "ckpt"))
    assert m.accepted().count() == 2
    # second file with one dup; same checkpoint → only the new file drains
    land([(3, "two"), (4, "three")], "f2")
    m2 = DedupMaintainer(spark, base)
    m2.run_available_now(str(src), schema, str(tmp_path / "ckpt"))
    assert sorted(r.doc_id for r in m2.accepted().collect()) == [1, 2, 4]


def test_vacuum_keeps_recent_state(spark, tmp_path):
    base = str(tmp_path / "state")
    m = DedupMaintainer(spark, base)
    for i in range(4):
        m.accept_batch(_df(spark, [(i, f"t{i}")]), i)
    removed = m.vacuum_versions(keep_last=2)
    assert removed and all(r.startswith("seen_v") for r in removed)
    # current state still readable; accepted data untouched
    assert m.seen().count() == 4
    assert m.accepted().count() == 4


def test_lost_pointer_recovers_from_scan(spark, tmp_path):
    """Deleting _CURRENT must NOT reset the maintainer to version 0 (which
    would re-admit every seen fingerprint and clobber batch outputs) —
    recovery scans seen_v*/_SUCCESS and accepted batch dirs."""
    base = str(tmp_path / "state")
    m = DedupMaintainer(spark, base)
    m.accept_batch(_df(spark, [(1, "a"), (2, "b")]), 0)
    m.accept_batch(_df(spark, [(3, "c"), (4, "a")]), 1)
    os.remove(os.path.join(base, "_CURRENT"))

    m2 = DedupMaintainer(spark, base)
    assert m2.version == 2
    assert sorted(r.doc_id for r in m2.accepted().collect()) == [1, 2, 3]
    # and the seen set still rejects old content
    m2.accept_batch(_df(spark, [(9, "a"), (10, "new")]), 2)
    assert sorted(r.doc_id for r in m2.accepted().collect()) == [1, 2, 3, 10]


def test_checkpoint_reset_fails_loudly(spark, tmp_path):
    """A different checkpoint dir (ids restarting at 0) must raise, not
    silently absorb real batches as redelivery."""
    base = str(tmp_path / "state")
    m = DedupMaintainer(spark, base)
    m.bind_checkpoint("/ckpt/one")
    m.accept_batch(_df(spark, [(1, "a")]), 0)

    m2 = DedupMaintainer(spark, base)
    m2.bind_checkpoint("/ckpt/one")  # same checkpoint: fine
    with pytest.raises(ValueError, match="checkpoint mismatch"):
        m2.bind_checkpoint("/ckpt/two")
    # pre-guard state (no token recorded) adopts the first offered token
    os.remove(os.path.join(base, "_CURRENT"))
    m3 = DedupMaintainer(spark, base)
    m3.bind_checkpoint("/ckpt/three")  # no raise


# --------------------------------------------------------------------------
# property: maintained admission == one-shot batch keep-first
# --------------------------------------------------------------------------
from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_batches_strategy = st.lists(
    st.lists(
        st.sampled_from(["aa", "bb", "cc", "dd", "ee"]),
        min_size=0,
        max_size=4,
    ),
    min_size=1,
    max_size=4,
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batches=_batches_strategy)
def test_maintained_equals_batch_dedup_property(spark, tmp_path_factory, batches):
    base = str(tmp_path_factory.mktemp("dm"))
    m = DedupMaintainer(spark, base)
    next_id = 0
    expected_first: dict[str, int] = {}
    any_rows = False
    for bi, texts in enumerate(batches):
        rows = []
        for t in texts:
            rows.append((next_id, t))
            expected_first.setdefault(t, next_id)
            next_id += 1
        if rows:
            any_rows = True
        m.accept_batch(
            spark.createDataFrame(rows, _SCHEMA)
            if rows
            else spark.createDataFrame([], _SCHEMA),
            bi,
        )
    if not any_rows:
        return
    got = sorted(r.doc_id for r in m.accepted().collect())
    assert got == sorted(expected_first.values())


def test_lost_pointer_with_orphan_batch_demotes_it(spark, tmp_path):
    """Crash wrote accepted/batch_id=1 but NOT seen_v2, then _CURRENT was
    lost: the scan must demote batch 1 to uncommitted (its fingerprints
    are missing from the seen set) so redelivery recomputes it —
    counting it committed would leave a hole that re-admits duplicate
    content forever."""
    base = str(tmp_path / "state")
    m = DedupMaintainer(spark, base)
    m.accept_batch(_df(spark, [(1, "a")]), 0)
    # orphan: batch-1 output exists, its seen-state write never happened
    _df(spark, [(5, "z")]).write.mode("overwrite").parquet(
        os.path.join(base, "accepted", "batch_id=1")
    )
    os.remove(os.path.join(base, "_CURRENT"))

    m2 = DedupMaintainer(spark, base)
    assert m2.version == 1
    # orphan demoted: redelivery of batch 1 recomputes and commits it
    assert m2._already_merged(1) is False
    m2.accept_batch(_df(spark, [(5, "z"), (6, "a")]), 1)
    assert sorted(r.doc_id for r in m2.accepted().collect()) == [1, 5]
    # "z" is now truly in the seen set — later duplicates rejected
    m2.accept_batch(_df(spark, [(9, "z")]), 2)
    assert sorted(r.doc_id for r in m2.accepted().collect()) == [1, 5]


def test_checkpoint_recreated_at_same_path_fails_loudly(spark, tmp_path):
    """The guard must key on the checkpoint IDENTITY (query id in
    <ckpt>/metadata), not the path: rm -rf + recreate at the SAME path
    gives a fresh id, restarts batch ids at 0, and must raise instead of
    silently absorbing new batches as redelivery."""
    import glob
    import shutil

    src = tmp_path / "src"
    src.mkdir()

    def land(rows, name):
        staging = str(tmp_path / "staging" / name)
        _df(spark, rows).coalesce(1).write.mode("overwrite").parquet(staging)
        part = glob.glob(os.path.join(staging, "part-*.parquet"))[0]
        shutil.copy(part, str(src / f"{name}.parquet"))

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    land([(1, "one")], "f1")
    base = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    m = DedupMaintainer(spark, base)
    m.run_available_now(str(src), schema, ckpt)
    assert m.accepted().count() == 1

    # the reset: same path, fresh checkpoint → fresh query id, ids at 0
    shutil.rmtree(ckpt)
    land([(2, "two")], "f2")
    m2 = DedupMaintainer(spark, base)
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="checkpoint mismatch"):
        m2.run_available_now(str(src), schema, ckpt)
    # state untouched by the refused run
    m3 = DedupMaintainer(spark, base)
    assert m3.accepted().count() == 1
