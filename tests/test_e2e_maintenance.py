"""End-to-end MAINTENANCE composition: a stream of small micro-batch
files flows through the compaction maintainer (clustered generations,
atomic pointer) while an incremental rollup (aggmaint monoid merges)
tracks the same data batch-by-batch — and at every checkpoint the
incremental state must equal a from-scratch recompute over
``read_current``. This pins the contract the individual maintainer
tests can't: the pieces COMPOSE (compaction never loses or duplicates
rows under the rollup, the rollup never depends on file layout)."""

from __future__ import annotations

import os

from _data_engineering_pipeline_project_spark.streaming.aggmaint import (
    merge_rollup,
    partial_agg,
)
from _data_engineering_pipeline_project_spark.streaming.compactmaint import (
    CompactionMaintainer,
)


def _append_batch(spark, landing, rows):
    import shutil
    import uuid

    df = spark.createDataFrame(rows, "user_id long, v long")
    tmp = os.path.join(landing, f"_tmp_{uuid.uuid4().hex}")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
    os.makedirs(landing, exist_ok=True)
    os.replace(
        os.path.join(tmp, part),
        os.path.join(landing, f"{uuid.uuid4().hex}.parquet"),
    )
    shutil.rmtree(tmp)


def _rollup_rows(df):
    return {
        r["user_id"]: (r["n"], r["total"], r["vmin"], r["vmax"])
        for r in df.collect()
    }


def test_compaction_and_rollup_compose(spark, tmp_path):
    landing = str(tmp_path / "landing")
    table_dir = str(tmp_path / "table")
    m = CompactionMaintainer(
        landing, table_dir, ["user_id"], min_files=4,
        target_rows_per_file=50,
    )

    rollup = None
    total_rows = 0
    for b in range(12):
        # batch b: users b%5, (b+1)%5, (b+2)%5 with distinct values
        rows = [(int((b + j) % 5), int(b * 10 + j)) for j in range(3)]
        total_rows += len(rows)
        _append_batch(spark, landing, rows)
        # incremental rollup sees EVERY batch exactly once, regardless
        # of when compaction folds the files
        batch_df = spark.createDataFrame(rows, "user_id long, v long")
        rollup = merge_rollup(
            partial_agg(batch_df, ["user_id"], "v"), rollup, ["user_id"]
        )
        if b % 4 == 3:
            out = m.run_once(spark)
            assert out["compacted"], out
            # checkpoint: incremental state == from-scratch recompute
            # over what the table serves (generation ∪ landing)
            served = m.read_current(spark)
            assert served.count() == total_rows
            truth = partial_agg(served, ["user_id"], "v")
            assert _rollup_rows(rollup) == _rollup_rows(truth)
        # rollup stays queryable mid-stream too
        assert rollup.count() <= 5

    # final state: three compactions consumed all 12 files
    assert m.current_version() == 3
    assert len(os.listdir(landing)) == 0
    served = m.read_current(spark)
    assert served.count() == total_rows
    assert _rollup_rows(rollup) == _rollup_rows(
        partial_agg(served, ["user_id"], "v")
    )
