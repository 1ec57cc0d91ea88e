"""Breakdown of near_dup_pairs_maintained's session bootstrap at
sf0.01 (VERDICT r12 #5): where do the ~39 s go?

Replays the registry bootstrap (two crc32 slices of documents ->
NearDupIndexMaintainer ticks -> serve) with a wall timer per phase and
a job counter (statusTracker) per tick, so the SCALE.md row can say
which ACTIONS dominate — the hypothesis is fixed per-job scheduling
overhead x many small actions, not data volume.

Usage: python tools/profile_neardup_bootstrap.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def main() -> None:
    from _data_engineering_pipeline_project_spark.catalog import table
    from _data_engineering_pipeline_project_spark.session import get_spark
    from _data_engineering_pipeline_project_spark.streaming.neardupmaint import (
        NearDupIndexMaintainer,
    )

    spark = get_spark("profile_neardup", shuffle_partitions=32)
    sc = spark.sparkContext
    docs = table(spark, SF, "documents").select("doc_id", "text")
    bucket = F.pmod(
        F.crc32(F.col("doc_id").cast("string").cast("binary")), F.lit(2)
    )
    tmpdir = tempfile.mkdtemp(prefix="ndm_profile_")
    mnt = NearDupIndexMaintainer(spark, os.path.join(tmpdir, "index"))

    def jobs() -> int:
        # highest job id seen so far (monotone counter)
        ids = sc.statusTracker().getJobIdsForGroup(None)
        return max(ids) + 1 if ids else 0

    t_all = time.time()
    for i in range(2):
        j0, t0 = jobs(), time.time()
        mnt.merge_batch(docs.filter(bucket == i), batch_id=i)
        print(
            f"tick {i}: {time.time() - t0:6.2f}s  "
            f"jobs {jobs() - j0}",
            flush=True,
        )
    j0, t0 = jobs(), time.time()
    n = mnt.pairs().count()
    print(
        f"serve: {time.time() - t0:6.2f}s  jobs {jobs() - j0}  rows {n}",
        flush=True,
    )
    print(f"TOTAL: {time.time() - t_all:6.2f}s  jobs {jobs()}")


if __name__ == "__main__":
    main()
