"""Tick-cost shape measurement for ClusterMaintainer (SCALE.md r12).

Claim under test: a tick is O(batch) compute plus ONE scan of the
members relation (the batch-ids lookup join — the DedupMaintainer
economics), NOT O(edge history): the contracted CC graph is bounded by
the batch, the alias fold by the merge events. Measured honestly both
ways:

- fixed 1k-pair batch into a 1× vs 10× member state (scan-slope tick);
- serve cost (``clusters()`` count) at both states — one broadcast
  join over the appended dirs;
- ``compact()`` at the large state (the full-rewrite cost a real
  deployment schedules on the table cadence — recorded, not hidden).

Usage: python tools/measure_cluster_maint.py [base_members] [factor]
(defaults 20000, 10)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

BASE = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
FACTOR = int(sys.argv[2]) if len(sys.argv) > 2 else 10


def timed(fn):
    t0 = time.time()
    out = fn()
    return time.time() - t0, out


def pair_batch(spark, n_pairs, offset):
    """n disjoint pairs over fresh ids >= offset (plus nothing known)."""
    return spark.range(n_pairs).select(
        F.concat(F.lit("d"), (offset + 2 * F.col("id")).cast("string")).alias(
            "doc_a"
        ),
        F.concat(
            F.lit("d"), (offset + 2 * F.col("id") + 1).cast("string")
        ).alias("doc_b"),
    )


def main() -> None:
    from _data_engineering_pipeline_project_spark.session import get_spark
    from _data_engineering_pipeline_project_spark.streaming.clustermaint import (
        ClusterMaintainer,
    )

    spark = get_spark("measure_cluster_maint")
    results = {}
    for label, members in (("1x", BASE), (f"{FACTOR}x", BASE * FACTOR)):
        tmp = tempfile.mkdtemp(prefix=f"ccmaint_{label}_")
        mnt = ClusterMaintainer(spark, os.path.join(tmp, "cc"))
        # seed state: members/2 disjoint pairs -> `members` member rows
        mnt.merge_batch(pair_batch(spark, members // 2, 0), batch_id=0)
        # fixed tick: 1k fresh pairs + 10 merges into existing clusters
        fresh = pair_batch(spark, 1000, 10_000_000)
        merges = spark.range(10).select(
            F.concat(F.lit("d"), (2 * F.col("id")).cast("string")).alias(
                "doc_a"
            ),
            F.concat(
                F.lit("d"), (2 * F.col("id") + 101).cast("string")
            ).alias("doc_b"),
        )
        batch = fresh.unionByName(merges)
        t_tick, _ = timed(lambda: mnt.merge_batch(batch, batch_id=1))
        t_serve, n = timed(lambda: mnt.clusters().count())
        t_compact, _ = timed(mnt.compact)
        t_serve2, n2 = timed(lambda: mnt.clusters().count())
        assert n == n2
        results[label] = dict(
            members=n,
            tick_s=round(t_tick, 2),
            serve_s=round(t_serve, 2),
            compact_s=round(t_compact, 2),
            serve_after_compact_s=round(t_serve2, 2),
        )
        shutil.rmtree(tmp, ignore_errors=True)
    for label, r in results.items():
        print(label, r)


if __name__ == "__main__":
    main()
