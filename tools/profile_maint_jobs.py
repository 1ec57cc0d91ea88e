"""Per-JOB profile of the maintained-index bootstraps (r14 item 1).

Replays exactly what the registered maintained queries do at
$SPARK_GRAFT_SF_DIR (near-dup, semdedup, bm25, cluster bootstraps +
their serve action) and dumps every Spark job the AppStatusStore saw:
job id, duration, stage count, task count, and the first line of the
job name. The point is to see WHERE the fixed per-tick overhead goes
(how many jobs a tick schedules and what each costs) before fusing
anything — guide §1.

Usage: python tools/profile_maint_jobs.py [neardup|semdedup|bm25|cluster|all]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _jobs(spark):
    """All jobs the status store knows, as (id, name, dur_ms, stages)."""
    store = spark.sparkContext._jsc.sc().statusStore()
    out = []
    seq = store.jobsList(None)
    for i in range(seq.size()):
        j = seq.apply(i)
        sub = j.submissionTime()
        comp = j.completionTime()
        dur = None
        if sub.isDefined() and comp.isDefined():
            dur = comp.get().getTime() - sub.get().getTime()
        out.append(
            (
                j.jobId(),
                dur,
                j.stageIds().size(),
                j.numTasks(),
                (j.name() or "").split("\n")[0][:90],
            )
        )
    return sorted(out)


class Phase:
    def __init__(self, spark, label):
        self.spark, self.label = spark, label

    def __enter__(self):
        self.t0 = time.time()
        self.before = {j[0] for j in _jobs(self.spark)}
        return self

    def __exit__(self, *exc):
        dt = time.time() - self.t0
        new = [j for j in _jobs(self.spark) if j[0] not in self.before]
        tot = sum((j[1] or 0) for j in new)
        print(
            f"\n== {self.label}: {dt:.2f}s wall, {len(new)} jobs, "
            f"{tot/1000:.2f}s summed job time"
        )
        for jid, dur, nst, ntk, name in new:
            print(
                f"   job {jid:4d}  {(dur or 0)/1000:6.2f}s  "
                f"stages={nst:2d} tasks={ntk:3d}  {name}"
            )


def profile_neardup(spark):
    from _data_engineering_pipeline_project_spark.streaming.neardupmaint import (
        NearDupIndexMaintainer,
    )

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "text"
    )
    tmpdir = tempfile.mkdtemp(prefix="prof_ndm_")
    mnt = NearDupIndexMaintainer(spark, os.path.join(tmpdir, "index"))
    bucket = F.pmod(
        F.crc32(F.col("doc_id").cast("string").cast("binary")), F.lit(2)
    )
    for i in range(2):
        with Phase(spark, f"neardup tick {i}"):
            mnt.merge_batch(docs.filter(bucket == i), batch_id=i)
    with Phase(spark, "neardup serve pairs().count()"):
        mnt.pairs().count()
    shutil.rmtree(tmpdir, ignore_errors=True)


def profile_semdedup(spark):
    from _data_engineering_pipeline_project_spark.streaming.semdedupmaint import (
        SemDeDupMaintainer,
    )

    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )
    tmpdir = tempfile.mkdtemp(prefix="prof_sdd_")
    mnt = SemDeDupMaintainer(
        spark,
        os.path.join(tmpdir, "index"),
        num_centroids=16,
        threshold=0.4,
        dim=64,
    )
    with Phase(spark, "semdedup bootstrap(centroids)"):
        mnt.bootstrap(emb)
    bucket = F.pmod(
        F.crc32(F.col("vec_id").cast("string").cast("binary")), F.lit(2)
    )
    for i in range(2):
        with Phase(spark, f"semdedup tick {i}"):
            mnt.merge_batch(emb.filter(bucket == i), batch_id=i)
    with Phase(spark, "semdedup serve pairs().count()"):
        mnt.pairs().count()
    shutil.rmtree(tmpdir, ignore_errors=True)


def profile_bm25(spark):
    from _data_engineering_pipeline_project_spark.streaming.bm25maint import (
        Bm25Maintainer,
    )

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "text"
    )
    tmpdir = tempfile.mkdtemp(prefix="prof_bm_")
    mnt = Bm25Maintainer(spark, os.path.join(tmpdir, "index"))
    bucket = F.coalesce(
        F.pmod(
            F.crc32(F.col("doc_id").cast("string").cast("binary")), F.lit(2)
        ),
        F.lit(0),
    )
    for i in range(2):
        with Phase(spark, f"bm25 tick {i}"):
            mnt.merge_batch(docs.filter(bucket == i), batch_id=i)
    shutil.rmtree(tmpdir, ignore_errors=True)


def profile_cluster(spark):
    from _data_engineering_pipeline_project_spark.streaming.clustermaint import (
        ClusterMaintainer,
    )

    # synthetic pair batches shaped like the minhash pair graph
    pairs = spark.range(600).select(
        (F.col("id") * 2).alias("doc_a"), (F.col("id") * 2 + 1).alias("doc_b")
    )
    tmpdir = tempfile.mkdtemp(prefix="prof_cc_")
    mnt = ClusterMaintainer(spark, os.path.join(tmpdir, "clusters"))
    bucket = F.pmod(
        F.crc32(F.col("doc_a").cast("string").cast("binary")), F.lit(3)
    )
    for i in range(3):
        with Phase(spark, f"cluster tick {i}"):
            mnt.merge_batch(pairs.filter(bucket == i), batch_id=i)
    with Phase(spark, "cluster serve clusters().count()"):
        mnt.clusters().count()
    shutil.rmtree(tmpdir, ignore_errors=True)


def main() -> None:
    from _data_engineering_pipeline_project_spark.session import get_spark

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = get_spark("profile_maint_jobs")
    # warm the JVM/python workers so tick 0 is not charged first-touch
    spark.range(1000).selectExpr("sum(id)").collect()
    runners = {
        "neardup": profile_neardup,
        "semdedup": profile_semdedup,
        "bm25": profile_bm25,
        "cluster": profile_cluster,
    }
    for name, fn in runners.items():
        if which in ("all", name):
            fn(spark)


if __name__ == "__main__":
    main()
