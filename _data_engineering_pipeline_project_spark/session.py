"""SparkSession factory.

Scale stance: these defaults are written for a real cluster (AQE on, skew
join handling on, partition coalescing on) and only the parallelism knobs
(`shuffle_partitions`, master) are sized for the local[32] test harness.
On a 1000-executor cluster you'd submit with the same app code and override
master / shuffle partitions via spark-submit conf; nothing in the engine
assumes local mode.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Local test harness sizing; a cluster deployment overrides via spark-submit.
_DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "data_engineering_pipeline_project_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession with engine defaults.

    AQE is enabled so runtime statistics re-plan shuffles (coalesce small
    partitions, split skewed ones, demote/promote join strategies); the
    session timezone is pinned to UTC so timestamp semantics match the
    DuckDB oracle; Arrow is enabled for the pandas-UDF extension operators.
    """
    cpus = int(_DEFAULT_CPUS)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # coalescePartitions.parallelismFirst stays at its default
        # (true). A/B'd in r14 (OPTIMIZATION_r14.md): false coalesces
        # byte-small shuffles to one task, which SERIALIZED the
        # compute-dense ANN/PQ family (embedding_topk_pq 4.5→18.8 s,
        # ivfpq 1.2→10.4 s, item_item_cosine 4.1→12.5 s) for a
        # negligible win on the overhead-bound tails — bytes are the
        # wrong proxy for these stages' cost.
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        # 16 MB, not the 64 MB this shipped with: the plan-time threshold
        # compares against ESTIMATED (compressed) sizes, and a hash
        # relation built from 64 MB of compressed shuffle output can
        # expand past the driver/executor heap share — measured: a 100×
        # documents scale-up run died in notEnoughMemoryToBuildAndBroadcast
        # when AQE auto-broadcast an ~8M-row exploded-bands side the
        # estimate called small. 16 MB compressed ≈ 100-200 MB built —
        # safe on any executor profile. Every join the engine WANTS
        # broadcast is explicitly hinted (or behind an adaptive gate), so
        # this only bounds the optimizer's speculative conversions.
        .config("spark.sql.autoBroadcastJoinThreshold", str(16 * 1024 * 1024))
        # deployments that opt into RELIABLE checkpoints (setCheckpointDir
        # → functions/persist.py upgrades every pinned frame) would
        # otherwise accumulate checkpoint files for the whole session;
        # the reference-tracking cleaner deletes them when the
        # checkpointed RDD is GC'd — a no-op under localCheckpoint
        .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    _warm_python_workers(spark)
    return spark


# one probe per application: getOrCreate can hand the same session back
_WARMED_APPS: set = set()


def _warm_python_workers(spark: SparkSession) -> None:
    """Fork the Python worker pool at session build (VERDICT r13 #8,
    guide §4.5): the FIRST pandas/Arrow job of a session pays the
    worker fork + import cost — measured 2.65 s for an identity
    mapInPandas at local[32] vs 0.52 s once the pool exists — and with
    ``spark.python.worker.reuse`` (default true) the pool persists, so
    one idle-time probe at session build takes that hit out of
    whichever operator happens to cross the Python boundary first. One
    task per core so every slot's worker is forked."""
    try:
        app = spark.sparkContext.applicationId
        if app in _WARMED_APPS:
            return
        _WARMED_APPS.add(app)
        n = spark.sparkContext.defaultParallelism

        def _idty(batches):
            for b in batches:
                yield b

        spark.range(n * 10, numPartitions=n).mapInPandas(
            _idty, "id long"
        ).count()
    except Exception:
        pass
