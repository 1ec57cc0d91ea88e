"""Checkpoint strategy helper.

``localCheckpoint(eager=True)`` is the engine's default way to pin a
materialized frame into the plan (truncating lineage and surviving
``clearCache()``), but its blocks live UNREPLICATED on executors: on a
real cluster, losing one executor makes every later consumer of the
pinned frame fail hard for the rest of the session (ADVICE r7 #2 — the
trade the memo caches and iterative loops were silently making).

``pinned_checkpoint`` upgrades to a RELIABLE checkpoint whenever the
deployment has opted in by setting a checkpoint dir
(``spark.sparkContext.setCheckpointDir(...)`` — on a cluster that is a
DFS path, exactly the GraphX/Pregel discipline), and falls back to
``localCheckpoint`` otherwise (the right call on local[\\*], where the
"cluster" cannot lose an executor without losing the JVM, and writing
checkpoint files would only add I/O). Cluster runbooks should set the
dir; everything that pins frames then becomes executor-loss-safe with
no code change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def pinned_checkpoint(df: DataFrame) -> DataFrame:
    """Eagerly materialize ``df`` with lineage truncation: reliable
    ``checkpoint`` when a checkpoint dir is configured, else
    ``localCheckpoint``."""
    sc = df.sparkSession.sparkContext
    try:
        has_dir = sc._jsc.sc().getCheckpointDir().isDefined()
    except Exception:
        has_dir = False
    if has_dir:
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)
