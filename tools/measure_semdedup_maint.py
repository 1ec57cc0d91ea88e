"""Tick-cost shape measurement for SemDeDupMaintainer (SCALE.md r12).

Claim: a tick is O(batch) assignment (broadcast frozen centroids +
max_by) plus same-centroid equi-joins where the STORED side is scanned
with the batch side broadcast — never recomputed (assignments and
norms persist with each vector). Fixed 200-vector batch against a 1×
vs 10× standing index.

Usage: python tools/measure_semdedup_maint.py [base_vectors] [factor]
(defaults 2000, 10)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

BASE = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
FACTOR = int(sys.argv[2]) if len(sys.argv) > 2 else 10
DIM = 16


def timed(fn):
    t0 = time.time()
    out = fn()
    return time.time() - t0, out


def vec_batch(spark, n, offset):
    """Deterministic sine-grid vectors (ids >= 1 — the zero vector has
    no norm)."""
    vid = (F.col("id") + 1 + offset).alias("vec_id")
    comps = F.array(
        *[F.sin(0.37 * (F.col("id") + 1 + offset) * (j + 1)) for j in range(DIM)]
    )
    return spark.range(n).select(vid, comps.alias("embedding"))


def main() -> None:
    from _data_engineering_pipeline_project_spark.session import get_spark
    from _data_engineering_pipeline_project_spark.streaming.semdedupmaint import (
        SemDeDupMaintainer,
    )

    spark = get_spark("measure_semdedup_maint")
    results = {}
    for label, nvecs in (("1x", BASE), (f"{FACTOR}x", BASE * FACTOR)):
        tmp = tempfile.mkdtemp(prefix=f"sdd_{label}_")
        mnt = SemDeDupMaintainer(
            spark,
            os.path.join(tmp, "index"),
            num_centroids=32,
            threshold=0.95,
            dim=DIM,
        )
        seed = vec_batch(spark, nvecs, 0)
        mnt.bootstrap(seed)
        mnt.merge_batch(seed, batch_id=0)
        batch = vec_batch(spark, 200, 50_000_000)
        t_tick, _ = timed(lambda: mnt.merge_batch(batch, batch_id=1))
        t_pairs, n_pairs = timed(lambda: mnt.pairs().count())
        t_cl, n_cl = timed(lambda: mnt.clusters().count())
        results[label] = dict(
            index_vectors=nvecs + 200,
            tick_s=round(t_tick, 2),
            pairs=n_pairs,
            serve_pairs_s=round(t_pairs, 2),
            clusters_rows=n_cl,
            serve_clusters_s=round(t_cl, 2),
        )
        shutil.rmtree(tmp, ignore_errors=True)
    for label, r in results.items():
        print(label, r)


if __name__ == "__main__":
    main()
