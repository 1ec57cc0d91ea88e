"""Tick-cost shape measurement for NearDupIndexMaintainer (SCALE.md r12).

Claim: a tick is O(batch) signature work + state SCANS (replay
anti-join, stored-bands candidate join, partner-text lookup — batch
side broadcast in all three), never state shuffles or recomputes.
Measured with a fixed 200-doc batch against a 1× vs 10× standing index.

Usage: python tools/measure_neardup_maint.py [base_docs] [factor]
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


def timed(fn):
    t0 = time.time()
    out = fn()
    return time.time() - t0, out


def doc_batch(spark, n, offset):
    """Deterministic synthetic docs with DISJOINT vocabularies across
    non-dup docs: ids 20j and 20j+1 share 18 of 19 tokens (a real
    near-dup pair, J≈0.7); every other doc pair shares ZERO tokens. A
    generator with corpus-wide shared head/tail words makes MinHash
    bands collide across the whole corpus (quadratic candidate blob no
    real corpus has) — measured the hard way."""
    key = F.when(
        F.col("id") % 20 < 2, F.col("id") - F.col("id") % 20
    ).otherwise(F.col("id")) + F.lit(offset)
    toks = [
        F.concat(
            F.lit(f"w{j}x"), (key * 31 + F.lit(j)).cast("string")
        )
        for j in range(18)
    ]
    return spark.range(n).select(
        (offset + F.col("id")).alias("doc_id"),
        F.concat_ws(
            " ", *toks, (offset + F.col("id")).cast("string")
        ).alias("text"),
    )


def main() -> None:
    from _data_engineering_pipeline_project_spark.session import get_spark
    from _data_engineering_pipeline_project_spark.streaming.neardupmaint import (
        NearDupIndexMaintainer,
    )

    spark = get_spark("measure_neardup_maint")
    results = {}
    for label, ndocs in (("1x", BASE), (f"{FACTOR}x", BASE * FACTOR)):
        tmp = tempfile.mkdtemp(prefix=f"ndm_{label}_")
        mnt = NearDupIndexMaintainer(spark, os.path.join(tmp, "index"))
        mnt.merge_batch(doc_batch(spark, ndocs, 0), batch_id=0)
        batch = doc_batch(spark, 200, 50_000_000)
        t_tick, _ = timed(lambda: mnt.merge_batch(batch, batch_id=1))
        t_pairs, n_pairs = timed(lambda: mnt.pairs().count())
        t_cl, n_cl = timed(lambda: mnt.clusters().count())
        results[label] = dict(
            index_docs=ndocs + 200,
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
