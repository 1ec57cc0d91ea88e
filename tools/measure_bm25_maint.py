"""Measure Bm25Maintainer per-tick cost as the accumulated index grows.

The claim: a tick is O(batch tokenize) + O(vocabulary merge), never
O(corpus) — so tick wall stays ~flat while the index grows 10×. Seeds
an index with fixed-size batches and reports the tick wall at several
accumulated sizes, plus a serve check against the one-shot build.

Usage: python tools/measure_bm25_maint.py [batch_docs] [n_batches]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from measure_bm25_build import synth_docs  # noqa: E402


def main() -> None:
    batch_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 11
    from pyspark.sql import functions as F

    from _data_engineering_pipeline_project_spark.operators.ranking import (
        bm25_scores_from_index,
    )
    from _data_engineering_pipeline_project_spark.session import get_spark
    from _data_engineering_pipeline_project_spark.streaming.bm25maint import (
        Bm25Maintainer,
    )

    spark = get_spark("measure_bm25_maint")
    tmp = tempfile.mkdtemp(prefix="bm25_maint_")
    ticks = []
    try:
        m = Bm25Maintainer(spark, f"{tmp}/idx", files_per_batch=4)
        for b in range(n_batches):
            # disjoint doc_id ranges per batch (the append-only contract)
            batch = synth_docs(spark, batch_docs).withColumn(
                "doc_id", F.col("doc_id") + b * batch_docs
            )
            t0 = time.monotonic()
            m.merge_batch(batch, batch_id=b)
            ticks.append(round(time.monotonic() - t0, 2))
        t0 = time.monotonic()
        n_hits = bm25_scores_from_index(m.serve_index(), ["w17", "w4242"]).count()
        serve_s = round(time.monotonic() - t0, 2)
        t0 = time.monotonic()
        m.compact()
        compact_s = round(time.monotonic() - t0, 2)
        t0 = time.monotonic()
        n_hits2 = bm25_scores_from_index(m.serve_index(), ["w17", "w4242"]).count()
        serve_compacted_s = round(time.monotonic() - t0, 2)
        print(
            json.dumps(
                {
                    "batch_docs": batch_docs,
                    "n_batches": n_batches,
                    "tick_walls_s": ticks,
                    "first_tick_s": ticks[0],
                    "last_tick_s": ticks[-1],
                    "serve_s": serve_s,
                    "compact_s": compact_s,
                    "serve_compacted_s": serve_compacted_s,
                    "hits_equal": n_hits == n_hits2,
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
