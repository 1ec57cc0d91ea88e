"""Isolate a query's computation cost with the noop sink (guide §1.4).

Usage:
    python tools/time_noop.py <query> [reps] [sf_dir]

Times `queries()[name](spark, sf_dir).write.format("noop")` — eagerly
computes every column of every row, discards the result — reps times
(default 3) after one warm-up, printing each rep. Jobs are labeled so
the plan is identifiable if the UI is enabled.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )

    import __spark_entry__  # noqa: F401
    from _data_engineering_pipeline_project_spark import queries as q
    from _data_engineering_pipeline_project_spark.session import get_spark

    spark = get_spark("time_noop")
    fn = q.QUERIES[name]
    spark.sparkContext.setJobDescription(f"noop:{name}:warmup")
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    times = []
    for i in range(reps):
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"noop:{name}:rep{i}")
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        times.append(dt)
        print(f"{name} rep{i}: {dt:.3f}s", flush=True)
    print(f"{name} best={min(times):.3f}s median={sorted(times)[len(times)//2]:.3f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
