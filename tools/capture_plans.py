"""Capture .explain("formatted") output for declared queries.

Usage:
    python tools/capture_plans.py <out_dir> [query ...]

With no query names, captures every bench.BENCH_QUERIES + TPCH_QUERIES
entry (deduped). Writes <out_dir>/<query>.txt. Used to produce the
plans/r13/<query>_before.txt / _after.txt evidence files.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    out_dir = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__  # noqa: F401  (registers every query module)
    import bench
    from _data_engineering_pipeline_project_spark import queries as q
    from _data_engineering_pipeline_project_spark.session import get_spark

    if not names:
        seen = set()
        names = [
            n
            for n in bench.BENCH_QUERIES + bench.TPCH_QUERIES
            if not (n in seen or seen.add(n))
        ]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("capture_plans")
    for name in names:
        fn = q.QUERIES.get(name)
        if fn is None:
            print(f"SKIP {name}: not registered")
            continue
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(plan)
        print(f"WROTE {name} ({len(plan)} bytes)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
