"""10× key-offset scale-up measurement (docs/SCALE.md protocol).

Replicates chosen fact tables 10× with key offsets (PK/FK semantics
preserved) into a temp dir, then times selected queries at 1× vs 10×
and prints the wall-clock ratio — the per-query scale-shape check the
SCALE.md measurements use. Usage:

    python tools/measure_scaleup.py <query> [<query> ...]
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
FACTS = {
    # table -> key columns to offset per replica (PK and the FKs that
    # reference replicated PKs)
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],
    "customer": ["c_custkey"],
    "events": ["event_id", "user_id"],
}
DIMS = ["region", "nation", "supplier", "part", "documents", "embeddings"]


def build_replicated(spark, out_dir: str, factor: int = 10) -> None:
    for t, keys in FACTS.items():
        src = spark.read.parquet(f"{SF_DIR}/{t}.parquet")
        offs = {k: src.agg(F.max(k)).collect()[0][0] + 1 for k in keys}
        parts = []
        for i in range(factor):
            rep = src
            for k, off in offs.items():
                rep = rep.withColumn(k, F.col(k) + F.lit(i * off))
            parts.append(rep)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")
    for t in DIMS:
        src = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(src):
            spark.read.parquet(src).write.mode("overwrite").parquet(
                f"{out_dir}/{t}.parquet"
            )


def main() -> None:
    import __spark_entry__ as entry
    from _data_engineering_pipeline_project_spark.session import get_spark

    names = sys.argv[1:]
    spark = get_spark("scaleup")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    rep_dir = tempfile.mkdtemp(prefix="repl10_")
    try:
        t0 = time.time()
        build_replicated(spark, rep_dir)
        print(f"replicated 10x in {time.time() - t0:.1f}s -> {rep_dir}")
        for name in names:
            fn = qs[name]
            fn(spark, SF_DIR).count()  # warm
            t0 = time.time()
            fn(spark, SF_DIR).count()
            base = time.time() - t0
            fn(spark, rep_dir).count()  # warm
            t0 = time.time()
            fn(spark, rep_dir).count()
            big = time.time() - t0
            print(
                f"{name}: 1x={base:.2f}s 10x={big:.2f}s "
                f"ratio={big / max(base, 1e-9):.2f}x"
            )
    finally:
        shutil.rmtree(rep_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
