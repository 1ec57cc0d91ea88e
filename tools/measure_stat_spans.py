"""Time the layout audit at a real post-clustering file count: driver
pyarrow loop vs mapInPandas fan-out over 10^4 parquet files.

Usage: python tools/measure_stat_spans.py [n_files]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    from pyspark.sql import functions as F

    from _data_engineering_pipeline_project_spark.operators.layout import (
        file_stat_spans,
        file_stat_spans_distributed,
    )
    from _data_engineering_pipeline_project_spark.session import get_spark

    spark = get_spark("measure_stat_spans")
    tmp = tempfile.mkdtemp(prefix="stat_spans_")
    try:
        # ~100 rows per file; sorted id so spans are meaningful
        (
            spark.range(n_files * 100)
            .withColumn("v", (F.col("id") % 1000).cast("double"))
            .repartitionByRange(n_files, "id")
            .write.mode("overwrite")
            .parquet(f"{tmp}/t")
        )
        t0 = time.monotonic()
        a = file_stat_spans(spark, f"{tmp}/t", "id")
        driver_s = round(time.monotonic() - t0, 2)
        t0 = time.monotonic()
        b = file_stat_spans_distributed(spark, f"{tmp}/t", "id")
        dist_cold_s = round(time.monotonic() - t0, 2)
        t0 = time.monotonic()
        file_stat_spans_distributed(spark, f"{tmp}/t", "id")
        dist_warm_s = round(time.monotonic() - t0, 2)
        print(
            json.dumps(
                {
                    "n_files": len(a),
                    "driver_loop_s": driver_s,
                    "distributed_cold_s": dist_cold_s,
                    "distributed_warm_s": dist_warm_s,
                    "spans_equal": sorted(a) == sorted(b),
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
