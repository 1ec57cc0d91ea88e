"""Fellegi after r7 rewrite: fresh-process cold + warm-session cold-query."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.range(1).count()

from _data_engineering_pipeline_project_spark.queries_ext5 import (
    fellegi_sunter_linkage_parts,
)

for run in ("fresh-cold", "warm-cold-1", "warm-cold-2"):
    spark.catalog.clearCache()
    t0 = time.time()
    df = fellegi_sunter_linkage_parts(spark, SF)
    n = df.count()
    print(f"{run}: rows {n} in {time.time()-t0:.2f}s (build+exec)", flush=True)
spark.stop()
