"""Sinks: error-row sink (S9), audit log (S10), generic writers (S6-S8).

The reference appends ONE ROW AT A TIME to per-(table, issue) error CSVs
(reference project/data_quality_checker.py:63-72) and logs each violation
(dq:14-21). At scale that is a driver bottleneck; the engine writes each
check's violations as a single partitioned dataset:
``errors/check=<name>/`` parquet, one set-level write per pipeline run.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame

logger = logging.getLogger("data_engineering_pipeline_project_spark")


def write_error_sink(violations: DataFrame, out_dir: str, fmt: str = "parquet") -> None:
    """Append violations partitioned by ``check`` (replaces per-row CSV
    appends, dq:63-72). ``violations`` shape: (check, issue, row_json) —
    see ``QualityChecker.violations_union``.
    """
    (
        violations.write.mode("append")
        .partitionBy("check")
        .format(fmt)
        .save(out_dir)
    )


def log_check_summary(violations: DataFrame) -> list[tuple[str, str, int]]:
    """S10 — audit-trail logging of per-check violation counts.

    Aggregates first (one tiny collect), logs once per (check, issue) —
    the reference logs once per violating value (dq throughout).
    """
    from pyspark.sql import functions as F

    rows = (
        violations.groupBy("check", "issue").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    out = []
    for r in rows:
        logger.warning("%s [%s]: %d violations", r["check"], r["issue"], r["n"])
        out.append((r["check"], r["issue"], r["n"]))
    return out


def write_table(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S6/S7 — set-level parquet write; chunking (etl2:301) is implicit in
    partition-parallel tasks."""
    df.write.mode(mode).parquet(path)


def read_jdbc(spark, url: str, table: str, **options) -> DataFrame:
    """S5 — JDBC read (reference reads the whole sink table back for
    diffing, etl2:311). Gated: no JDBC driver ships in this environment."""
    return spark.read.format("jdbc").option("url", url).option("dbtable", table).options(
        **options
    ).load()
