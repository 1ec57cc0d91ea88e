"""End-to-end pipeline composition — the engine's equivalent of the
reference's ``process()`` entry point (reference project/etl2.py:17-459):

1. ingest: CSV folder scan with multi-null normalization + datetime
   casting (sources/csv_source.py);
2. normalize: geolocation 1NF→3NF split (operators/normalize.py);
3. validate: QualityChecker over the registry — each check ONCE,
   violations collected lazily (the reference runs every check twice and
   mutates tables in place, dq:351-411 + etl2:433-458);
4. load: SCD2 merge per table in FK-topological order (operators/scd2.py,
   schema.SchemaRegistry.load_order) — one shuffle per table per batch
   instead of one DB transaction per changed row (etl2:354-412);
5. sinks: violations written once, partitioned by check (sources/sinks.py).

Each cycle of the reference's 8-minute polling loop corresponds to one
``run_batch`` call here (or one streaming micro-batch via
streaming.IncrementalLoader for the resident-driver form).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession

from _data_engineering_pipeline_project_spark.operators.normalize import (
    normalize_geolocation,
)
from _data_engineering_pipeline_project_spark.operators.quality import QualityChecker
from _data_engineering_pipeline_project_spark.operators.scd2 import Scd2Table
from _data_engineering_pipeline_project_spark.schema import SchemaRegistry
from _data_engineering_pipeline_project_spark.sources.csv_source import read_csv_dir
from _data_engineering_pipeline_project_spark.sources.sinks import (
    log_check_summary,
    write_error_sink,
)


@dataclass
class PipelineResult:
    cleaned: dict[str, DataFrame]
    violation_summary: list[tuple[str, str, int]]
    merge_stats: dict[str, dict[str, int]] = field(default_factory=dict)


class Pipeline:
    def __init__(
        self,
        spark: SparkSession,
        registry: SchemaRegistry,
        sink_dir: str,
    ):
        self.spark = spark
        self.registry = registry
        self.sink_dir = sink_dir
        self._tables: dict[str, Scd2Table] = {}

    def _scd2_table(self, name: str) -> Scd2Table:
        if name not in self._tables:
            self._tables[name] = Scd2Table(
                self.spark,
                f"{self.sink_dir}/{name}",
                list(self.registry[name].primary_key),
            )
        return self._tables[name]

    def run_batch(
        self,
        source_dir: str,
        batch_ts: datetime,
        normalize_geo: bool = True,
        write_errors: bool = True,
    ) -> PipelineResult:
        # 1. ingest (lazy scans; schema from the registry where declared)
        schemas = {
            name: tbl.struct
            for name, tbl in self.registry.tables.items()
        }
        tables = read_csv_dir(self.spark, source_dir, schemas)

        # 2. normalize geolocation to 3NF, drop the raw table (etl2:243)
        if normalize_geo and "geolocation" in tables:
            tables.update(normalize_geolocation(tables.pop("geolocation")))

        # 3. validate — single pass, violations lazy
        checker = QualityChecker(self.registry)
        cleaned = checker.run(tables)
        union = checker.violations_union()
        summary: list[tuple[str, str, int]] = []
        if union is not None:
            summary = log_check_summary(union)
            if write_errors:
                write_error_sink(union, f"{self.sink_dir}/_errors")

        # 4. load in FK order — parents before children (etl2:418-430)
        merge_stats: dict[str, dict[str, int]] = {}
        for name in self.registry.load_order():
            if name not in cleaned or not self.registry[name].primary_key:
                continue
            stats_df = self._scd2_table(name).merge(cleaned[name], batch_ts)
            merge_stats[name] = {
                r["change_type"]: r["n"] for r in stats_df.collect()
            }
        return PipelineResult(cleaned, summary, merge_stats)

    def current(self, name: str) -> DataFrame | None:
        return self._scd2_table(name).current()

    def history(self, name: str) -> DataFrame:
        return self._scd2_table(name).history()


def observed_load(
    df,
    checks: dict[str, "Column"] | None = None,
    name: str = "load_metrics",
):
    """Attach Spark's Observation API to a pipeline stage: named aggregate
    metrics (row counts, null counts, sums) collected DURING the action
    that materializes ``df`` — zero extra scans, unlike a separate
    ``.count()``/agg pass (which at 100 TB means re-reading the input).

    Returns (observed_df, observation); after any action on observed_df,
    ``observation.get`` yields the metrics dict. This is the engine's
    hook for per-batch data-quality telemetry on the write path (the
    reference logs counts by re-scanning — dq:226-239 runs its own
    pass)."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    metrics = {"n_rows": F.count(F.lit(1))}
    if checks:
        metrics.update(checks)
    obs = Observation(name)
    observed = df.observe(obs, *[v.alias(k) for k, v in metrics.items()])
    return observed, obs
