"""PySpark-native analytics/ETL engine.

A brand-new engine with the query and data-processing capabilities of the
reference batch ETL + data-quality pipeline (see SURVEY.md), re-expressed
Spark-first: declarative DataFrame/SQL plans optimized by Catalyst, shuffle-
and partition-aware operators designed for 100 TB scale, extended with the
LLM-training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal columns).

Layout:
    session      SparkSession factory with scale-tuned defaults
    schema       declarative table registry (StructType + pk/fk metadata)
    catalog      named-table catalog over parquet/csv directories
    sources/     readers (csv with multi-null normalize, parquet, jdbc) + sinks
    operators/   quality checks, joins/diff, scd2, normalize, dedup,
                 similarity, textstats
    functions/   reusable column-expression builders (null-safe diff,
                 chronology chains, vector math)
    streaming/   micro-batch incremental load (Structured Streaming)
    multimodal/  binary-column plumbing (decode stubs, real Spark plumbing)
"""

__version__ = "0.1.0"

from _data_engineering_pipeline_project_spark.session import get_spark  # noqa: F401
