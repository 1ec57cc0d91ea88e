from _data_engineering_pipeline_project_spark.plans.audit import (  # noqa: F401
    broadcast_join_count,
    exchange_count,
    explain_str,
    pushed_filters,
    read_schemas,
    scan_summary,
)
