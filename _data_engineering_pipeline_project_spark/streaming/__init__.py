from _data_engineering_pipeline_project_spark.streaming.microbatch import (  # noqa: F401
    IncrementalLoader,
    run_windowed_agg_stream,
)
