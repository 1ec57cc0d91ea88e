from _data_engineering_pipeline_project_spark.sources.csv_source import (  # noqa: F401
    read_csv_dir,
    read_csv_table,
)
from _data_engineering_pipeline_project_spark.sources.sinks import (  # noqa: F401
    write_error_sink,
)
