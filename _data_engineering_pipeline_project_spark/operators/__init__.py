from _data_engineering_pipeline_project_spark.operators.quality import (  # noqa: F401
    CheckResult,
    QualityChecker,
)
