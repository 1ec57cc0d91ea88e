from _data_engineering_pipeline_project_spark.functions.expressions import (  # noqa: F401
    EMOJI_PATTERN,
    any_null,
    chronology_violation_expr,
    keep_first,
    normalize_null_tokens,
    row_differs,
)
from _data_engineering_pipeline_project_spark.functions.vectors import (  # noqa: F401
    cosine_similarity,
    dot,
    l2_norm,
)
