from _data_engineering_pipeline_project_spark.multimodal.binary import (  # noqa: F401
    attach_binary_payload,
    binary_stats,
    fake_decode_images,
)
