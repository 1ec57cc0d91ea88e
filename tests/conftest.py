from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from _data_engineering_pipeline_project_spark.session import get_spark

    spark = get_spark("tests", shuffle_partitions=4)
    yield spark
