from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    from _data_engineering_pipeline_project_spark.session import get_spark

    warehouse = tmp_path_factory.mktemp("warehouse")
    spark = get_spark(
        "tests",
        shuffle_partitions=4,
        extra_conf={"spark.sql.warehouse.dir": str(warehouse)},
    )
    yield spark
