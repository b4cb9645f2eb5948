from __future__ import annotations

import pytest

from cdc_pipeline_spark.session import create_spark_session

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    session = create_spark_session(
        app_name="cdc-pipeline-spark-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": "/tmp/cdc-spark-test-warehouse"},
    )
    yield session
    session.stop()
