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


def pytest_addoption(parser):
    parser.addoption(
        "--runslow",
        action="store_true",
        default=False,
        help="also run slow-marked batteries (the full gate: "
        "`python -m pytest tests/ -q --runslow`)",
    )


def pytest_collection_modifyitems(config, items):
    """Default suite budget (VERDICT r9 #3): heavyweight scale/property
    batteries carry @pytest.mark.slow and are skipped unless --runslow.
    The default suite stays a quick gate; the documented full-gate
    command runs everything."""
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow battery: run with --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
