import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import universal_parquet_exporter_spark  # noqa: F401  (applies malloc tuning)

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF_SMOKE = os.path.join(TESTDATA, "sf0.001")
SF_CORRECT = os.path.join(TESTDATA, "sf0.01")


@pytest.fixture(scope="session")
def spark():
    from universal_parquet_exporter_spark.sources.session import build_session

    s = build_session(app_name="upes-tests", cpus=4, shuffle_partitions=8)
    yield s
    s.stop()
