import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from azure_iot_realtime_data_pipeline_spark.session import get_spark  # noqa: E402

# Testdata layout is driver-provided; the base dir is overridable so the
# suite runs on machines with a different layout (ADVICE r4).
TESTDATA_BASE = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF_SMOKE = os.path.join(TESTDATA_BASE, "sf0.001")
SF_ORACLE = os.path.join(TESTDATA_BASE, "sf0.01")
SF_BENCH = os.path.join(TESTDATA_BASE, "sf0.1")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_smoke():
    return SF_SMOKE


@pytest.fixture(scope="session")
def sf_oracle():
    return SF_ORACLE


@pytest.fixture(scope="session")
def sf_bench():
    return SF_BENCH
