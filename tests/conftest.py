from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# Property tests share the box with parallel Spark jobs: wall-clock-based
# hypothesis health checks (too_slow, deadline) flake under load without
# indicating any defect — disable the timing checks globally, keep the
# semantic ones.
from hypothesis import HealthCheck, settings as _hsettings  # noqa: E402

_hsettings.register_profile(
    "loaded-box",
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
_hsettings.load_profile("loaded-box")


@pytest.fixture(scope="session")
def spark():
    from jitsu_spark.session import get_spark

    s = get_spark("jitsu-spark-tests", cpus=4, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
