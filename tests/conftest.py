from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from spark_streaming_testbed_spark.session import get_session

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_session("pytest")
    s.sparkContext.setLogLevel("ERROR")
    yield s
