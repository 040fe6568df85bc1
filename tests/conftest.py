from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from insight_gp_import_spark.session import get_session

SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"
SF10 = "/root/testdata/sf0.1"


@pytest.fixture(scope="session")
def spark():
    s = get_session(app_name="igis-tests", shuffle_partitions=8)
    yield s
    s.stop()
