from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: larger-SF oracle passes (deselect with -m 'not slow')")


@pytest.fixture(scope="session")
def spark():
    from northwind_warehouse_spark.session import get_spark

    s = get_spark("nws-tests", shuffle_partitions=8)
    yield s
    s.stop()
