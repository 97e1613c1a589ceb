"""Every SQL-oracled §2 query must match its DuckDB oracle (driver t2 mirror)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from tests.oracle_util import compare


def _entry():
    import __spark_entry__ as e

    return e


def pytest_generate_tests(metafunc):
    if "qname" in metafunc.fixturenames:
        e = _entry()
        keys = [k for k in e.queries() if k in e.oracle_sql()]
        metafunc.parametrize("qname", keys)


def test_query_matches_oracle(spark, qname):
    e = _entry()
    df = e.queries()[qname](spark, SF_SMOKE)
    problems = compare(df, e.oracle_sql()[qname], SF_SMOKE)
    assert not problems, f"{qname}: " + "; ".join(problems)


def test_entry_smoke(spark):
    e = _entry()
    df = e.entry(spark)
    assert df.count() >= 0
