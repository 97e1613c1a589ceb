"""Every SQL-oracled §2 query must match its DuckDB oracle (driver t2 mirror)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_ORACLE, SF_SMOKE
from tests.oracle_util import compare


def _entry():
    import __spark_entry__ as e

    return e


def pytest_generate_tests(metafunc):
    if "qname" in metafunc.fixturenames:
        e = _entry()
        keys = [k for k in e.queries() if k in e.oracle_sql()]
        metafunc.parametrize("qname", keys)


# CLAUDE.md hard rule: verify at BOTH sf0.001 and sf0.01 — some
# divergences (decimal overflow, tie-breaks) only appear at larger SF.
# The sf0.01 pass is marked slow; deselect with `-m "not slow"`.
@pytest.mark.parametrize(
    "sf_dir",
    [SF_SMOKE, pytest.param(SF_ORACLE, marks=pytest.mark.slow)],
    ids=["sf0.001", "sf0.01"],
)
def test_query_matches_oracle(spark, qname, sf_dir):
    e = _entry()
    df = e.queries()[qname](spark, sf_dir)
    problems = compare(df, e.oracle_sql()[qname], sf_dir)
    assert not problems, f"{qname}: " + "; ".join(problems)


def test_entry_smoke(spark):
    e = _entry()
    df = e.entry(spark)
    assert df.count() >= 0
