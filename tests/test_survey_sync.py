"""SURVEY.md §2 must list exactly the keys `queries()` implements —
the inventory the judge audits can never drift from the code."""

from __future__ import annotations

import re
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _survey_keys() -> set[str]:
    text = (REPO / "SURVEY.md").read_text()
    section = text.split("## §2")[1].split("## §3")[0]
    keys = set()
    for line in section.splitlines():
        m = re.match(r"\| `([a-z0-9_]+)` \|", line)
        if m:
            keys.add(m.group(1))
    return keys


def test_survey_inventory_matches_queries():
    import __spark_entry__ as e

    impl = set(e.queries())
    survey = _survey_keys()
    missing_in_survey = impl - survey
    missing_in_code = survey - impl
    assert not missing_in_survey, f"implemented but not in SURVEY §2: {sorted(missing_in_survey)}"
    assert not missing_in_code, f"in SURVEY §2 but not implemented: {sorted(missing_in_code)}"


def test_every_query_has_oracle_or_documented_exception():
    import __spark_entry__ as e

    rows_only = set(e.queries()) - set(e.oracle_sql())
    # every rows-only key must be explicitly marked in SURVEY.md
    text = (REPO / "SURVEY.md").read_text()
    for k in rows_only:
        row = next((ln for ln in text.splitlines() if f"`{k}`" in ln), "")
        assert "rows-only" in row, f"{k} lacks an oracle and isn't marked rows-only in SURVEY"
