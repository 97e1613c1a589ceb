"""Write-path expectations: split a batch into kept rows and a
quarantine table with per-row failure reasons.

The reference enforces quality read-side (dbt schema tests — see
plans/medallion.py::dq_checks); an ingest pipeline at scale also needs
the WRITE-path form: bad rows must not poison the lake, but silently
dropping them destroys the audit trail. ``apply_expectations`` tags each
row with the FIRST failing rule (deterministic: rule order is the
contract) and routes failures to a quarantine DataFrame carrying the
reason — the expectations/DLT pattern expressed as two filters over one
scan, no UDFs, fully pushdown-friendly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def apply_expectations(
    df: DataFrame, rules: list[tuple[str, Column]]
) -> tuple[DataFrame, DataFrame]:
    """Split ``df`` by ordered ``(name, predicate)`` rules.

    A row is kept iff every predicate holds (nulls fail — an unknown is
    a violation on the write path). Returns ``(kept, quarantined)``;
    the quarantine side gains a ``dq_reason`` column naming the first
    failed rule.
    """
    reason = F.lit(None).cast("string")
    for name, pred in reversed(rules):
        holds = F.coalesce(pred, F.lit(False))
        reason = F.when(~holds, F.lit(name)).otherwise(reason)
    tagged = df.withColumn("dq_reason", reason)
    kept = tagged.filter(F.col("dq_reason").isNull()).drop("dq_reason")
    quarantined = tagged.filter(F.col("dq_reason").isNotNull())
    return kept, quarantined
