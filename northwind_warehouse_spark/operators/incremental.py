"""Audit-control / high-watermark incremental processing.

Re-expresses the reference's audit machinery
(reference: macros/audit_management/{generate_audit_table,initialized_audit,
updating_audit,get_audit_info}.sql) Spark-first: the audit control table is
a small parquet state table keyed by entity; the high-watermark predicate
is a plain timestamp filter, so it pushes down to the parquet scan
(min/max row-group stats skip old files entirely — this is the whole point
at 100 TB).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EPOCH_LOW = datetime(1900, 1, 1)


@dataclass
class AuditEntry:
    entity: str
    hwm_date: datetime
    driver_table: str
    business_key: str
    is_processed: bool
    is_initialized: bool
    last_processed_date: datetime


class AuditControl:
    """Parquet-backed audit_control table (one row per entity)."""

    SCHEMA = (
        "entity string, hwm_date timestamp, driver_table string, "
        "business_key string, is_processed boolean, is_initialized boolean, "
        "last_processed_date timestamp"
    )

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def _read(self) -> DataFrame:
        if os.path.exists(self.path):
            return self.spark.read.schema(self.SCHEMA).parquet(self.path)
        return self.spark.createDataFrame([], self.SCHEMA)

    def initialize(self, entity: str, driver_table: str, business_key: str) -> None:
        """Idempotent insert-if-absent (reference: initialized_audit.sql)."""
        cur = self._read()
        if cur.filter(F.col("entity") == entity).limit(1).count() > 0:
            return
        row = [(entity, EPOCH_LOW, driver_table, business_key, False, True, EPOCH_LOW)]
        new = self.spark.createDataFrame(row, self.SCHEMA)
        self._overwrite(cur.unionByName(new))

    def get(self, entity: str) -> AuditEntry:
        rows = self._read().filter(F.col("entity") == entity).collect()
        if not rows:
            return AuditEntry(entity, EPOCH_LOW, "", "", False, False, EPOCH_LOW)
        r = rows[0]
        return AuditEntry(
            r.entity, r.hwm_date or EPOCH_LOW, r.driver_table, r.business_key,
            bool(r.is_processed), bool(r.is_initialized), r.last_processed_date or EPOCH_LOW,
        )

    def update(self, entity: str, hwm_date: datetime, processed_at: datetime | None = None) -> None:
        """Advance the watermark after a successful load (reference: updating_audit.sql)."""
        processed_at = processed_at or datetime.now()
        cur = self._read().collect()
        out = []
        for r in cur:
            if r.entity == entity:
                out.append((entity, hwm_date, r.driver_table, r.business_key, True, True, processed_at))
            else:
                out.append(tuple(r))
        self._overwrite(self.spark.createDataFrame(out, self.SCHEMA))

    def _overwrite(self, df: DataFrame) -> None:
        tmp = self.path + ".tmp"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        final = self.spark.read.schema(self.SCHEMA).parquet(tmp)
        final.coalesce(1).write.mode("overwrite").parquet(self.path)


def high_watermark_filter(df: DataFrame, ts_col: str, hwm: str | datetime) -> DataFrame:
    """Rows strictly after the watermark — a pushdown-able predicate."""
    return df.filter(F.col(ts_col) > F.lit(hwm))


def incremental_merge_by_key(
    existing: DataFrame, incoming: DataFrame, key_cols: list[str]
) -> DataFrame:
    """Upsert semantics of the reference's dbt incremental materialization
    (unique_key merge): incoming rows replace existing rows with the same
    business key. Expressed as anti-join + union (one shuffle each side).
    """
    return existing.join(incoming.select(*key_cols).distinct(), on=key_cols, how="left_anti").unionByName(incoming)


def processing_date_range(
    audit: "AuditControl", entity: str, target_date: datetime
) -> dict:
    """The reference's get_processing_date_range macro: derive the
    incremental window for an entity from its audit state
    (reference: macros/get_processing_date_range.sql).

    Returns start/end dates, the current HWM, and whether processing is
    needed — the driver loop feeds this straight into
    high_watermark_filter."""
    entry = audit.get(entity)
    start = entry.last_processed_date if entry.last_processed_date > EPOCH_LOW else target_date
    needs = start <= target_date
    return {
        "start_date": start,
        "end_date": target_date,
        "hwm_date": entry.hwm_date,
        "is_processed": entry.is_processed,
        "driver_table": entry.driver_table,
        "business_key": entry.business_key,
        "needs_processing": needs,
        "total_days": (target_date - start).days + 1 if needs else 0,
    }
