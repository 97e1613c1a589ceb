"""Deduplication operators (exact + latest-by-key; near-dup lives in
``operators/similarity.py`` helpers built on these).

``latest_by_key`` re-expresses the reference's snapshot/dedup pattern
(``row_number() over (partition by key order by change_ts desc) = 1``,
reference: snapshots/snapshot_employee.sql, models/intermediate/stg_dim_employee.sql).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def latest_by_key(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[Column],
) -> DataFrame:
    """Keep the first row per key under ``order_cols`` (one shuffle)."""
    w = Window.partitionBy(*[F.col(k) for k in key_cols]).orderBy(*order_cols)
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def exact_dedup(
    df: DataFrame,
    fingerprint: Column,
    keep_order: Sequence[Column],
    fingerprint_name: str = "fingerprint",
) -> DataFrame:
    """Exact dedup on a fingerprint expression: groupBy-style via window,
    keeping the deterministic representative under ``keep_order``."""
    with_fp = df.withColumn(fingerprint_name, fingerprint)
    return latest_by_key(with_fp, [fingerprint_name], keep_order)
