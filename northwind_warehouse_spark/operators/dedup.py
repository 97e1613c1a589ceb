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


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    k: int,
    salt_buckets: int = 32,
) -> DataFrame:
    """Exact smallest-k rows per group, two-phase (salted partial top-k,
    then final top-k over ≤ salt_buckets·k survivors per group).

    A plain `row_number() over (partition by group)` funnels each
    group's ENTIRE row set through one task — with few large groups
    (e.g. 20 sources over a 100 TB corpus) that is a single-reducer
    bottleneck. Phase 1 splits each group across `salt_buckets` tasks
    and keeps only k rows per (group, salt); phase 2's window then sees
    at most salt_buckets·k rows per group. The salt hash never affects
    the result — any partitioning of the rows yields the same final
    top-k, so the engine-specific xxhash64 stays out of the output.
    ``order_col`` must be a total order (unique) for determinism."""
    from pyspark.sql.window import Window

    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(order_col)), F.lit(salt_buckets))
    )
    w1 = Window.partitionBy(*group_cols, "_salt").orderBy(order_col)
    part = (
        salted.withColumn("_rk", F.row_number().over(w1))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )
    w2 = Window.partitionBy(*group_cols).orderBy(order_col)
    return (
        part.withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= k)
        .drop("_salt")
    )
