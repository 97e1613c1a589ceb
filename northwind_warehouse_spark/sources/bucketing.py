"""Bucketed managed tables — co-located joins with zero shuffle.

At 100 TB the dominant cost of fact⋈fact joins is the shuffle. Writing
both sides bucketed (and sorted) on the join key lets Spark's
sort-merge join consume the buckets directly: no Exchange on either
side, verified by the plan test in tests/test_bucketing.py.

This is the Spark-native analog of the reference warehouse's clustered
tables; pair it with partition columns for time pruning.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
    partition_cols: Sequence[str] | None = None,
) -> None:
    """``path`` makes the table EXTERNAL (data at an explicit location,
    e.g. a lake prefix outside the session warehouse dir) while keeping
    the bucketing metadata in the catalog — reads still consume the
    buckets shuffle-free. ``partition_cols`` adds hive-style partition
    directories ABOVE the bucket files (each partition carries its own
    bucket file set; the bucket distribution stays table-wide, so
    bucket-keyed joins/aggregates remain shuffle-free across
    partitions while filters on the partition column prune at the
    directory level)."""
    writer = df.write.mode(mode)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer = writer.bucketBy(n_buckets, *bucket_cols)
    writer = writer.sortBy(*(sort_cols or bucket_cols))
    if path is not None:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: Sequence[str], how: str = "inner"
) -> DataFrame:
    return spark.table(left_table).join(spark.table(right_table), list(on), how)
