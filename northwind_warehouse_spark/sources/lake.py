"""Lake storage: readers and partitioned writers.

The reference materializes every model as a Snowflake table
(reference: dbt_project.yml `+materialized: table`); the Spark-first
equivalent is parquet (or any columnar lake format) with explicit
partition columns so downstream scans prune:

- facts partition by a date-derived column (order_year) → time-range
  queries touch only matching directories at 100 TB;
- dims stay unpartitioned single-digit-GB tables that broadcast.

Writers go through a staging-temp + atomic-ish rename-free overwrite
(Spark's own committer); readers re-apply schemas so drift is caught at
the boundary, mirroring dbt's `on_schema_change: sync_all_columns`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_table(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_csv(spark: SparkSession, path: str, schema: str, header: bool = True) -> DataFrame:
    """Schema-enforced CSV ingestion (no inference jobs at scale)."""
    return spark.read.schema(schema).option("header", str(header).lower()).csv(path)


def read_json(spark: SparkSession, path: str, schema: str) -> DataFrame:
    return spark.read.schema(schema).json(path)


def write_csv(df: DataFrame, path: str, header: bool = True, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    """ORC interchange (Hive-ecosystem consumers); same partition-pruning
    contract as the parquet writer."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)
