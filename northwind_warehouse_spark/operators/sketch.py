"""KMV (bottom-k) distinct sketches — portable, mergeable, exact below k.

The sketch for a group is the set of its k smallest 32-bit md5 hashes;
the estimator is ``(k-1) * 2^32 div h_(k)`` — pure integer arithmetic,
so (unlike HLL register estimates) results are deterministic and
byte-identical between Spark and the DuckDB oracle. Below k distinct
hashes the sketch holds the whole distinct set and the count is exact.

Mergeability is the scale property (same as production theta/KMV
sketches): union two groups' kept-hash sets, re-take the bottom k, and
you have exactly the sketch of the union — no rescan. That is what
``sketch_distinct_rollup`` (merge across groups) and
``streaming/jobs.py::kmv_distinct_stream`` (merge across micro-batches)
both lean on; at 1000 executors each ships ≤k hashes per group.

Re-expresses the approximate-distinct capability a warehouse ANALYZE /
NDV estimate needs (reference: warehouse column stats), hash-portable
per SURVEY.md §3.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_K = 1024  # relative error ~ 1/sqrt(k-1) ≈ 3.1%


def hash32(col: Column | str) -> Column:
    """Portable 32-bit hash: first 8 md5 hex digits as a BIGINT."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("long")


def kmv_hashes(df: DataFrame, key_col: str, group_cols: list[str]) -> DataFrame:
    """Distinct (group, h) pairs — the map-side input to any KMV fold."""
    return df.select(*group_cols, hash32(key_col).alias("h")).distinct()


def kmv_bottom_k(hashes: DataFrame, group_cols: list[str], k: int = DEFAULT_K) -> DataFrame:
    """Keep each group's k smallest distinct hashes (the sketch state).

    Idempotent and associative over unions of hash sets, which is what
    makes the sketch mergeable across groups and micro-batches."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        hashes.distinct()
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def kmv_estimate(kept: DataFrame, group_cols: list[str], k: int = DEFAULT_K) -> DataFrame:
    """Per-group distinct estimate from a bottom-k state table."""
    return (
        kept.groupBy(*group_cols)
        .agg(F.count(F.lit(1)).alias("_n"), F.max("h").alias("_hk"))
        .select(
            *group_cols,
            F.when(F.col("_n") < k, F.col("_n"))
            .otherwise(F.expr(f"({k} - 1) * 4294967296 div _hk"))
            .cast("bigint")
            .alias("approx_distinct"),
        )
    )
