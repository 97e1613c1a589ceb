"""Skew mitigation for hot join keys.

At 100 TB a handful of hot keys (celebrity users, default ids) can pin a
single reducer. ``salted_join`` spreads each hot left row across
``n_salts`` sub-keys and replicates the (small) right side once per
salt — turning one straggler partition into ``n_salts`` even ones.

AQE's skew-join handles sort-merge skew automatically; explicit salting
remains necessary for skewed *aggregations* and for joins AQE can't
split (e.g. bucketed inputs). The salt is derived deterministically from
a uniqueness column (no randomness → reproducible plans).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_src: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``key`` with the left side salted by hash(salt_src).

    Result is identical to ``left.join(right, key, how)`` (verified in
    tests); only the partitioning of the work changes.
    """
    salted_left = left.withColumn("_salt", F.pmod(F.xxhash64(F.col(salt_src)), F.lit(n_salts)))
    salts = left.sparkSession.range(n_salts).select(F.col("id").cast("int").alias("_salt"))
    salted_right = right.crossJoin(F.broadcast(salts))
    return salted_left.join(salted_right, [key, "_salt"], how).drop("_salt")


def salted_count_by_key(df: DataFrame, key: str, salt_src: str, n_salts: int = 8) -> DataFrame:
    """Two-phase (partial → final) count for skewed keys: the first
    aggregation runs on (key, salt) so no single reducer sees a hot key's
    full volume; the second combines ≤ n_salts rows per key."""
    partial = (
        df.withColumn("_salt", F.pmod(F.xxhash64(F.col(salt_src)), F.lit(n_salts)))
        .groupBy(key, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
    )
    return partial.groupBy(key).agg(F.sum("_partial").cast("bigint").alias("n"))
