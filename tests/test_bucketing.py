"""Bucketed co-located join: correct results AND no shuffle in the plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_bucketed_join_has_no_exchange(spark):
    from northwind_warehouse_spark.catalog import load
    from northwind_warehouse_spark.sources.bucketing import bucketed_join, write_bucketed

    o = load(spark, SF_SMOKE, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    l = load(spark, SF_SMOKE, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity", "l_extendedprice"
    )
    write_bucketed(o, "b_orders", ["o_orderkey"], n_buckets=8)
    write_bucketed(l, "b_lineitem", ["o_orderkey"], n_buckets=8)

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        joined = bucketed_join(spark, "b_orders", "b_lineitem", ["o_orderkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join must not shuffle"

        want = o.join(l, "o_orderkey").count()
        assert joined.count() == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
