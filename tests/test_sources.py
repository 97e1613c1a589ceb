"""Schema-enforced CSV/JSON ingestion round-trips."""

from __future__ import annotations


def test_csv_roundtrip(spark, tmp_path):
    from northwind_warehouse_spark.sources.lake import read_csv

    p = tmp_path / "in.csv"
    p.write_text("id,name,score\n1,alpha,1.5\n2,beta,2.25\n")
    df = read_csv(spark, str(p), "id bigint, name string, score double")
    rows = sorted((r.id, r.name, r.score) for r in df.collect())
    assert rows == [(1, "alpha", 1.5), (2, "beta", 2.25)]
    assert [f.dataType.simpleString() for f in df.schema] == ["bigint", "string", "double"]


def test_json_roundtrip(spark, tmp_path):
    from northwind_warehouse_spark.sources.lake import read_json

    p = tmp_path / "in.jsonl"
    p.write_text('{"id": 1, "tags": ["a", "b"]}\n{"id": 2, "tags": []}\n')
    df = read_json(spark, str(p), "id bigint, tags array<string>")
    rows = sorted((r.id, tuple(r.tags)) for r in df.collect())
    assert rows == [(1, ("a", "b")), (2, ())]


def test_write_partitioned_prunes(spark, tmp_path):
    """Partition filter must prune directories at the source level."""
    from northwind_warehouse_spark.catalog import load
    from northwind_warehouse_spark.sources.lake import read_table, write_table
    from pyspark.sql import functions as F

    from tests.conftest import SF_SMOKE

    o = load(spark, SF_SMOKE, "orders").withColumn("order_year", F.year("o_orderdate"))
    path = str(tmp_path / "orders_part")
    write_table(o, path, partition_by=("order_year",))
    back = read_table(spark, path).filter(F.col("order_year") == 1997)
    plan = back._sc._jvm.PythonSQLUtils.explainString(back._jdf.queryExecution(), "formatted")
    assert back.count() == o.filter(F.col("order_year") == 1997).count()
    assert "PartitionFilters: [isnotnull(order_year" in plan


def test_orc_roundtrip_partitioned(spark, tmp_path):
    from northwind_warehouse_spark.catalog import load
    from northwind_warehouse_spark.sources.lake import read_orc, write_orc
    from pyspark.sql import functions as F

    o = load(spark, "/root/testdata/sf0.001", "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    write_orc(o, str(tmp_path / "orders_orc"), partition_by=("order_year",))
    back = read_orc(spark, str(tmp_path / "orders_orc"))
    assert back.count() == o.count()
    want = {r.o_orderkey for r in o.select("o_orderkey").collect()}
    got = {r.o_orderkey for r in back.select("o_orderkey").collect()}
    assert got == want
