"""northwind_warehouse_spark — a PySpark-native analytics engine.

Re-expresses the capabilities of the dbt/Snowflake reference warehouse
(azabenathi/northwind_warehouse) as idiomatic Spark DataFrame pipelines:
medallion staging → SCD2 dimensions → temporal-SK facts, plus
LLM-training-data operators (dedup, similarity search, text analysis,
multimodal columns).

Public surface:

- ``get_spark()`` — tuned SparkSession factory (AQE, Arrow, shuffle
  partitions).
- ``catalog.load(spark, sf_dir, table)`` — conformed raw-table loaders.
- ``catalog.register_views(spark, sf_dir)`` — SQL-first access: every
  raw table as a temp view for plain ``spark.sql`` queries.
- ``plans.medallion / plans.analytics / plans.llm`` — the SURVEY §2
  query library (every function takes ``(spark, sf_dir)``).
- ``operators.*`` — reusable transforms (scd2, dedup, asof, skew,
  similarity, sessionize, incremental, expectations, multimodal).
- ``sources.*`` — lake IO (partitioned/bucketed/versioned writers,
  compaction, clustering, schema evolution, compliance deletes).
- ``streaming.jobs`` — structured-streaming variants.
"""

from northwind_warehouse_spark.catalog import load, register_views
from northwind_warehouse_spark.session import get_spark

__all__ = ["get_spark", "load", "register_views"]
