"""northwind_warehouse_spark — a PySpark-native analytics engine.

Re-expresses the capabilities of the dbt/Snowflake reference warehouse
(azabenathi/northwind_warehouse) as idiomatic Spark DataFrame pipelines:
medallion staging → SCD2 dimensions → temporal-SK facts, plus
LLM-training-data operators (dedup, similarity search, text analysis,
multimodal columns).
"""

from northwind_warehouse_spark.session import get_spark

__all__ = ["get_spark"]
