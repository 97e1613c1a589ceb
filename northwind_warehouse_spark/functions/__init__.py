from northwind_warehouse_spark.functions.hashing import row_hash, surrogate_key

__all__ = ["row_hash", "surrogate_key"]
