"""Local mirror of the driver's t2 gate: Spark result vs DuckDB oracle.

Compares row count, column names, and order-insensitive values with
columns sorted by name — the same contract described in
``__spark_entry__.py``.
"""

from __future__ import annotations

import datetime as _dt
import math

import duckdb

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def duckdb_run(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # exact bit-level comparison — the driver hashes doubles exactly,
        # so any formatting slack here would pass locally yet fail the gate
        return repr(v)
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _duck_type_class(t: str):
    """Collapse a DuckDB DESCRIBE type to the equivalence class the
    driver's typed hash distinguishes.  Int widths are provably
    tolerated (r4 gate: Spark INT vs DuckDB BIGINT passed on
    scd6_users/ann_pq_topk/...), but HUGEINT — DuckDB's silent
    sum(BIGINT) widening — is not, and was the round-4 gate fail."""
    t = t.strip().upper()
    if t.endswith("[]"):
        return ("list", _duck_type_class(t[:-2]))
    if t in ("TINYINT", "SMALLINT", "INTEGER", "INT", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER"):
        return "int"
    if t in ("HUGEINT", "UHUGEINT", "UBIGINT"):
        return "hugeint"
    if t in ("FLOAT", "REAL"):
        return "float"
    if t == "DOUBLE":
        return "double"
    if t.startswith("DECIMAL"):
        inner = t[t.index("(") + 1:t.index(")")].split(",")
        return ("decimal", int(inner[1]) if len(inner) > 1 else 0)
    if t == "VARCHAR":
        return "str"
    if t == "DATE":
        return "date"
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    if t == "BOOLEAN":
        return "bool"
    if t == "BLOB":
        return "binary"
    return t


def _spark_type_class(t):
    from pyspark.sql import types as T

    if isinstance(t, T.ArrayType):
        return ("list", _spark_type_class(t.elementType))
    if isinstance(t, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(t, T.FloatType):
        return "float"
    if isinstance(t, T.DoubleType):
        return "double"
    if isinstance(t, T.DecimalType):
        return ("decimal", t.scale)
    if isinstance(t, T.StringType):
        return "str"
    if isinstance(t, T.DateType):
        return "date"
    if isinstance(t, (T.TimestampType, T.TimestampNTZType)):
        return "timestamp"
    if isinstance(t, T.BooleanType):
        return "bool"
    if isinstance(t, T.BinaryType):
        return "binary"
    return t.simpleString()


def type_parity(spark_df, sql: str, sf_dir: str) -> list[str]:
    """Column-type parity between the Spark plan and the DuckDB oracle.

    The driver's value hash is TYPE-SENSITIVE while the value compare
    below collects Python objects and is type-blind — int128 == int64
    locally but hash-mismatches at the gate (round-4 lesson:
    revenue_share_of_parent).  DESCRIBE plans without executing, so
    this is cheap enough to run on every compare."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    duck = {r[0]: _duck_type_class(r[1]) for r in rows}
    problems: list[str] = []
    for f in spark_df.schema.fields:
        if f.name not in duck:
            continue  # name parity is compare()'s job
        sc, dc = _spark_type_class(f.dataType), duck[f.name]
        if sc != dc:
            problems.append(
                f"type mismatch on '{f.name}': spark={sc} duckdb={dc}"
            )
    return problems


def compare(spark_df, sql: str, sf_dir: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    problems: list[str] = list(type_parity(spark_df, sql, sf_dir))
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_cols, d_rows = duckdb_run(sql, sf_dir)

    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
        return problems
    if len(s_rows) != len(d_rows):
        problems.append(f"row counts differ: spark={len(s_rows)} duckdb={len(d_rows)}")

    order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
    d_order = {c: i for i, c in enumerate(d_cols)}
    d_perm = [d_order[s_cols[i]] for i in order]

    s_set = sorted((tuple(_norm(r[i]) for i in order) for r in s_rows), key=repr)
    d_set = sorted((tuple(_norm(r[i]) for i in d_perm) for r in d_rows), key=repr)
    if s_set != d_set:
        diff_s = [r for r in s_set if r not in set(d_set)][:3]
        diff_d = [r for r in d_set if r not in set(s_set)][:3]
        problems.append(f"values differ; spark-only={diff_s} duckdb-only={diff_d}")
    return problems
