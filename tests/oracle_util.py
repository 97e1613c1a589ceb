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


def compare(spark_df, sql: str, sf_dir: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    problems: list[str] = []
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
