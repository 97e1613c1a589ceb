"""Portable hash-key helpers.

Re-expresses ``dbt_utils.generate_surrogate_key`` (used throughout the
reference staging models, e.g. reference: models/staging/stg_customers.sql:19-30)
with semantics chosen to be byte-identical between Spark SQL and DuckDB so
the driver's oracle comparison can hash the keys:

    md5(concat_ws('||', coalesce(cast(col as string), '^^')...))

Two portability rules (see SURVEY.md §3):
- only md5 (hex text, identical across engines), never engine ``hash()``;
- floating-point columns must be wrapped with :func:`num_str` (fixed
  DECIMAL(18,6) rendering) before hashing — raw double→string formatting
  differs between engines.

Everything here is a Catalyst expression — no UDFs, stays inside
WholeStageCodegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

NULL_TOKEN = "^^"
SEP = "||"


def _as_str(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c.cast("string"), F.lit(NULL_TOKEN))


def num_str(col: Column | str) -> Column:
    """Render a numeric column as a fixed-format DECIMAL(18,6) string.

    ``CAST(1.5 AS DECIMAL(18,6))::string`` is '1.500000' in both Spark and
    DuckDB, making float-bearing hashes portable.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(18,6)").cast("string")


def surrogate_key(*cols: Column | str) -> Column:
    """md5 surrogate key over the given columns (order matters)."""
    return F.md5(F.concat_ws(SEP, *[_as_str(c) for c in cols]))


def row_hash(*cols: Column | str) -> Column:
    """Alias of :func:`surrogate_key` for change-detection hashes."""
    return surrogate_key(*cols)


def oracle_surrogate_key(*cols: str) -> str:
    """The DuckDB-SQL rendering of :func:`surrogate_key` for oracles.

    ``cols`` are raw SQL expressions; numeric ones should already be
    wrapped via :func:`oracle_num_str`.
    """
    parts = ", ".join(f"coalesce(cast({c} as varchar), '{NULL_TOKEN}')" for c in cols)
    return f"md5(concat_ws('{SEP}', {parts}))"


def oracle_num_str(expr: str) -> str:
    return f"cast(cast({expr} as decimal(18,6)) as varchar)"
