"""Gap-based event sessionization.

Batch variant: lag + cumulative-sum over one ``partitionBy(user)
orderBy(ts)`` window — a single shuffle regardless of history length.
(The streaming variant lives in streaming/jobs.py with
``applyInPandasWithState``.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int,
    tiebreak_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Assign ``session_idx`` (1-based per key) using a max-gap rule."""
    order = [F.col(ts_col)] + [F.col(c) for c in tiebreak_cols]
    w = Window.partitionBy(key_col).orderBy(*order)
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    is_new = F.when(
        prev_ts.isNull()
        | ((F.unix_micros(F.col(ts_col)) - F.unix_micros(prev_ts)) > gap_seconds * 1_000_000),
        1,
    ).otherwise(0)
    return df.withColumn("_is_new", is_new).withColumn(
        "session_idx", F.sum("_is_new").over(w_run).cast("bigint")
    ).drop("_is_new")
