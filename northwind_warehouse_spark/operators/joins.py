"""Join-side helpers: the size-gated broadcast hint.

A hard ``F.broadcast`` hint OVERRIDES AQE's runtime size check — on a
bounded-cardinality relation (nation, region, dim_date, a one-row
aggregate) that is exactly what we want, but on an SF-growing dimension
(customer, part, supplier at warehouse scale) it turns into a multi-GB
driver broadcast or an executor OOM instead of AQE's sort-merge
fallback. ``maybe_broadcast`` keeps the hint *conditional on the
optimizer's own size estimate*, so the same plan code broadcasts at
demo scale and degrades gracefully to AQE's choice at 100 TB.

Reference parity note: the reference warehouse (dbt/Snowflake) leaves
join-strategy choice entirely to the engine (no hint machinery in any
model, e.g. models/dwh/fact_order.sql's SK lookups); this helper is the
Spark-side equivalent — advisory at small scale, engine-decided at
large scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Ceiling for an explicit broadcast hint, in optimizer-estimated bytes
# of the build side's optimized logical plan (for a parquet scan this is
# ~file bytes; projections shrink it proportionally). 64 MB estimated
# ≲ a few hundred MB of in-memory hash relation — safe for any sane
# executor. Above it, the hint is withheld and AQE decides from RUNTIME
# shuffle statistics (BHJ if the filtered side turned out small, SMJ
# otherwise), which is the only correct policy for a table that grows
# with the warehouse.
MAX_BROADCAST_BYTES = 64 << 20


def plan_size_bytes(df: DataFrame) -> int | None:
    """Optimizer size estimate of ``df``'s plan — driver-side only, no
    job. Returns None when the estimate is unavailable."""
    try:
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        return int(str(stats.sizeInBytes()))
    except Exception:
        return None


def maybe_broadcast(df: DataFrame, max_bytes: int | None = None) -> DataFrame:
    """Broadcast-hint ``df`` only while the optimizer's size estimate is
    under ``max_bytes`` (default: the module's MAX_BROADCAST_BYTES,
    read at CALL time so tests can force the gate closed); otherwise
    return it UNHINTED so AQE picks the join strategy from runtime
    sizes.

    Use this for every build side whose cardinality grows with the
    warehouse (customer/part/supplier and anything derived from the
    corpus tables). Keep plain ``F.broadcast`` for contracts that are
    bounded by construction: nation/region (fixed 25/5 rows), date
    spines, codebooks/LUTs, and single-row/threshold aggregates."""
    if max_bytes is None:
        max_bytes = MAX_BROADCAST_BYTES
    size = plan_size_bytes(df)
    if size is not None and size <= max_bytes:
        return F.broadcast(df)
    return df


# Conservative bytes-per-row for a dimension row (a bigint key, an
# md5-hex SK, a handful of short strings) when gating on a KNOWN row
# count instead of the optimizer's estimate. Deliberately fat: 256 B
# x the 64 MB ceiling still admits ~260k dim rows and declines any
# SF-grown dimension long before executor pressure.
DIM_ROW_BYTES = 256


def maybe_broadcast_rows(df: DataFrame, n_rows: int,
                         row_bytes: int = DIM_ROW_BYTES,
                         max_bytes: int | None = None) -> DataFrame:
    """Broadcast-hint ``df`` gated on a CALLER-KNOWN row count — parquet
    footer metadata (catalog.table_rows) or a policy parameter — times a
    conservative per-row byte estimate.

    Use for ROW-PRESERVING dim builds (base table left-joined to
    bounded lookups, unioned with fixed dummy members): Spark's
    non-CBO stats visitor estimates a join's size as the PRODUCT of its
    children's sizes, so a 1,000-row supplier dim that touches
    nation+region estimates at ~38 GB and ``maybe_broadcast`` silently
    declines — measured r13: every fact-to-dim join in the repo was
    degrading to SortMergeJoin with a full fact-side shuffle+sort. The
    caller's row count is the true cardinality (footer counts are exact
    and cached), so the gate scales honestly: at warehouse SF the same
    call sees tens of millions of rows and withholds the hint.

    Same discipline as CLAUDE.md's parameter-derived codebook gate: when
    the build side's size is KNOWN from outside the optimizer, gate on
    that knowledge — the optimizer cannot estimate it."""
    if max_bytes is None:
        max_bytes = MAX_BROADCAST_BYTES
    if n_rows * row_bytes <= max_bytes:
        return F.broadcast(df)
    return df
