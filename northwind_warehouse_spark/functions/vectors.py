"""Vector math over ``array<float>`` columns — exact-decimal, JVM-side.

Float summation is order-sensitive, so cross-engine comparison of double
dot products is flaky. Instead each element is cast to DECIMAL(18,9)
(exact, deterministic per float value) and summed in decimal — both
engines produce the identical exact sum, after which sqrt/divide on the
resulting doubles are IEEE-deterministic.

All higher-order functions (zip_with / aggregate) — no UDFs, no
serialization off the JVM.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,9)"
# bounded accumulator types keep Spark's decimal-addition rule exact
# (at the 38-digit cap Spark silently drops a scale digit); |element| < 1e3
# and ≤ 4096 dims keep every intermediate well inside these bounds.
PROD = "decimal(24,18)"
ACC = "decimal(28,18)"


def dot_dec(a: str, b: str) -> Column:
    """Exact decimal dot product of two array<float> columns."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(CAST(x AS {DEC}) * CAST(y AS {DEC}) AS {PROD})), "
        f"CAST(0 AS {ACC}), (acc, v) -> CAST(acc + v AS {ACC}))"
    )


def norm2_dec(a: str) -> Column:
    """Exact decimal squared L2 norm."""
    return dot_dec(a, a)


def cosine_from_parts(dot_col: str, n2a_col: str, n2b_col: str) -> Column:
    """cosine = dot / sqrt(n2a * n2b), evaluated on exact-decimal inputs
    cast to double (bit-identical across engines)."""
    return F.col(dot_col).cast("double") / F.sqrt(
        F.col(n2a_col).cast("double") * F.col(n2b_col).cast("double")
    )
