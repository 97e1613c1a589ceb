#!/usr/bin/env python3
"""Measure the gate-CLOSED two-level IVF assignment (round-7 verdict #2).

When the parameter-derived broadcast gate declines the children side,
ivf_assign_two_level's level-2 join shuffles the corpus on super_id — a
key with only √k distinct values (≈13 at the 10× smoke's k=157), so an
UNSALTED exchange can keep at most √k reducers busy regardless of
cluster width. Round 8 salts the closed branch (_L2_SALT=8 → √k·8
reduce keys). This probe forces the gate closed (MAX_BROADCAST_BYTES=0)
over the scale-smoke embeddings and A/B-times the assignment with the
salt ON (shipped shape) vs OFF (_L2_SALT=1, the r7 shape) — min-of-2
per cell, the least-noise estimate of a deterministic workload. The
wall delta IS the skew cost: the two runs differ only in reduce-key
cardinality, never in the row multiset (asserted by count equality).

Results are recorded as the closed-gate note in SCALING.md.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> None:
    from northwind_warehouse_spark.session import get_spark
    import northwind_warehouse_spark.operators.joins as J
    import northwind_warehouse_spark.operators.similarity as sim
    from tools.scale_smoke import build_scaled

    spark = get_spark("closed-gate-probe")
    spark.sparkContext.setLogLevel("ERROR")

    prev_bytes = J.MAX_BROADCAST_BYTES
    prev_salt = sim._L2_SALT
    J.MAX_BROADCAST_BYTES = 0  # force the closed branch everywhere below
    try:
        for factor in (10, 30):
            sf_dir = build_scaled(spark, factor)
            e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            n = e.count()
            k = max(8, (n + 127) // 128)
            counts = {}
            for salt in (1, 8):
                sim._L2_SALT = salt
                df = sim.ivf_assign_two_level(e, n_centroids=k)
                df.count()  # warm (footers, codegen)
                best = None
                for _ in range(2):
                    t0 = time.perf_counter()
                    counts[salt] = df.count()
                    t = round(time.perf_counter() - t0, 2)
                    best = t if best is None else min(best, t)
                print(
                    f"factor={factor} n={n} k={k} sqrt_k={sim.ceil_isqrt(k)} "
                    f"salt={salt}: {best}s"
                )
            assert len(set(counts.values())) == 1, counts  # multiset-identical
    finally:
        J.MAX_BROADCAST_BYTES = prev_bytes
        sim._L2_SALT = prev_salt
    spark.stop()


if __name__ == "__main__":
    main()
