#!/usr/bin/env python3
"""One-shot full-registry timing sweep (round-13 survey tool).

Times EVERY registered query at $SPARK_GRAFT_SF_DIR with the bench's
checksum force (no projection pruning), one un-timed warmup + two timed
runs per query (min reported — ranking tool, not protocol numbers; the
protocol numbers live in bench.py). Writes REGISTRY_SWEEP.json sorted
slowest-first so optimization rounds can find heavy hitters OUTSIDE the
headline set without eyeballing 343 queries.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entry
    from northwind_warehouse_spark.session import get_spark

    spark = get_spark("nws-registry-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    def force(df):
        return df.select(
            F.bit_xor(F.xxhash64(*[F.col(c) for c in df.columns])).alias("cs")
        ).collect()[0].cs

    qs = entry.queries()
    out: dict[str, float] = {}
    for i, (name, fn) in enumerate(qs.items()):
        spark.sparkContext.setJobDescription(f"sweep: {name}")
        try:
            force(fn(spark, sf_dir))  # warmup: codegen, footers, broadcasts
            runs = []
            for _ in range(2):
                t0 = time.perf_counter()
                force(fn(spark, sf_dir))
                runs.append(time.perf_counter() - t0)
            out[name] = round(min(runs), 3)
        except Exception as exc:  # record, keep sweeping
            out[name] = -1.0
            print(f"ERR {name}: {exc}", file=sys.stderr)
        if (i + 1) % 25 == 0:
            print(f"... {i + 1}/{len(qs)}", file=sys.stderr)
    ranked = dict(sorted(out.items(), key=lambda kv: -kv[1]))
    payload = {
        "sf_dir": sf_dir,
        "n": len(ranked),
        "total_s": round(sum(v for v in ranked.values() if v > 0), 1),
        "loadavg": [round(x, 2) for x in os.getloadavg()],
        "queries": ranked,
    }
    (REPO / "REGISTRY_SWEEP.json").write_text(json.dumps(payload, indent=1))
    print(json.dumps({k: v for k, v in list(ranked.items())[:25]}, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
