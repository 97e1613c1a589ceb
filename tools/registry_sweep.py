#!/usr/bin/env python3
"""One-shot full-registry timing sweep (round-13 survey tool).

Times EVERY registered query at $SPARK_GRAFT_SF_DIR with the bench's
checksum force (no projection pruning), one un-timed warmup + two timed
runs per query (min reported — ranking tool, not protocol numbers; the
protocol numbers live in bench.py). Writes REGISTRY_SWEEP.json sorted
slowest-first so optimization rounds can find heavy hitters OUTSIDE the
headline set without eyeballing 343 queries.

Each execution runs under a per-query wall-clock budget
($SWEEP_BUDGET_S, default 90s) enforced by a job-group cancellation
watchdog: a few registered queries are O(n^2)-by-design evaluation
queries (all-pairs ground truth, documented sample-scale-only) that the
driver never runs at sweep scale — without the budget one of them
pins the sweep forever. A budget hit records -2.0 (lower bound: "over
budget", ranked above everything finite). Partial results are flushed
to REGISTRY_SWEEP.partial.json after every query so a crash loses
nothing.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

BUDGET_S = float(os.environ.get("SWEEP_BUDGET_S", "90"))


class _Budget:
    """Cancel the given job group if the guarded block overruns."""

    def __init__(self, sc, group: str) -> None:
        self.sc = sc
        self.group = group
        self.hit = False

    def __enter__(self):
        def _cancel() -> None:
            self.hit = True
            self.sc.cancelJobGroup(self.group)

        self.timer = threading.Timer(BUDGET_S, _cancel)
        self.timer.daemon = True
        self.timer.start()
        return self

    def __exit__(self, *exc) -> bool:
        self.timer.cancel()
        return False


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entry
    from northwind_warehouse_spark.session import get_spark

    spark = get_spark("nws-registry-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    from pyspark.sql import functions as F

    def force(df):
        return df.select(
            F.bit_xor(F.xxhash64(*[F.col(c) for c in df.columns])).alias("cs")
        ).collect()[0].cs

    qs = entry.queries()
    out: dict[str, float] = {}
    partial = REPO / "REGISTRY_SWEEP.partial.json"
    for i, (name, fn) in enumerate(qs.items()):
        sc.setJobGroup(f"sweep-{i}", f"sweep: {name}")
        budget = _Budget(sc, f"sweep-{i}")
        try:
            with budget:
                force(fn(spark, sf_dir))  # warmup: codegen, footers, broadcasts
                runs = []
                for _ in range(2):
                    t0 = time.perf_counter()
                    force(fn(spark, sf_dir))
                    runs.append(time.perf_counter() - t0)
            out[name] = round(min(runs), 3)
        except Exception as exc:  # cancelled (budget) or real error: keep sweeping
            if budget.hit:
                out[name] = -2.0
                print(f"BUDGET {name}: > {BUDGET_S}s, cancelled", file=sys.stderr)
            else:
                out[name] = -1.0
                print(f"ERR {name}: {exc}", file=sys.stderr)
        partial.write_text(json.dumps(out, indent=1))
        if (i + 1) % 25 == 0:
            print(f"... {i + 1}/{len(qs)}", file=sys.stderr)
    ranked = dict(sorted(out.items(), key=lambda kv: -kv[1]))
    payload = {
        "sf_dir": sf_dir,
        "budget_s": BUDGET_S,
        "n": len(ranked),
        "total_s": round(sum(v for v in ranked.values() if v > 0), 1),
        "loadavg": [round(x, 2) for x in os.getloadavg()],
        "queries": ranked,
    }
    (REPO / "REGISTRY_SWEEP.json").write_text(json.dumps(payload, indent=1))
    partial.unlink(missing_ok=True)
    print(json.dumps({k: v for k, v in list(ranked.items())[:25]}, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
