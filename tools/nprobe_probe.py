#!/usr/bin/env python3
"""Measure the stored-index probe knobs (round-9 verdict #6): candidate
recall@5 and candidate-set cost of P ∈ {1, 2, 4} probes at the
occupancy-scaled k, for BOTH query-probe routes — flat (top-P over all
k trained centroids: 10·k dots for the bounded query batch, FAISS's
nprobe selection) and two_level (within the routed super: route-
consistent with the index build) — per SF. The rounds_probe.py
pattern: measure the knob, adopt the measured default, record the
JSON. Round-10 decision: FLAT + P=4 (flat buys +12-22 pp recall at
P=4; within-super probing constrains a boundary query to one super's
children).

Recall is CANDIDATE recall (cell membership of the brute-force top-5 —
the IVF decomposition: ADC ranking quality inside a probed cell is
graded separately by ann_pq_recall), measured on exactly the assignment
the stored index persists (ivf_train_codebook ∘ ivf_assign_two_level at
k = max(8, n/128)); cost is the total candidate rows the 10-query batch
ADC-scans, i.e. the per-query work the P knob buys recall with.

Usage: python tools/nprobe_probe.py [sf_dir ...]   (default sf0.01 sf0.1)
Prints one JSON object; the adopted default lives in
plans/llm._IDX_NPROBE and the publish floor in _IVFPQ_MIN_RECALL_PPM.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def measure(spark, sf_dir: str, probes=(1, 2, 4)) -> dict:
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    import northwind_warehouse_spark.operators.similarity as sim
    from northwind_warehouse_spark.catalog import load
    from northwind_warehouse_spark.functions.vectors import (
        cosine_from_parts, dot_q, norm2_q,
    )
    from northwind_warehouse_spark.operators.joins import maybe_broadcast
    from northwind_warehouse_spark.plans.llm import _ivfpq_params, _trained_cb

    e = load(spark, sf_dir, "embeddings")
    k, _ = _ivfpq_params(sf_dir)
    cb = _trained_cb(spark, sf_dir, k)
    assigned = sim.ivf_assign_two_level(e, n_centroids=k, centroids=cb).persist()

    base = e.select("vec_id", "embedding", norm2_q("embedding").alias("n2"))
    tq = base.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec"),
        F.col("n2").alias("qn2"),
    )
    wt = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("vec_id"))
    truth = (
        base.join(maybe_broadcast(tq), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "vec_id",
            dot_q("qvec", "embedding").alias("dot"),
            F.col("qn2").alias("n2a"), F.col("n2").alias("n2b"),
        )
        .withColumn("cosine", cosine_from_parts("dot", "n2a", "n2b"))
        .withColumn("rk", F.row_number().over(wt))
        .filter(F.col("rk") <= 5)
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .persist()
    )
    n_true = truth.count()
    pmax = max(probes)
    qb = e.filter(F.col("vec_id") < 10)
    routes = {
        "flat": sim.ivf_probe_cells(qb, n_centroids=k, n_probe=pmax, centroids=cb),
        "two_level": sim.ivf_probe_cells_two_level(qb, k, cb, n_probe=pmax),
    }
    out = {"k": k, "n_true": n_true, "routes": {}}
    for route, qp0 in routes.items():
        qp = qp0.select(
            F.col("vec_id").alias("query_id"), "probe_rank",
            F.col("cell_id").alias("qcell"),
        ).persist()
        by_p = {}
        for p in probes:
            cand = (
                assigned.join(
                    maybe_broadcast(qp.filter(F.col("probe_rank") <= p)),
                    (F.col("cell_id") == F.col("qcell"))
                    & (F.col("vec_id") != F.col("query_id")),
                )
                .select("query_id", F.col("vec_id").alias("neighbor_id"))
                .distinct()
                .persist()
            )
            n_cand = cand.count()
            hits = truth.join(cand, ["query_id", "neighbor_id"], "left_semi").count()
            cand.unpersist()
            by_p[str(p)] = {
                "recall_ppm": hits * 1_000_000 // n_true,
                "hits": hits,
                "candidate_rows": n_cand,
            }
        qp.unpersist()
        out["routes"][route] = by_p
    assigned.unpersist()
    truth.unpersist()
    return out


def main() -> None:
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    from northwind_warehouse_spark.session import get_spark

    spark = get_spark("nws-nprobe")
    spark.sparkContext.setLogLevel("ERROR")
    result = {sf.rstrip("/").rsplit("/", 1)[-1]: measure(spark, sf) for sf in sf_dirs}
    print(json.dumps(result, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
