#!/usr/bin/env python3
"""Measured knob: does a SECOND Lloyd round on the serving coarse
codebook move the serving-quality gates? (round-8 verdict #7)

For rounds ∈ {1, 2} this probe trains ivf_train_codebook on the same
deterministic sample and reports, per scale factor:

- mean assigned-centroid cosine over the full corpus (the honest
  quality metric — Lloyd optimizes distortion, not band tightness;
  reported in ppm of the rounds=1 value),
- candidate-set recall@5 of the 10-query batch, single-probe and
  P=2-probe (the ann_ivfpq_from_index_recall gate's shape, computed
  against brute-force cosine truth).

Adopt rounds=2 as the serving default ONLY if these gates move — a
measured knob, not a blind bump. Run on a quiet box; prints one JSON
line per SF.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from northwind_warehouse_spark.catalog import load  # noqa: E402
from northwind_warehouse_spark.operators import similarity as sim  # noqa: E402
from northwind_warehouse_spark.session import get_spark  # noqa: E402


def probe(spark, sf_dir: str, n_centroids: int, rounds: int) -> dict:
    from pyspark.sql.window import Window

    from northwind_warehouse_spark.functions.vectors import (
        cosine_from_parts, dot_q, norm2_q,
    )

    e = load(spark, sf_dir, "embeddings")
    cb = sim.ivf_train_codebook(e, n_centroids=n_centroids, rounds=rounds)

    assigned = sim.ivf_assign_two_level(e, n_centroids=n_centroids, centroids=cb)
    cbx = cb.select(
        F.col("cent_id").alias("cell_id"),
        F.col("cqvec"),
        F.col("cn2"),
    )
    mean_cos = (
        assigned.join(F.broadcast(cbx), "cell_id")
        .select(
            (
                F.expr(
                    sim.IDOT.format(a=sim.QUANT.format(v="embedding"), b="cqvec")
                ).cast("double")
                / F.sqrt(F.col("n2").cast("double") * F.col("cn2").cast("double"))
            ).alias("cos")
        )
        .agg(F.avg("cos").alias("m"))
        .collect()[0]
        .m
    )

    # candidate-set recall@5, single vs P=2 probes (flat-assign cells —
    # the stored-index serving family)
    flat = sim.ivf_assign(e, n_centroids=n_centroids, centroids=cb)
    qp = sim.ivf_probe_cells(
        e.filter(F.col("vec_id") < 10), n_centroids=n_centroids,
        n_probe=2, centroids=cb,
    ).select(
        F.col("vec_id").alias("query_id"), "probe_rank",
        F.col("cell_id").alias("qcell"),
    )
    pairs = flat.join(
        F.broadcast(qp),
        (F.col("cell_id") == F.col("qcell")) & (F.col("vec_id") != F.col("query_id")),
    ).select("query_id", F.col("vec_id").alias("neighbor_id"), "probe_rank").persist()

    base = e.select("vec_id", "embedding", norm2_q("embedding").alias("n2"))
    tq = base.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec"),
        F.col("n2").alias("qn2"),
    )
    tscored = base.join(F.broadcast(tq), F.col("vec_id") != F.col("query_id")).select(
        "query_id", F.col("vec_id").alias("neighbor_id"),
        dot_q("qvec", "embedding").alias("dot"),
        F.col("qn2").alias("n2a"), F.col("n2").alias("n2b"),
    ).withColumn("cosine", cosine_from_parts("dot", "n2a", "n2b"))
    wt = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("neighbor_id"))
    truth = (
        tscored.withColumn("rk", F.row_number().over(wt))
        .filter(F.col("rk") <= 5).select("query_id", "neighbor_id").persist()
    )
    n_true = truth.count()
    hits_s = truth.join(
        pairs.filter(F.col("probe_rank") == 1).select("query_id", "neighbor_id"),
        ["query_id", "neighbor_id"], "left_semi",
    ).count()
    hits_m = truth.join(
        pairs.select("query_id", "neighbor_id").distinct(),
        ["query_id", "neighbor_id"], "left_semi",
    ).count()
    pairs.unpersist(); truth.unpersist(); cb.unpersist()
    return {
        "rounds": rounds,
        "mean_assigned_cos": round(mean_cos, 6),
        "recall_single": f"{hits_s}/{n_true}",
        "recall_multi": f"{hits_m}/{n_true}",
    }


def main() -> None:
    spark = get_spark("nws-rounds-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for sf_dir in sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]:
        out = {"sf_dir": sf_dir, "n_centroids": 8, "probes": []}
        for rounds in (1, 2):
            out["probes"].append(probe(spark, sf_dir, 8, rounds))
        r1, r2 = out["probes"]
        out["cos_delta_ppm"] = round(
            (r2["mean_assigned_cos"] / r1["mean_assigned_cos"] - 1) * 1e6
        )
        print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
