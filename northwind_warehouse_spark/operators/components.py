"""Connected components over an edge list — iterative min-label propagation.

The dedup-cluster resolution step of a near-dup pipeline: LSH/Jaccard
candidate PAIRS must become duplicate GROUPS before one canonical doc
per group can be kept (pairs alone under-delete transitive dups:
a~b, b~c must collapse {a,b,c} even when a,c never paired).

Spark-first design: Pregel-style label propagation expressed as
DataFrame joins — each iteration is one shuffle keyed on node id, and
the only driver-side value is the scalar convergence count (no
``.collect()`` of data rows). Converges in O(component diameter)
iterations; near-dup components are tiny dense cliques in practice, so
the loop exits after 2-3 rounds. (At extreme diameters you'd switch to
the large-star/small-star algorithm — same join primitives, O(log n)
rounds.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 25
) -> DataFrame:
    """Return (node, component) where component = min node id reachable.

    ``edges`` is treated as undirected; nodes appearing only in ``dst``
    are included. Deterministic: min-label is order-independent.
    """
    # localCheckpoint (not just persist): each iteration's plan must start
    # from materialized data, otherwise the lineage DAG doubles per round
    # and analysis cost explodes long before the data does. On a real
    # cluster you'd set a checkpoint dir and use checkpoint() for
    # executor-loss resilience; the algorithm is identical.
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        sym.select(F.col("u").alias("node")).distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint()
    )
    # Min-label propagation is monotone — comp values only ever decrease —
    # so sum(comp) is a strictly-decreasing convergence witness: one cheap
    # aggregate per round replaces a join-and-count against the previous
    # labels (halves the per-iteration work).
    prev_sum = labels.agg(F.sum("comp")).collect()[0][0]
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym.v == labels.node)
            .groupBy("u")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        labels = (
            labels.join(nbr_min, labels.node == nbr_min.u, "left")
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce("nbr_comp", F.col("comp"))).alias("comp"),
            )
            .localCheckpoint()
        )
        new_sum = labels.agg(F.sum("comp")).collect()[0][0]
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return labels
