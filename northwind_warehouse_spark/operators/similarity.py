"""Near-duplicate detection and similarity search (SURVEY.md §2C).

Spark-first designs for the 100 TB regime:

- **MinHash-LSH** — signatures via one explode + groupBy (map-side
  partial min() per seed), candidates via band-bucket equi-self-join:
  never materializes the O(n²) pair space. Hash family = md5 hex strings
  (lexicographic min), portable to any engine.
- **SimHash** — bit-vote fingerprint from token hashes, pure bit
  arithmetic (conv/shiftright), no UDF.
- **ANN** — brute-force cosine top-k as the exact baseline (decimal dot
  products, functions/vectors.py); LSH random-hyperplane bucketing as
  the scale path (deterministic ±1 hyperplanes derived from md5 in the
  driver, shipped as literals — zero runtime hashing).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from northwind_warehouse_spark.functions.text import SHINGLE_K

N_SEEDS = 8
N_BANDS = 4  # 2 rows per band


def shingles(documents: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Distinct K-word shingles per document (explode, set semantics)."""
    toks = documents.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("w")
    ).filter(F.size("w") >= SHINGLE_K)
    return toks.select(
        id_col,
        F.explode(
            F.expr("transform(sequence(0, size(w)-3), i -> concat_ws(' ', w[i], w[i+1], w[i+2]))")
        ).alias("shingle"),
    ).distinct()


def minhash_signatures(sh: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """One min() per seed over md5('seed|shingle') — partial-aggregates
    map-side, single shuffle on doc_id."""
    aggs = [
        F.min(F.md5(F.concat_ws("|", F.lit(str(s)), F.col("shingle")))).alias(f"mh{s}")
        for s in range(N_SEEDS)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(sig: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Band-bucket self-join → candidate pairs (doc_a < doc_b)."""
    rows_per_band = N_SEEDS // N_BANDS
    bands = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.md5(F.concat_ws("|", *[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)])).alias("bkey"),
        )
        for b in range(N_BANDS)
    ])
    exploded = sig.select(F.col(id_col), F.explode(bands).alias("bb")).select(
        id_col, F.col("bb.band").alias("band"), F.col("bb.bkey").alias("bkey")
    )
    a = exploded.alias("a")
    b = exploded.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.bkey") == F.col("b.bkey")))
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .distinct()
    )


def pair_jaccard(sh: DataFrame, pairs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs.

    The ratio is published at exact 4dp via integer division — portable.
    """
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a_sh = sh.select(F.col(id_col).alias("doc_a"), "shingle")
    b_sh = sh.select(F.col(id_col).alias("doc_b"), F.col("shingle").alias("shingle_b"))
    inter = (
        pairs.join(a_sh, "doc_a")
        .join(b_sh, (pairs.doc_b == b_sh.doc_b) & (F.col("shingle") == F.col("shingle_b")))
        .groupBy("doc_a", pairs.doc_b.alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed(id_col, "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed(id_col, "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
        .withColumn("n_union", (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("bigint"))
        .withColumn("n_inter", F.col("n_inter").cast("bigint"))
        .withColumn(
            "jaccard_4dp",
            F.expr("CAST((10000 * n_inter) div n_union AS DOUBLE) / 10000.0"),
        )
    )
    return out.select("doc_a", "doc_b", "n_inter", "n_union", "jaccard_4dp")


def simhash32(documents: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """32-bit SimHash fingerprint: per-token md5→32-bit hash, per-bit ±1
    votes, sign → bit. Pure bit arithmetic, single shuffle."""
    toks = documents.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("tok")
    )
    h = F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long")
    votes = toks.withColumn("h", h).groupBy(id_col).agg(
        *[
            F.sum(2 * F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) - 1).alias(f"v{b}")
            for b in range(32)
        ]
    )
    fp = sum(
        (F.when(F.col(f"v{b}") > 0, F.lit(2 ** b)).otherwise(F.lit(0)) for b in range(32)),
        F.lit(0),
    )
    return votes.select(F.col(id_col), fp.cast("bigint").alias("simhash"))


def _plane_weights(n_planes: int, dim: int) -> list[list[int]]:
    """Deterministic ±1 hyperplanes from md5 — computed once in the
    driver, shipped as literals (portable + zero runtime hash cost)."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            digest = hashlib.md5(f"{p}|{d}".encode()).hexdigest()
            row.append(1 if int(digest[0], 16) % 2 == 0 else -1)
        planes.append(row)
    return planes


def lsh_buckets(embeddings: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
                n_planes: int = 8, dim: int = 64) -> DataFrame:
    """Random-hyperplane LSH bucket id per vector (exact decimal
    projections → deterministic signs)."""
    planes = _plane_weights(n_planes, dim)
    proj_cols = []
    for p, w in enumerate(planes):
        arr = "array(" + ",".join(str(x) for x in w) + ")"
        proj = F.expr(
            f"aggregate(zip_with({vec_col}, {arr}, "
            f"(x, wt) -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT) * wt), "
            f"CAST(0 AS BIGINT), (acc, v) -> acc + v)"
        )
        proj_cols.append(F.when(proj > 0, F.lit(2 ** p)).otherwise(F.lit(0)))
    bucket = sum(proj_cols[1:], proj_cols[0])
    return embeddings.select(F.col(id_col), bucket.cast("bigint").alias("bucket_id"))


def oracle_plane_weights_sql(n_planes: int = 8, dim: int = 64) -> list[str]:
    """DuckDB list literals for the same hyperplanes."""
    return ["[" + ",".join(str(x) for x in row) + "]" for row in _plane_weights(n_planes, dim)]


def ann_bruteforce_topk(
    embeddings: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k for the first ``n_queries`` vectors.

    Baseline path: broadcast the (small) query set against the full
    corpus — one pass, no shuffle until the tiny top-k window. The
    LSH-bucket variant (lsh_buckets) is the 100 TB path.
    """
    from northwind_warehouse_spark.functions.vectors import cosine_from_parts, dot_q, norm2_q

    base = embeddings.select(
        F.col(id_col), F.col(vec_col), norm2_q(vec_col).alias("n2")
    )
    q = base.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.col("n2").alias("qn2"),
    )
    pairs = base.join(F.broadcast(q), F.col(id_col) != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        dot_q("qvec", vec_col).alias("dot"),
        F.col("qn2").alias("n2a"),
        F.col("n2").alias("n2b"),
    ).withColumn("cosine", cosine_from_parts("dot", "n2a", "n2b"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("neighbor_id"))
    return (
        scored.withColumn("nn_rank", F.row_number().over(w))
        .filter(F.col("nn_rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "nn_rank")
        .orderBy("query_id", "nn_rank")
    )
