"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline, and an LSH-bucketed
(random-hyperplane) variant as the scale path: brute force is O(Q·N) dot
products — fine when the query set is small or broadcastable; the LSH path
buckets both sides so the join only compares within-bucket candidates.

All math is built-in higher-order functions (zip_with/aggregate) evaluated
JVM-side in index order, so results are bit-deterministic and
engine-portable (the DuckDB oracle reproduces them exactly).

At 100 TB: the candidate side partitions by bucket; queries broadcast. For
real ANN recall targets, raise num_planes and probe multiple buckets
(multi-probe LSH) — plumbing identical, constants larger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Deterministic pseudo-random hyperplane coefficient for (plane h, dim d):
# integer formula, identical in any engine. Values in [-3, 3].
_COEF = "(((({h} + 1) * ({d} + 3)) % 7) - 3)"


def _dot(a: str, b: str) -> str:
    """Sequential-fold dot product of two array columns (SQL expr)."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"0D, (acc, v) -> acc + v)"
    )


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector.

    ``queries`` (small) is broadcast; candidates never shuffle. Returns
    (q_id, c_id, cosine, rank) with rank 1..k, ties broken by c_id."""
    from pyspark.sql import Window as W

    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("qv")
    )
    c = emb.select(F.col(id_col).alias("c_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("q_id") != F.col("c_id"))
        .withColumn(
            "cosine",
            F.expr(
                f"{_dot('qv', 'cv')} / sqrt({_dot('qv', 'qv')} * {_dot('cv', 'cv')})"
            ),
        )
    )
    w = W.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "q_id",
            "c_id",
            F.round("cosine", 4).alias("cosine"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def lsh_bucket(
    emb: DataFrame,
    num_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH bucket id per vector: one sign bit per plane.

    Hyperplane coefficients come from the deterministic integer formula, so
    bucketing is reproducible everywhere. Output: (vec_id, bucket)."""
    bits = []
    for h in range(num_planes):
        dot = (
            f"aggregate(sequence(0, {dim - 1}), 0D, (acc, d) -> "
            f"acc + CAST({vec_col}[d] AS DOUBLE) * CAST({_COEF.format(h=h, d='d')} AS DOUBLE))"
        )
        bits.append(f"CASE WHEN ({dot}) >= 0 THEN '1' ELSE '0' END")
    bucket = "concat(" + ", ".join(bits) + ")"
    return emb.select(F.col(id_col), F.expr(bucket).alias("bucket"))


def ann_topk_lsh(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 3,
    num_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates limited to the query's LSH bucket.

    The equi-join on bucket replaces the full cross join — the scale path.
    Recall < 1 by construction; raise planes/probes for tighter recall."""
    from pyspark.sql import Window as W

    buckets = lsh_bucket(emb, num_planes, dim, id_col, vec_col)
    with_b = emb.join(buckets, id_col)
    q = with_b.join(queries.select(id_col), id_col, "left_semi").select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("qv"),
        F.col("bucket"),
    )
    c = with_b.select(
        F.col(id_col).alias("c_id"), F.col(vec_col).alias("cv"), "bucket"
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("q_id") != F.col("c_id"))
        .withColumn(
            "cosine",
            F.expr(
                f"{_dot('qv', 'cv')} / sqrt({_dot('qv', 'qv')} * {_dot('cv', 'cv')})"
            ),
        )
    )
    w = W.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "q_id",
            "c_id",
            F.round("cosine", 4).alias("cosine"),
            F.col("rank").cast("int").alias("rank"),
        )
    )
