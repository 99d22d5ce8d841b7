"""Similarity search over embedding columns (``array<float>``).

North-star scale extension: brute-force cosine top-k as the correctness
baseline, and an LSH-bucketed variant (random-hyperplane signs) as the scale
path. All vector math is built-in higher-order functions (``zip_with`` /
``aggregate``) — JVM-side, no Python UDF in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Ordered sequential double dot product (deterministic fp)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    sim_col: str = "cosine_sim",
) -> DataFrame:
    """Brute-force exact top-k by cosine: broadcast queries × all vectors.

    The scan side stays partition-parallel; each partition computes local
    similarities, the window rank shuffles only on ``query_id`` (queries ≪
    corpus). Ties break on ``id_col`` for determinism.
    """
    q = F.broadcast(queries)
    scored = vectors.crossJoin(q).select(
        F.col(query_id_col),
        F.col(id_col),
        cosine(F.col(vec_col), F.col(query_vec_col)).alias(sim_col),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col(sim_col).desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hyperplane_lsh_buckets(
    vectors: DataFrame,
    hyperplanes: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str = "bucket",
) -> DataFrame:
    """Random-hyperplane sign LSH: bucket id = bit-string of sign(v·h).

    With ``b`` hyperplanes the corpus shards into ≤2^b buckets; ANN then
    probes only the query's bucket (plus optional neighbors) — turning a
    full-scan cross join into an equi-join on ``bucket``. Hyperplanes are
    plan-time literals (broadcast-free).
    """
    bits = [
        F.when(dot(F.col(vec_col), F.array(*[F.lit(x) for x in h])) >= 0, "1").otherwise("0")
        for h in hyperplanes
    ]
    return vectors.withColumn(bucket_col, F.concat(*bits))


def cosine_topk_lsh(
    vectors: DataFrame,
    queries: DataFrame,
    hyperplanes: list[list[float]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.

    Recall < 1 by construction (an ANN); the oracle for this operator is
    the bucketed computation itself, not exact top-k.
    """
    vb = hyperplane_lsh_buckets(vectors, hyperplanes, id_col, vec_col)
    qb = hyperplane_lsh_buckets(
        queries.withColumnRenamed(query_vec_col, vec_col),
        hyperplanes,
        query_id_col,
        vec_col,
    ).withColumnRenamed(vec_col, query_vec_col)
    scored = vb.join(F.broadcast(qb), "bucket").select(
        F.col(query_id_col),
        F.col(id_col),
        cosine(F.col(vec_col), F.col(query_vec_col)).alias("cosine_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine_sim").desc(), F.col(id_col).asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
