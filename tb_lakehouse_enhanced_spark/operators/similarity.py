"""Similarity search over embedding columns (LLM-pipeline extension).

- ``cosine_topk``      brute-force exact top-k: broadcast the query set,
                       score every corpus vector with JVM-side array
                       arithmetic, rank per query. The corpus is never
                       shuffled — one scan + broadcast join + windowed
                       top-k (AQE handles the final per-query rank).
- ``lsh_topk``         random-hyperplane (sign) LSH bucketing: vectors
                       land in sign-pattern buckets; only bucket-mates
                       are scored. The 100 TB path — candidate
                       generation is an equi-join on the bucket key.

Dot products use ``F.zip_with`` + ``F.aggregate`` over double math:
deterministic left-to-right accumulation (matches the SQL oracle's
element-order sum exactly), whole-stage codegen, no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v))


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k neighbors per query vector (excluding self-matches).

    Returns (query_id, neighbor_id, rank); rank by cosine desc with
    neighbor-id tie-break so the result is fully deterministic.
    """
    from pyspark.sql import Window
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
              .select("query_id", "neighbor_id",
                      cosine(F.col("qv"), F.col("cv")).alias("cos")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank"))


def _sign_bucket(vec, planes: list[list[float]]):
    """Sign-pattern bucket id over fixed hyperplanes (deterministic)."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        d = _dot(vec, plane)
        bucket = bucket + F.when(d >= 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
    return bucket


def _planes(dim: int, n_planes: int) -> list[list[float]]:
    """Fixed pseudo-random hyperplanes (LCG-seeded, library-stable)."""
    planes, state = [], 42
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            row.append(((state >> 33) / float(1 << 31)) - 1.0)
        planes.append(row)
    return planes


def lsh_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             n_planes: int = 6, dim: int = 64,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: score only same-sign-bucket candidates.

    2^n_planes buckets; at scale the corpus is written bucketed on
    ``bucket`` so queries probe a single partition each. Recall is
    traded for a ~2^n_planes reduction in scored pairs.
    """
    from pyspark.sql import Window
    planes = _planes(dim, n_planes)
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
                      _sign_bucket(F.col(vec_col), planes).alias("bucket"))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
                       _sign_bucket(F.col(vec_col), planes).alias("bucket"))
    scored = (c.join(F.broadcast(q), c.bucket == q.bucket)
              .filter(F.col("query_id") != F.col("neighbor_id"))
              .select("query_id", "neighbor_id",
                      cosine(F.col("qv"), F.col("cv")).alias("cos")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank"))
