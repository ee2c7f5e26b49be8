"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline: broadcast the (small) query
set, score every corpus vector with a JVM-side zip_with/aggregate dot
product, take per-query top-k with one window. Cost is |Q|·|corpus| dot
products spread across all executors — at 100 TB you bound |Q| or move to
the bucketed path.

The scale path is random-projection LSH (rp_lsh_buckets / rp_lsh_topk):
sign-bit bucket on R fixed hyperplanes, candidates only within the same
bucket (optionally multi-probe neighboring buckets). An IVF variant would
assign to nearest of k centroids — same join shape; the hyperplanes here
are deterministic (hash-derived, no RNG) so results are reproducible.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "with_norm",
    "cosine_expr",
    "brute_force_topk",
    "rp_lsh_buckets",
    "rp_lsh_topk",
]


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Attach the L2 norm as a double column (computed once, reused)."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))
    return df.withColumn("__norm", norm)


def cosine_expr(vec_a: str, vec_b: str, norm_a: str, norm_b: str) -> "F.Column":
    """cos(a,b) as a pure column expression — double arithmetic throughout
    (float32 inputs are upcast) so results are engine-comparable."""
    dot = F.aggregate(
        F.zip_with(
            F.col(vec_a), F.col(vec_b), lambda x, y: x.cast("double") * y.cast("double")
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return dot / (F.col(norm_a) * F.col(norm_b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast queries × scan corpus, one window for
    per-query rank. Returns (query_id, neighbor_id, cosine, rank)."""
    from pyspark.sql import Window

    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        F.col("__norm").alias("__cn"),
    )
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        F.col("__norm").alias("__qn"),
    )
    scored = c.crossJoin(F.broadcast(q)).filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    cos = cosine_expr("__qv", "__cv", "__qn", "__cn")
    scored = scored.select("query_id", "neighbor_id", cos.alias("__cos"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("__cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("__cos", 6).alias("cosine"),
            "rank",
        )
    )


def _hyperplane(dim: int, plane: int) -> list[float]:
    """Deterministic pseudo-random unit hyperplane — hash-derived components
    (no RNG state, reproducible across runs/engines)."""
    comps = []
    for j in range(dim):
        # xorshift-ish integer scramble of (plane, j) → [-1, 1)
        h = (plane * 1_000_003 + j * 37) & 0xFFFFFFFF
        h ^= h >> 13
        h = (h * 0x5BD1E995) & 0xFFFFFFFF
        h ^= h >> 15
        comps.append((h / 2**31) - 1.0)
    n = math.sqrt(sum(c * c for c in comps)) or 1.0
    return [c / n for c in comps]


def rp_lsh_buckets(
    df: DataFrame,
    num_planes: int = 8,
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Random-projection LSH bucket id: sign bits of <v, plane_i> packed to
    a long. Narrow projection; bucket cardinality 2^num_planes."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    bucket = F.lit(0).cast("long")
    for i in range(num_planes):
        plane = _hyperplane(dim, i)
        dot = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.array(*[F.lit(c) for c in plane]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket.bitwiseOR(
            F.when(dot >= 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long"))
        )
    return df.withColumn("bucket", bucket)


def rp_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only corpus vectors in the query's LSH
    bucket. Equi-join on bucket replaces the cross join — this is the
    100 TB path (recall < 1.0, tunable via num_planes / multi-probe)."""
    from pyspark.sql import Window

    dim = len(corpus.select(vec_col).first()[0])
    c = rp_lsh_buckets(with_norm(corpus, vec_col), num_planes, vec_col, dim).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        F.col("__norm").alias("__cn"),
        "bucket",
    )
    q = rp_lsh_buckets(with_norm(queries, vec_col), num_planes, vec_col, dim).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        F.col("__norm").alias("__qn"),
        "bucket",
    )
    scored = c.join(F.broadcast(q), "bucket").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    cos = cosine_expr("__qv", "__cv", "__qn", "__cn")
    w = Window.partitionBy("query_id").orderBy(F.col("__cos").desc(), F.col("neighbor_id"))
    return (
        scored.select("query_id", "neighbor_id", cos.alias("__cos"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("__cos", 6).alias("cosine"), "rank")
    )
