"""Similarity search over embedding columns (array<float/double>).

Brute-force cosine is the exact baseline (O(n^2) pairs — fine for
verification and small n). The scale path for 100 TB is
`lsh_bucketed_topk`: random-hyperplane LSH buckets candidates with an
equi-join so only same-bucket pairs are scored; recall is tunable via
number of tables/bits. Dot products use left-fold `aggregate` over
`zip_with` — JVM-side, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def _normed(embeddings: DataFrame) -> DataFrame:
    v = as_double(F.col("embedding"))
    return embeddings.select(
        "vec_id", v.alias("v")
    ).withColumn("nrm", norm(F.col("v")))


def cosine_pairs(
    embeddings: DataFrame, threshold: float, round_digits: int = 6
) -> DataFrame:
    """All pairs with cosine > threshold (exact, brute force)."""
    n = _normed(embeddings)
    a, b = n.alias("a"), n.alias("b")
    cos = dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm"))
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .withColumn("cos_raw", cos)
        .filter(F.col("cos_raw") > threshold)
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round("cos_raw", round_digits).alias("cosine"),
        )
    )


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    round_digits: int = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector (self excluded).
    Deterministic: ties broken by neighbor id on the rounded score."""
    from pyspark.sql import Window

    n = _normed(embeddings).alias("n")
    q = _normed(queries).alias("q")
    cos = dot(F.col("q.v"), F.col("n.v")) / (F.col("q.nrm") * F.col("n.nrm"))
    scored = (
        q.join(n, F.col("q.vec_id") != F.col("n.vec_id"))
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("n.vec_id").alias("neighbor_id"),
            F.round(cos, round_digits).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


def lsh_bucketed_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 4,
    dim: int = 64,
    seed: int = 42,
    round_digits: int = 6,
) -> DataFrame:
    """Approximate top-k: random-hyperplane signatures bucket the
    vectors; candidates = same (table, signature) bucket; exact cosine
    re-rank within candidates. Recall grows with n_tables.

    The hyperplanes are a tiny deterministic literal array (seeded),
    broadcast implicitly as part of the plan — no shuffle to build.
    """
    import random

    from pyspark.sql import Window

    rnd = random.Random(seed)
    planes = [
        [[rnd.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]
        for _ in range(n_tables)
    ]

    def signature(v: Column, table: int) -> Column:
        bits = [
            F.when(
                sum(
                    F.get(v, i) * F.lit(planes[table][p][i]) for i in range(dim)
                )
                > 0,
                F.lit("1"),
            ).otherwise(F.lit("0"))
            for p in range(n_planes)
        ]
        return F.concat(*bits)

    def bucketed(df: DataFrame) -> DataFrame:
        n = _normed(df)
        tables = F.array(
            *[
                F.struct(F.lit(t).alias("t"), signature(F.col("v"), t).alias("sig"))
                for t in range(n_tables)
            ]
        )
        return n.select(
            "vec_id", "v", "nrm", F.explode(tables).alias("bucket")
        ).select(
            "vec_id",
            "v",
            "nrm",
            F.col("bucket.t").alias("t"),
            F.col("bucket.sig").alias("sig"),
        )

    cand_q = bucketed(queries).alias("q")
    cand_n = bucketed(embeddings).alias("n")
    cos = dot(F.col("q.v"), F.col("n.v")) / (F.col("q.nrm") * F.col("n.nrm"))
    scored = (
        cand_q.join(
            cand_n,
            (F.col("q.t") == F.col("n.t"))
            & (F.col("q.sig") == F.col("n.sig"))
            & (F.col("q.vec_id") != F.col("n.vec_id")),
        )
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("n.vec_id").alias("neighbor_id"),
            F.round(cos, round_digits).alias("cosine"),
        )
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)
