"""Iterative ML operators — the reference's paper apps (SURVEY A7:
C-means / GMM / GEMV, ``docs/`` paper §IV; ``iterative_support`` flag
``include/Panda.h:128``) re-expressed as cached-DataFrame loops.

Distance arithmetic uses the dot-product expansion
``|x-c|² = x·x - 2 x·c + c·c`` with the engine's sequential-fold dot
(``functions.vector``), so assignments are bitwise-deterministic and
oracle-checkable.

Scale: each iteration is one broadcast (centroids, k×dim doubles) +
one partial-aggregated shuffle (per-cluster sums) — the classic
MapReduce k-means; the loop lives on the driver, data never collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pandamapreduce_spark.functions import dot
from pandamapreduce_spark.functions.vector import _dbl


def assign_clusters(vectors: DataFrame, centroids: list[tuple[int, list[float]]], vec_col: str = "embedding") -> DataFrame:
    """Assign each vector to its nearest centroid (squared-L2,
    tie-break on centroid id). ``centroids`` are plain driver-side
    values → broadcast as literals inside the plan."""
    x = F.col(vec_col)
    xx = dot(x, x)
    # argmin via array_min over (dist, cid) structs: struct ordering is
    # lexicographic, so the min is the nearest centroid with the lowest
    # id on ties. Each distance expression appears exactly ONCE — a
    # chained when() argmin duplicates subtrees exponentially in k.
    entries = []
    for cid, cvec in centroids:
        c = F.array(*[F.lit(v) for v in cvec])
        d = xx - 2 * dot(x, c) + dot(c, c)
        entries.append(F.struct(d.alias("d"), F.lit(cid).alias("cid")))
    best = F.array_min(F.array(*entries))
    return vectors.withColumn("cluster_id", best["cid"]).withColumn("dist2", best["d"])


def update_centroids(assigned: DataFrame, dim: int, vec_col: str = "embedding") -> list[tuple[int, list[float]]]:
    """New centroids = element-wise mean per cluster, via
    ``posexplode`` + partial-aggregated groupBy((cluster, dim)) — the
    shuffle carries k×dim partial sums, independent of data size."""
    exploded = assigned.select("cluster_id", F.posexplode(_dbl(vec_col)).alias("d", "v"))
    # exact-decimal mean: avg(double) is summation-order-dependent, so
    # centroids (and therefore the whole iteration) would vary with
    # partitioning; decimal sums make k-means bitwise-deterministic.
    means = exploded.groupBy("cluster_id", "d").agg(
        (F.sum(F.col("v").cast("decimal(28,12)")).cast("double") / F.count("v")).alias("m")
    )
    rows = means.groupBy("cluster_id").agg(F.map_from_arrays(F.collect_list("d"), F.collect_list("m")).alias("mm")).collect()
    out = []
    for r in rows:
        out.append((r.cluster_id, [r.mm[i] for i in range(dim)]))
    return sorted(out)


def kmeans(vectors: DataFrame, k: int, iterations: int, vec_col: str = "embedding", id_col: str = "vec_id") -> tuple[list, DataFrame]:
    """Lloyd's algorithm, deterministically seeded: initial centroids =
    the k lowest-id vectors (reproducible across partitionings).
    Returns (centroids, final assignment DataFrame)."""
    dim = len(vectors.select(vec_col).first()[0])
    seed_rows = vectors.orderBy(id_col).limit(k).collect()
    centroids = [(i, [float(v) for v in row[vec_col]]) for i, row in enumerate(seed_rows)]
    vectors = vectors.cache()
    try:
        for _ in range(iterations):
            assigned = assign_clusters(vectors, centroids, vec_col)
            centroids = [(cid, vec) for cid, vec in update_centroids(assigned, dim, vec_col)]
        return centroids, assign_clusters(vectors, centroids, vec_col)
    finally:
        vectors.unpersist()
