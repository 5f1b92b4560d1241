"""IVF approximate-nearest-neighbor: DataFrame-native k-means
(Lloyd's) + inverted-file search (north-star similarity-search scale
path beyond the sign-bit LSH buckets in plans/similarity_q.py).

Why this shape at 100 TB:
- Training touches a SAMPLE (k-means needs ~100k vectors, not the
  corpus); each Lloyd iteration is one broadcast-join assignment pass
  (centroids are k x dim doubles — kilobytes) and one re-centering
  aggregate whose shuffle carries (cluster, dim, partial sum), bounded
  by k x dim, not corpus size.
- Search assigns every query to its nprobe nearest centroids (tiny
  cross join against broadcast centroids) and scans ONLY the matching
  inverted lists: per-query work is nprobe/k of the corpus. The final
  top-k window shuffles (query, candidate, score) pairs only.
- All vector arithmetic is JVM-side higher-order functions (zip_with
  + aggregate) — no Python in the hot path.

The iterative fit has no single-SQL twin (same note as the identity
CC loop); correctness is pinned by unit tests: monotone non-increasing
k-means cost per iteration and recall@k against the exact brute-force
oracle query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _sq_l2(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v.cast("double"),
    )


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v.cast("double"),
    )


def kmeans_fit(
    vectors: DataFrame,
    *,
    k: int = 16,
    max_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's k-means; returns (cluster, centroid array<double>).

    Deterministic init: the k vectors with the lowest ids (at corpus
    scale: a deterministic hash-sample). Each iteration: broadcast
    centroids -> nearest-centroid assignment (k-way min over a
    broadcast join, no shuffle on the corpus) -> re-center via
    posexplode + groupBy(cluster, dim) whose shuffle is k x dim
    partial sums.
    """
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    v = vectors.select(F.col(id_col).alias("_id"), vec_d.alias("_v"))
    centroids = (
        v.orderBy("_id")
        .limit(k)
        .select(
            (F.row_number().over(Window.orderBy("_id")) - 1).alias("cluster"),
            F.col("_v").alias("centroid"),
        )
    )
    for _ in range(max_iter):
        assigned = _assign(v, centroids)
        centroids = (
            assigned.select("cluster", F.posexplode("_v").alias("dim", "val"))
            .groupBy("cluster", "dim")
            .agg(F.avg("val").alias("m"))
            .groupBy("cluster")
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("dim", "m"))),
                    lambda s: s["m"],
                ).alias("centroid")
            )
        )
        # truncate the growing lineage (same pattern as the CC loop)
        centroids = centroids.localCheckpoint(eager=True)
    return centroids


def _assign(v: DataFrame, centroids: DataFrame, *, nprobe: int = 1) -> DataFrame:
    """Nearest (or nprobe-nearest) centroid per vector via broadcast
    cross join + top-n window. Output: (_id, _v, cluster, _dist)."""
    scored = v.crossJoin(F.broadcast(centroids)).select(
        "_id", "_v", "cluster", _sq_l2(F.col("_v"), F.col("centroid")).alias("_dist")
    )
    w = Window.partitionBy("_id").orderBy(F.asc("_dist"), F.asc("cluster"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= nprobe)
        .drop("_rn")
    )


def ivf_topk(
    vectors: DataFrame,
    centroids: DataFrame,
    *,
    query_ids: list | None = None,
    query_filter=None,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search: corpus partitioned into inverted lists by nearest
    centroid; each query scans only its nprobe nearest lists.

    Returns (query_id, neighbor_id, cosine, rank) — the same output
    contract as ann_topk_bruteforce, so recall@k evaluates by a direct
    join of the two results.
    """
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    # query_filter is written against the PUBLIC input columns, so it
    # must apply before the internal _id/_v rename
    q_src = vectors if query_filter is None else vectors.filter(query_filter)
    v = vectors.select(F.col(id_col).alias("_id"), vec_d.alias("_v"))
    corpus = _assign(v, centroids).select(
        F.col("_id").alias("neighbor_id"), F.col("_v").alias("n_v"), "cluster"
    )
    q = q_src.select(F.col(id_col).alias("_id"), vec_d.alias("_v"))
    if query_ids is not None:
        q = q.filter(F.col("_id").isin(query_ids))
    probes = _assign(q, centroids, nprobe=nprobe).select(
        F.col("_id").alias("query_id"), F.col("_v").alias("q_v"), "cluster"
    )
    cosine = _dot(F.col("q_v"), F.col("n_v")) / (
        F.sqrt(_dot(F.col("q_v"), F.col("q_v")))
        * F.sqrt(_dot(F.col("n_v"), F.col("n_v")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        probes.join(corpus, "cluster")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine.alias("cosine"))
        # a (query, neighbor) pair can appear via two probed lists only
        # if the corpus side were multi-assigned; it is single-assigned,
        # so no distinct needed before ranking
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
