"""IVF k-means ANN tests: Lloyd's cost decreases monotonically, and
IVF recall@k against the exact brute-force baseline clears the bar
expected for nprobe/k pruning on the synthetic embeddings."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from idhub_spark.operators.ann import _assign, ivf_topk, kmeans_fit

SF = os.environ.get("IDHUB_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def vectors(spark):
    return spark.read.parquet(os.path.join(SF, "embeddings.parquet"))


def _cost(vectors, centroids):
    vec_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    v = vectors.select(F.col("vec_id").alias("_id"), vec_d.alias("_v"))
    return (
        _assign(v, centroids)
        .agg(F.sum("_dist").alias("c"))
        .collect()[0]
        .c
    )


def test_kmeans_cost_monotone(spark, vectors):
    costs = [
        _cost(vectors, kmeans_fit(vectors, k=8, max_iter=i)) for i in (0, 1, 3)
    ]
    assert costs[1] <= costs[0] + 1e-6
    assert costs[2] <= costs[1] + 1e-6


def test_ivf_recall_vs_bruteforce(spark, vectors):
    """recall@5 of IVF (k=8, nprobe=3) vs exact top-5 on queries
    vec_id < 8 — the pruned search must recover most true neighbors."""
    centroids = kmeans_fit(vectors, k=8, max_iter=3)
    ivf = ivf_topk(vectors, centroids, query_ids=list(range(8)), k=5, nprobe=3)

    # exact baseline, same contract
    vec_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    v = vectors.select(F.col("vec_id").alias("_id"), vec_d.alias("_v"))
    q = v.filter(F.col("_id") < 8).select(
        F.col("_id").alias("query_id"), F.col("_v").alias("q_v")
    )
    n = v.select(F.col("_id").alias("neighbor_id"), F.col("_v").alias("n_v"))
    from idhub_spark.operators.ann import _dot

    cosine = _dot(F.col("q_v"), F.col("n_v")) / (
        F.sqrt(_dot(F.col("q_v"), F.col("q_v")))
        * F.sqrt(_dot(F.col("n_v"), F.col("n_v")))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    exact = (
        q.crossJoin(n)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
    )
    hits = ivf.select("query_id", "neighbor_id").intersect(
        exact.select("query_id", "neighbor_id")
    )
    recall = hits.count() / exact.count()
    assert recall >= 0.5, f"recall@5 {recall}"
    # every query produced a full (or bucket-limited) result set
    assert ivf.groupBy("query_id").count().agg(F.min("count")).collect()[0][0] >= 1
