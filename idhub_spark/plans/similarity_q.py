"""Similarity search over the embedding column (north-star extension):
brute-force cosine top-k as the exactness baseline, and a sign-bit
LSH-bucketed variant as the scale path.

Cosine arithmetic is the exact scaled-integer recipe (see dedup_q):
per-dimension int64 products summed exactly, one int->double
conversion, identical sqrt/divide shape in both engines.

Scale notes: brute-force is |Q| x |N| — fine for a bounded query set
(the broadcast side is Q, the fact side streams). The bucketed
variant prunes to same-octant candidates; at 100 TB you'd widen to
multi-probe (flip one bit) for recall, which is just a union of
bucket keys — the plan shape stays one equi-join + per-query top-k
window. The top-k window partitions by query id, so the shuffle
carries only (query, candidate, score).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

# Module alias, NOT `from ... import name`: when a plan module is the
# interpreter's entry import, queries.py's plan-package import runs
# while dedup_q is still partially initialized, and a from-import of
# its helpers raises ImportError (circular). The alias resolves via
# sys.modules even mid-import; all uses below are call-time attribute
# lookups, by which point dedup_q is fully loaded
# (tests/test_registry.py pins the fresh-interpreter case).
from idhub_spark.plans import dedup_q as _dq
from idhub_spark.queries import query, tables

_DOT = (
    "list_sum(list_transform(range(1, 65), i -> "
    "CAST(round(CAST(q.embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT) * "
    "CAST(round(CAST(n.embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT)))"
)


def _norm(alias):
    return (
        f"list_sum(list_transform(range(1, 65), i -> "
        f"CAST(round(CAST({alias}.embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT) * "
        f"CAST(round(CAST({alias}.embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT)))"
    )


_COSINE = f"CAST({_DOT} AS DOUBLE) / (sqrt(CAST({_norm('q')} AS DOUBLE)) * sqrt(CAST({_norm('n')} AS DOUBLE)))"


@query(
    "ann_topk_bruteforce",
    f"""
    WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 8),
    scored AS (
      SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id, {_COSINE} AS cosine
      FROM q JOIN embeddings n ON q.vec_id <> n.vec_id),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rn
      FROM scored)
    SELECT query_id, neighbor_id, cosine, rn AS rank
    FROM ranked WHERE rn <= 5
    """,
    doc="Brute-force cosine top-5 per query vector (exactness "
    "baseline): broadcast queries x full scan, per-query top-k window "
    "with deterministic (score, id) tie-break.",
)
def ann_topk_bruteforce(spark, sf_dir):
    t = tables(spark, sf_dir, "embeddings")
    e = t["embeddings"]
    prepped = _dq._prep_vectors(e)
    q = prepped.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"),
        F.col("sv").alias("q_sv"),
        F.col("norm").alias("q_norm"),
    )
    n = prepped.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("sv").alias("n_sv"),
        F.col("norm").alias("n_norm"),
    )
    dot = _dq._dot_pre(F.col("q_sv"), F.col("n_sv"))
    cosine = dot.cast("double") / (
        F.sqrt(F.col("q_norm").cast("double")) * F.sqrt(F.col("n_norm").cast("double"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        F.broadcast(q)
        .join(n, F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


_BUCKET_Q = " || ".join(
    f"CASE WHEN q.embedding[{i}] >= 0 THEN '1' ELSE '0' END" for i in range(1, 7)
)
_BUCKET_N = " || ".join(
    f"CASE WHEN n.embedding[{i}] >= 0 THEN '1' ELSE '0' END" for i in range(1, 7)
)


# RETIRED from the registry in r13 (displacement decision, VERDICT
# r12 #5 pattern): its single-bucket candidate plan is executed AND
# hash-verified INSIDE the registered ann_recall_at_k (whose approx
# side is this exact {_BUCKET_Q} = {_BUCKET_N} join, compared against
# the brute-force twin), and ann_topk_multiprobe supersets the probe
# (Hamming<=1 includes the Hamming=0 bucket) — three driver rows for
# one candidate-generation mechanism taxed the 50-slot rotation
# window. Oracle preserved verbatim; the pair stays oracle-exact in
# CI via tests/test_retired.py.
ANN_TOPK_BUCKETED_ORACLE = f"""
    WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 32),
    scored AS (
      SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id, {_COSINE} AS cosine
      FROM q JOIN embeddings n
        ON q.vec_id <> n.vec_id AND {_BUCKET_Q} = {_BUCKET_N}),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rn
      FROM scored)
    SELECT query_id, neighbor_id, cosine, rn AS rank
    FROM ranked WHERE rn <= 3
    """


def ann_topk_bucketed(spark, sf_dir):
    """LSH-bucketed approximate top-3: candidates restricted to the
    query's 6-sign-bit hyperoctant (the IVF-style coarse cell), so
    the scan per query is |bucket| not |corpus|."""
    t = tables(spark, sf_dir, "embeddings")
    e = t["embeddings"]
    prepped = _dq._prep_vectors(e).withColumn("bucket", _dq._bucket(F.col("embedding")))
    q = prepped.filter(F.col("vec_id") < 32).select(
        F.col("vec_id").alias("query_id"),
        F.col("sv").alias("q_sv"),
        F.col("norm").alias("q_norm"),
        "bucket",
    )
    n = prepped.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("sv").alias("n_sv"),
        F.col("norm").alias("n_norm"),
        "bucket",
    )
    dot = _dq._dot_pre(F.col("q_sv"), F.col("n_sv"))
    cosine = dot.cast("double") / (
        F.sqrt(F.col("q_norm").cast("double")) * F.sqrt(F.col("n_norm").cast("double"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        F.broadcast(q)
        .join(n, ["bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


@query(
    "embedding_norm_stats",
    f"""
    SELECT label,
           COUNT(*) AS n,
           CAST(SUM(list_sum(list_transform(range(1, 65), i ->
                CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT) *
                CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT)))) AS DOUBLE)
             / 1000000000000.0 / COUNT(*) AS avg_sq_norm
    FROM embeddings
    GROUP BY label
    """,
    doc="Vector-column profiling: exact per-label mean squared norm "
    "(int64 accumulation -> one double conversion; scale 1e12 = "
    "(1e6)^2).",
)
def embedding_norm_stats(spark, sf_dir):
    t = tables(spark, sf_dir, "embeddings")
    sq = _dq._dot_int(F.col("embedding"), F.col("embedding"))
    return (
        t["embeddings"]
        .select("label", sq.alias("sq"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum("sq").cast("double") / F.lit(1e12) / F.count(F.lit(1))).alias(
                "avg_sq_norm"
            ),
        )
    )


@query(
    "ann_recall_at_k",
    f"""
    WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 8),
    exact_scored AS (
      SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id, {_COSINE} AS cosine
      FROM q JOIN embeddings n ON q.vec_id <> n.vec_id),
    exact_top AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, neighbor_id) AS rn
        FROM exact_scored) WHERE rn <= 5),
    approx_scored AS (
      SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id, {_COSINE} AS cosine
      FROM q JOIN embeddings n
        ON q.vec_id <> n.vec_id AND {_BUCKET_Q} = {_BUCKET_N}),
    approx_top AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, neighbor_id) AS rn
        FROM approx_scored) WHERE rn <= 5)
    SELECT e.query_id,
           CAST(COUNT(a.neighbor_id) AS DOUBLE) / 5.0 AS recall_at_5
    FROM exact_top e
    LEFT JOIN approx_top a
      ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
    GROUP BY e.query_id
    """,
    doc="ANN evaluation: recall@5 of the sign-bucket index against "
    "exact brute force, per query — the measure-don't-guess loop for "
    "tuning bucket bits / multi-probe at scale.",
)
def ann_recall_at_k(spark, sf_dir):
    from pyspark.sql import Window

    t = tables(spark, sf_dir, "embeddings")
    e = t["embeddings"]
    prepped = _dq._prep_vectors(e).withColumn("bucket", _dq._bucket(F.col("embedding")))
    q = prepped.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"),
        F.col("sv").alias("q_sv"),
        F.col("norm").alias("q_norm"),
        F.col("bucket").alias("q_bucket"),
    )
    n = prepped.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("sv").alias("n_sv"),
        F.col("norm").alias("n_norm"),
        F.col("bucket").alias("n_bucket"),
    )
    dot = _dq._dot_pre(F.col("q_sv"), F.col("n_sv"))
    cosine = (
        dot.cast("double")
        / (F.sqrt(F.col("q_norm").cast("double")) * F.sqrt(F.col("n_norm").cast("double")))
    ).alias("cosine")
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))

    def topk(scored):
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 5)
            .select("query_id", "neighbor_id")
        )

    exact = topk(
        F.broadcast(q).join(n, F.col("query_id") != F.col("neighbor_id")).select(
            "query_id", "neighbor_id", cosine
        )
    )
    approx = topk(
        F.broadcast(q)
        .join(n, (F.col("q_bucket") == F.col("n_bucket")) & (F.col("query_id") != F.col("neighbor_id")))
        .select("query_id", "neighbor_id", cosine)
    )
    a = approx.withColumnRenamed("neighbor_id", "a_neighbor")
    return (
        exact.join(
            a,
            (exact["query_id"] == a["query_id"])
            & (exact["neighbor_id"] == a["a_neighbor"]),
            "left",
        )
        .groupBy(exact["query_id"].alias("query_id"))
        .agg((F.count("a_neighbor").cast("double") / 5.0).alias("recall_at_5"))
    )


# Exact-integer IVF oracle: because operators/ann.py quantizes the
# assignment geometry (scale 1e3) and carries centroids as exact
# (count, int-sum-vector) pairs, the 2-iteration Lloyd's fit is
# DETERMINISTIC and the whole query unrolls into a CTE chain —
# upgrading ann_topk_ivf from a rows-only check to a hash-checked row.
def _ivf_dist(c):
    """d_j = ||n_j*x - s_j||^2 / n_j^2 — integer numerator, one
    int->double division; identical bits to ann.py's _assign."""
    return (
        f"CAST(list_sum(list_transform(range(1, 65), i -> "
        f"({c}.n * v.xs[i] - {c}.s[i]) * ({c}.n * v.xs[i] - {c}.s[i]))) AS DOUBLE)"
        f" / CAST({c}.n * {c}.n AS DOUBLE)"
    )


def _ivf_assign(prev, out, nprobe=1, keep="v.xs"):
    return f"""
    {out} AS (
      SELECT id, {keep.split('.')[-1]}, cluster FROM (
        SELECT v.id, {keep}, c.cluster,
               row_number() OVER (PARTITION BY v.id
                                  ORDER BY {_ivf_dist('c')}, c.cluster) AS rn
        FROM v CROSS JOIN {prev} c) WHERE rn <= {nprobe})"""


def _ivf_recenter(assigned, out):
    return f"""
    {out}_sums AS (
      SELECT cluster, i AS dim, CAST(SUM(xs[i]) AS BIGINT) AS sd,
             COUNT(*) AS nd
      FROM {assigned}, UNNEST(range(1, 65)) AS t(i)
      GROUP BY cluster, i),
    {out} AS (
      SELECT cluster, CAST(max(nd) AS BIGINT) AS n,
             list_transform(list_sort(list({{'d': dim, 'sd': sd}})),
                            r -> r.sd) AS s
      FROM {out}_sums GROUP BY cluster)"""


_IVF_SI = "list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT))"
_IVF_COS = (
    "CAST(list_sum(list_transform(range(1, 65), i -> p.si[i] * n.si[i])) AS DOUBLE)"
    " / (sqrt(CAST(list_sum(list_transform(range(1, 65), i -> p.si[i] * p.si[i])) AS DOUBLE))"
    " * sqrt(CAST(list_sum(list_transform(range(1, 65), i -> n.si[i] * n.si[i])) AS DOUBLE)))"
)

_IVF_ORACLE = f"""
    WITH v AS (
      SELECT vec_id AS id,
             list_transform(embedding, x ->
               CAST(round(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS xs,
             {_IVF_SI} AS si
      FROM embeddings),
    c0 AS (
      SELECT row_number() OVER (ORDER BY id) - 1 AS cluster,
             CAST(1 AS BIGINT) AS n, xs AS s
      FROM v ORDER BY id LIMIT 8),
    {_ivf_assign('c0', 'a1').strip()},
    {_ivf_recenter('a1', 'c1').strip()},
    {_ivf_assign('c1', 'a2').strip()},
    {_ivf_recenter('a2', 'c2').strip()},
    {_ivf_assign('c2', 'corpus', keep='v.si').strip()},
    qv AS (SELECT * FROM v WHERE id < 8),
    probes AS (
      SELECT id, si, cluster FROM (
        SELECT v.id, v.si, c.cluster,
               row_number() OVER (PARTITION BY v.id
                                  ORDER BY {_ivf_dist('c')}, c.cluster) AS rn
        FROM qv v CROSS JOIN c2 c) WHERE rn <= 2),
    pairs AS (
      SELECT p.id AS query_id, n.id AS neighbor_id, {_IVF_COS} AS cosine
      FROM probes p JOIN corpus n
        ON p.cluster = n.cluster AND p.id <> n.id)
    SELECT query_id, neighbor_id, cosine, rn AS rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rn
      FROM pairs) WHERE rn <= 5
    """


@query(
    "ann_topk_ivf",
    _IVF_ORACLE,
    doc="IVF ANN: DataFrame-native Lloyd's k-means (operators/ann.py) "
    "partitions the corpus into inverted lists; each query scans only "
    "its nprobe nearest lists. The honest scale path beyond sign-bit "
    "buckets: per-query work is nprobe/k of the corpus, training "
    "shuffles are bounded by k x dim. Exact-integer quantized "
    "assignment + int-sum centroids make the fit deterministic, so "
    "the oracle unrolls both Lloyd iterations as CTEs and the driver "
    "hash-checks the full result (previously rows-only).",
)
def ann_topk_ivf(spark, sf_dir):
    from idhub_spark.operators.ann import ivf_topk, kmeans_fit

    t = tables(spark, sf_dir, "embeddings")
    e = t["embeddings"]
    centroids = kmeans_fit(e, k=8, max_iter=2)
    return ivf_topk(e, centroids, query_ids=list(range(8)), k=5, nprobe=2)


_HAMMING_LE1 = (
    "len(list_filter(range(1, 7), i -> "
    "(q.embedding[i] >= 0) <> (n.embedding[i] >= 0))) <= 1"
)


@query(
    "ann_topk_multiprobe",
    f"""
    WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 32),
    scored AS (
      SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id, {_COSINE} AS cosine
      FROM q JOIN embeddings n
        ON q.vec_id <> n.vec_id AND {_HAMMING_LE1}),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rn
      FROM scored)
    SELECT query_id, neighbor_id, cosine, rn AS rank
    FROM ranked WHERE rn <= 3
    """,
    doc="Multi-probe LSH top-3: each query also probes the 6 buckets "
    "at Hamming distance 1 (one flipped sign bit), recovering the "
    "near-boundary neighbors single-bucket search misses, at 7x the "
    "per-query candidate cost. Spark keeps it an EQUI-join by "
    "exploding the query side into its 7 probe keys; the oracle uses "
    "the equivalent bit-distance predicate.",
)
def ann_topk_multiprobe(spark, sf_dir):
    t = tables(spark, sf_dir, "embeddings")
    e = t["embeddings"]
    prepped = _dq._prep_vectors(e).withColumn("bucket", _dq._bucket(F.col("embedding")))
    # probe keys: the exact bucket + each one-bit flip. The bucket is a
    # 6-char '0'/'1' string; flipping bit i is a substring splice.
    flips = [F.col("bucket")] + [
        F.concat(
            F.substring("bucket", 1, i),
            F.when(F.substring("bucket", i + 1, 1) == "1", F.lit("0")).otherwise(
                F.lit("1")
            ),
            F.substring("bucket", i + 2, 6 - i - 1),
        )
        for i in range(6)
    ]
    q = (
        prepped.filter(F.col("vec_id") < 32)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("sv").alias("q_sv"),
            F.col("norm").alias("q_norm"),
            F.explode(F.array(*flips)).alias("bucket"),
        )
    )
    n = prepped.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("sv").alias("n_sv"),
        F.col("norm").alias("n_norm"),
        "bucket",
    )
    dot = _dq._dot_pre(F.col("q_sv"), F.col("n_sv"))
    cosine = dot.cast("double") / (
        F.sqrt(F.col("q_norm").cast("double")) * F.sqrt(F.col("n_norm").cast("double"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        F.broadcast(q)
        .join(n, ["bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


# IVF x SQ8 oracle: extends the exact-integer IVF chain with the SQ8
# bounds fit, int8 encoding (clamped affine map, mirroring
# ann.py:sq8_encode bit for bit), the INTEGER asymmetric candidate
# score (w_i = round(q_i*(mx_i-mn_i)*1e6); ascore = sum w_i*(code+128)
# — order-independent because exact int64), and the scaled-int64
# cosine rescore. Deterministic end to end, so the driver hash-checks
# the full composed plan.
_SQ8_CODE = (
    "list_transform(range(1, 65), i -> CASE WHEN b.maxs[i] = b.mins[i] "
    "THEN 0 ELSE greatest(least(CAST(round(((v.ev[i] - b.mins[i]) / "
    "(b.maxs[i] - b.mins[i])) * 255.0) AS INTEGER) - 128, 127), -128) END)"
)

_IVF_SQ8_ORACLE = f"""
    WITH v AS (
      SELECT vec_id AS id,
             list_transform(embedding, x ->
               CAST(round(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS xs,
             {_IVF_SI} AS si,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
      FROM embeddings),
    c0 AS (
      SELECT row_number() OVER (ORDER BY id) - 1 AS cluster,
             CAST(1 AS BIGINT) AS n, xs AS s
      FROM v ORDER BY id LIMIT 8),
    {_ivf_assign('c0', 'a1').strip()},
    {_ivf_recenter('a1', 'c1').strip()},
    {_ivf_assign('c1', 'a2').strip()},
    {_ivf_recenter('a2', 'c2').strip()},
    corpus0 AS (
      SELECT id, cluster FROM (
        SELECT v.id, c.cluster,
               row_number() OVER (PARTITION BY v.id
                                  ORDER BY {_ivf_dist('c')}, c.cluster) AS rn
        FROM v CROSS JOIN c2 c) WHERE rn <= 1),
    dims AS (
      SELECT i, MIN(v.ev[i]) AS mn, MAX(v.ev[i]) AS mx
      FROM v, UNNEST(range(1, 65)) AS t(i) GROUP BY i),
    bounds AS (
      SELECT list_transform(list_sort(list({{'d': i, 'v': mn}})), r -> r.v) AS mins,
             list_transform(list_sort(list({{'d': i, 'v': mx}})), r -> r.v) AS maxs
      FROM dims),
    corpus AS (
      SELECT a.id, a.cluster, {_SQ8_CODE} AS code
      FROM corpus0 a JOIN v ON a.id = v.id CROSS JOIN bounds b),
    qv AS (SELECT * FROM v WHERE id < 8),
    probes AS (
      SELECT id, cluster FROM (
        SELECT v.id, c.cluster,
               row_number() OVER (PARTITION BY v.id
                                  ORDER BY {_ivf_dist('c')}, c.cluster) AS rn
        FROM qv v CROSS JOIN c2 c) WHERE rn <= 2),
    qw AS (
      SELECT p.id, p.cluster,
             list_transform(range(1, 65), i ->
               CAST(round((v.ev[i] * (b.maxs[i] - b.mins[i])) * 1000000.0)
                    AS BIGINT)) AS w
      FROM probes p JOIN v ON p.id = v.id CROSS JOIN bounds b),
    scored AS (
      SELECT q.id AS query_id, n.id AS neighbor_id,
             list_sum(list_transform(range(1, 65), i ->
               q.w[i] * (CAST(n.code[i] AS BIGINT) + 128))) AS ascore
      FROM qw q JOIN corpus n
        ON q.cluster = n.cluster AND q.id <> n.id),
    cand AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY ascore DESC, neighbor_id) AS rn
        FROM scored) WHERE rn <= 20),
    pairs AS (
      SELECT c.query_id, c.neighbor_id, {_IVF_COS} AS cosine
      FROM cand c JOIN v p ON c.query_id = p.id
                  JOIN v n ON c.neighbor_id = n.id)
    SELECT query_id, neighbor_id, cosine, rn AS rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rn
      FROM pairs) WHERE rn <= 5
    """


@query(
    "ivf_sq8_topk",
    _IVF_SQ8_ORACLE,
    doc="IVF x SQ8 composition (operators/ann.py:ivf_sq8_topk) — the "
    "100 TB ANN plan: queries route to their nprobe=2 nearest "
    "centroids (broadcast), candidates are ranked INSIDE the probed "
    "inverted lists on the int8 `code` column only (per-query compute "
    "nprobe/k of the corpus AND 4x less scan I/O than float32), and "
    "the top rescore*k survivors are rescored with the exact "
    "scaled-int64 cosine (full-precision point lookups). The "
    "candidate rank is an integer asymmetric score "
    "(w_i = round(q_i*(mx_i-mn_i)*1e6), ascore = sum w_i*(code_i+128)) "
    "— exact int64, order-independent, so the whole composed plan is "
    "deterministic and the oracle unrolls kmeans + bounds + encode + "
    "probe + rescore as one CTE chain. Faiss IVF-SQ + refine design "
    "(public).",
)
def ivf_sq8_topk_q(spark, sf_dir):
    from idhub_spark.operators.ann import ivf_sq8_topk, kmeans_fit, sq8_fit

    t = tables(spark, sf_dir, "embeddings")
    e = t["embeddings"]
    centroids = kmeans_fit(e, k=8, max_iter=2)
    bounds = sq8_fit(e)
    return ivf_sq8_topk(
        e, centroids, bounds, query_ids=list(range(8)), k=5, nprobe=2, rescore=4
    )


@query(
    "split_hot_clusters_state",
    """
    SELECT metric, CAST(1 AS BIGINT) AS ok FROM (VALUES
      ('rows_preserved'), ('max_share_ok'), ('split_happened'),
      ('staging_clean'), ('fits_match')) AS t(metric)
    """,
    doc="The hot-cluster auto-split POLICY (operators/ann.py "
    "split_hot_clusters) driven end to end on a skewed on-disk index: "
    "70% of a bounded embeddings slice is compressed into one tight "
    "blob captured by a single centroid, the policy must keep "
    "splitting (staged, crash-safe apply per iteration) until no "
    "cluster holds more than max_share=0.45 of the rows. kmeans "
    "sub-fits have no tractable SQL twin, so the oracle pins the "
    "policy's INVARIANTS as verdict rows (the kmv_accuracy_check "
    "pattern), each computed Spark-side from the post-split index: "
    "rows preserved through every staged apply; max cluster share at "
    "or under the threshold; at least one split performed (the "
    "fixture is skewed by construction); staging cleaned; and the "
    "refreshed _fits/centroids agreeing exactly with the on-disk "
    "cluster directories. All state reads are bounded (per-cluster "
    "stats rows, k-row centroid frames).",
)
def split_hot_clusters_state(spark, sf_dir):
    import os
    import tempfile

    from idhub_spark.operators.ann import (
        ivf_index_load_fits,
        ivf_index_stats,
        ivf_sq8_index_write,
        kmeans_fit,
        split_hot_clusters,
        sq8_fit,
    )

    t = tables(spark, sf_dir, "embeddings")
    e = t["embeddings"].filter(F.col("vec_id") < 400)
    # blob spread must survive the exact-integer assignment grid
    # (_ASSIGN_SCALE quantizes at 1e-3): 0.1x the source embedding
    # keeps the blob tightly around 10.0 (captured by one centroid)
    # while leaving sub-kmeans enough variance to split it
    blob = e.filter(F.col("vec_id") % 10 < 7).select(
        "vec_id",
        F.transform(
            "embedding", lambda x: x.cast("double") * 0.1 + 10.0
        ).alias("embedding"),
    )
    rest = e.filter(F.col("vec_id") % 10 >= 7).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    vectors = blob.unionByName(rest)
    # ONE job for both fixture scalars (r20 — was a first() plus a
    # separate count below): the corpus dim is fixed, so min(size) ==
    # the old first-row size
    _fx = vectors.agg(
        F.count(F.lit(1)).alias("n"), F.min(F.size("embedding")).alias("dim")
    ).first()
    n_before, dim = int(_fx.n), int(_fx.dim)
    from idhub_spark.session import literal_frame

    reps = literal_frame(
        spark,
        [(0, [10.0] * dim), (1, [-0.5] * dim), (2, [0.5] * dim)],
        "vec_id long, embedding array<double>",
    )
    centroids = kmeans_fit(reps, k=3, max_iter=0)
    path = os.path.join(
        tempfile.gettempdir(),
        "idhub_split_policy",
        f"{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    ivf_sq8_index_write(vectors, centroids, sq8_fit(vectors), path)

    # max_iter=2 on the sub-fit: the blob is two clean half-blobs, so
    # Lloyd's converges immediately and extra iterations only add jobs
    cents, report = split_hot_clusters(
        spark, path, max_share=0.45, k2=2, max_iter=2
    )

    stats = {
        r.cluster: r.n_rows for r in ivf_index_stats(spark, path).collect()
    }
    total = stats.pop(-1)
    fits = {
        r.cluster
        for r in ivf_index_load_fits(spark, path)["centroids"]
        .select("cluster")
        .collect()
    }
    cent_set = {r.cluster for r in cents.select("cluster").collect()}
    checks = [
        ("rows_preserved", total == n_before),
        ("max_share_ok", max(stats.values()) / total <= 0.45),
        ("split_happened", len(report) >= 1 and report[0]["did_split"]),
        ("staging_clean", not os.path.isdir(f"{path}/_split_staging")),
        ("fits_match", fits == set(stats) == cent_set),
    ]
    from idhub_spark.session import literal_frame

    return literal_frame(
        spark,
        [(m, 1 if ok else 0) for m, ok in checks],
        "metric string, ok bigint",
    )


@query(
    "pq_drift_check",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(1 AS BIGINT) AS nv_ok,
           CAST(1 AS BIGINT) AS nsv_ok,
           CAST(1 AS BIGINT) AS null_invariant_ok,
           CAST(1 AS BIGINT) AS bounds_ok
    FROM embeddings
    WHERE vec_id < 256 AND embedding IS NOT NULL AND len(embedding) > 0
    """,
    doc="pq_drift_stats' contracts pinned at driver level (the "
    "kmv_accuracy_check pattern; the codebook itself has no DuckDB "
    "twin): (a) n_vectors equals the exact count of encodable (non-"
    "null, non-empty) batch rows — the oracle computes that count "
    "over the same slice; (b) n_subvectors = n_vectors * m; (c) the "
    "six reported stats are IDENTICAL whether or not NULL/empty "
    "vector rows ride along in the batch (the r11 ADVICE defect: the "
    "constructed per-subspace array is non-null even when every "
    "element is, so the unfixed posexplode emitted m NULL rows per "
    "such vector, inflating counts and deflating mse); (d) "
    "max_se_micro >= mse_micro. A regression flips a flag to 0 and "
    "fails the hash.",
)
def pq_drift_check(spark, sf_dir):
    from idhub_spark.operators.ann import pq_drift_stats, pq_fit

    t = tables(spark, sf_dir, "embeddings")
    base = (
        t["embeddings"]
        .filter(
            (F.col("vec_id") < 256)
            & F.col("embedding").isNotNull()
            & (F.size("embedding") > 0)
        )
        .select("vec_id", "embedding")
    )
    # smallest codebook that still exercises every contract (the
    # checks are m-generic; pq_fit runs one kmeans per subspace per
    # iteration, so m x max_iter is the query's job count)
    m = 2
    codebook = pq_fit(base, m=m, k=4, max_iter=1)
    vtype = dict(base.dtypes)["embedding"]
    one = base.limit(1)
    nulls = one.select(
        (F.col("vec_id") + 10**9).alias("vec_id"),
        F.lit(None).cast(vtype).alias("embedding"),
    )
    empties = one.select(
        (F.col("vec_id") + 10**9 + 1).alias("vec_id"),
        F.expr("slice(embedding, 1, 0)").alias("embedding"),
    )
    with_nulls = base.unionByName(nulls).unionByName(empties)

    clean = pq_drift_stats(base, codebook)
    dirty = pq_drift_stats(with_nulls, codebook)
    exact_n = base.agg(F.count(F.lit(1)).cast("bigint").alias("_exact"))

    ok = lambda cond: F.when(cond, 1).otherwise(0).cast("bigint")  # noqa: E731
    d, c = dirty.alias("d"), clean.alias("c")
    return (
        d.crossJoin(c)
        .crossJoin(exact_n)
        .select(
            F.col("d.n_vectors").cast("bigint").alias("n_vectors"),
            ok(F.col("d.n_vectors") == F.col("_exact")).alias("nv_ok"),
            ok(
                F.col("d.n_subvectors") == F.col("d.n_vectors") * m
            ).alias("nsv_ok"),
            ok(
                (F.col("d.n_vectors") == F.col("c.n_vectors"))
                & (F.col("d.n_subvectors") == F.col("c.n_subvectors"))
                & (F.col("d.mse_micro") == F.col("c.mse_micro"))
                & (F.col("d.max_se_micro") == F.col("c.max_se_micro"))
                & (F.col("d.worst_sub") == F.col("c.worst_sub"))
                & (
                    F.col("d.worst_sub_mse_micro")
                    == F.col("c.worst_sub_mse_micro")
                )
            ).alias("null_invariant_ok"),
            ok(F.col("d.max_se_micro") >= F.col("d.mse_micro")).alias(
                "bounds_ok"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Registered r15 (VERDICT r14 ask #1c; pre-staged r13/r14 when those
# windows had zero slack). Gives the remaining pytest-only IVF
# maintenance legs (delete, cold-merge, stats consistency) their
# driver row in one composite.
# ---------------------------------------------------------------------------
IVF_MAINTENANCE_STATE_ORACLE = """
    SELECT metric, CAST(1 AS BIGINT) AS ok FROM (VALUES
      ('delete_count_ok'), ('victims_gone'), ('orphan_reclaimed'),
      ('rows_moved_ok'), ('rows_preserved'), ('no_cold_left'),
      ('fits_match'), ('stats_consistent')) AS t(metric)
    """


@query(
    "ivf_maintenance_state",
    IVF_MAINTENANCE_STATE_ORACLE,
    doc="IVF delete / cold-merge / stats-consistency lifecycle as "
    "verdict rows",
)
def ivf_maintenance_state(spark, sf_dir):
    """The IVF index MAINTENANCE lifecycle driven end to end
    (operators/ann.py — the legs split_hot_clusters_state doesn't
    cover): build an on-disk IVF-SQ8 index, DELETE every member of its
    smallest cluster (takedown path; the emptied cluster's directory
    drops but its centroid row survives as an orphan), then MERGE cold
    clusters (min_rows = smallest surviving size + 1, so at least one
    REAL cluster folds too — rows actually move) and verify via
    ivf_index_stats. kmeans has no tractable SQL twin, so the oracle
    pins the lifecycle's INVARIANTS as verdict rows (the
    split_hot_clusters_state pattern), each computed Spark-side from
    bounded state (per-cluster stats rows, k-row centroid frames):

    - delete_count_ok / victims_gone: the retraction removed exactly
      the planted set, and no victim id remains in the index scan.
    - orphan_reclaimed: the emptied cluster's centroid is gone from
      the post-merge centroid set (ivf_index_delete leaves it; the
      merge's stats.get(c, 0) coldness rule folds it — the 947b151
      orphan-reclaim contract).
    - rows_moved_ok: the merge moved exactly the cold clusters' rows.
    - rows_preserved: post-merge total == n_before - rows_deleted.
    - no_cold_left: every surviving cluster holds >= min_rows rows.
    - fits_match: _fits/centroids == on-disk dirs == returned frame.
    - stats_consistent: the stats total row equals the per-cluster sum.
    """
    import os
    import tempfile

    from idhub_spark.operators.ann import (
        ivf_index_delete,
        ivf_index_load_fits,
        ivf_index_merge_cold_clusters,
        ivf_index_stats,
        ivf_sq8_index_write,
        kmeans_fit,
        sq8_fit,
    )
    from idhub_spark.session import literal_frame

    t = tables(spark, sf_dir, "embeddings")
    e = t["embeddings"].filter(F.col("vec_id") < 400).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    path = os.path.join(
        tempfile.gettempdir(),
        "idhub_ivf_maintenance",
        f"{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    centroids = kmeans_fit(e, k=8, max_iter=2)
    ivf_sq8_index_write(e, centroids, sq8_fit(e), path)
    n_before = e.count()

    stats0 = {
        r.cluster: r.n_rows
        for r in ivf_index_stats(spark, path).collect()
        if r.cluster >= 0
    }
    smallest = min(stats0, key=lambda c: (stats0[c], c))
    # pin the set BEFORE the rewrite; lazy persist + count = one
    # materialization job (r20 — was an eager checkpoint + a count)
    victims = (
        spark.read.parquet(path)
        .filter(F.col("cluster") == smallest)
        .select("vec_id")
        .persist()
    )
    n_victims = victims.count()
    res = ivf_index_delete(spark, path, victims)

    # post-delete: victims absent (bounded check — semi-join count)
    victims_left = (
        spark.read.parquet(path).join(victims, "vec_id", "semi").count()
    )

    stats1 = {
        r.cluster: r.n_rows
        for r in ivf_index_stats(spark, path).collect()
        if r.cluster >= 0
    }
    min_rows = min(stats1.values()) + 1
    expect_moved = sum(n for n in stats1.values() if n < min_rows)
    cents, report = ivf_index_merge_cold_clusters(
        spark, path, min_rows=min_rows
    )

    st = ivf_index_stats(spark, path).collect()
    stats2 = {r.cluster: r.n_rows for r in st if r.cluster >= 0}
    total2 = next(r.n_rows for r in st if r.cluster == -1)
    fits = {
        r.cluster
        for r in ivf_index_load_fits(spark, path)["centroids"]
        .select("cluster")
        .collect()
    }
    cent_set = {r.cluster for r in cents.select("cluster").collect()}

    checks = [
        ("delete_count_ok", res["rows_deleted"] == n_victims > 0),
        ("victims_gone", victims_left == 0),
        ("orphan_reclaimed", smallest in report["merged_clusters"]
         and smallest not in cent_set),
        ("rows_moved_ok", report["rows_moved"] == expect_moved),
        ("rows_preserved", total2 == n_before - n_victims),
        ("no_cold_left", min(stats2.values()) >= min_rows),
        ("fits_match", fits == set(stats2) == cent_set),
        ("stats_consistent", sum(stats2.values()) == total2),
    ]
    return literal_frame(
        spark,
        [(m, 1 if ok else 0) for m, ok in checks],
        "metric string, ok bigint",
    )
