"""Frequency + distinct sketches: EXACT heavy hitters without a
full-key shuffle, and mergeable KMV distinct sketches with set
algebra (union / intersection / Jaccard across segments).

The naive heavy-hitter plan — groupBy(key).count().filter(n >= t) —
shuffles one row per DISTINCT key. At 100 TB that key space (users,
URLs, n-grams) can be billions of rows of shuffle for an answer that
keeps only a handful. The classic two-pass fix (Misra-Gries 1982 +
the mergeability result of Agarwal et al., PODS'12 — public
algorithms):

  pass 1  per-partition Misra-Gries sketch with k counters, emitted
          as (key, residual weight) pairs (<= k rows per partition,
          NO shuffle of the input)
  merge   the per-partition sketches fold into ONE k-counter sketch:
          residual weights are summed per key (a shuffle of sketch
          rows only, <= k per input partition) and the union is
          reduced back to <= k counters by subtracting the (k+1)-th
          largest merged weight — so the candidate set shipped to
          pass 2 is <= k rows at ANY partition count, not
          k x n_partitions
  pass 2  exact recount restricted to the candidate set via a
          broadcast semi-join; threshold filter on the exact counts

Error bound under merging (the mass argument, Agarwal et al.): every
unit of undercount anywhere — a per-partition MG reduction or the
final merge reduction — removes >= (k+1) units of counter mass, and
total mass inserted is exactly N, so the undercount of any single key
is <= N/(k+1) across the whole tree. An item with global count
> N/(k+1) therefore has positive residual weight in the MERGED sketch
and survives the reduction: with threshold t > N/(k+1) the merged
candidate set is a strict superset of the true heavy hitters, and
pass 2's exact counts make the final answer EXACT and deterministic
under any partitioning (the candidate SET varies with partitioning;
the thresholded result does not — extra candidates are filtered by
their exact counts).

NULL keys are first-class: the per-partition fold counts them
(value_counts(dropna=False), normalized to a single None counter) and
pass 2's semi-join is null-safe, so a NULL key whose count clears the
threshold is reported exactly as the naive groupBy would. One
documented caveat: Arrow hands integer key columns containing nulls
to pandas as float64, so nullable int keys above 2^53 would lose
precision in pass 1 (candidate identity only — pass 2 recounts on the
original column); use string keys if that range is real.

Python is justified here (the one criterion in operators/multimodal):
the sketch is inherently stateful per partition and Arrow-batched —
each batch is folded via a vectorized value_counts, never a Python
row loop. The reference has no sketch surface; this extends the
profile/report family (SURVEY.md §2.6) the way a training-data
pipeline needs at corpus scale.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def misra_gries_candidates(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries sketch rows: (key_col, _w) with
    <= k rows per partition, _w the residual counter weight (the
    mergeable quantity — summing _w per key across partitions and
    re-reducing yields a valid k-counter sketch of the union).

    Arrow-batched: each incoming batch folds into the counter table
    via pandas value_counts; when the table exceeds k counters the MG
    reduction subtracts the (k+1)-th largest count from every counter
    and drops the non-positive ones (removes >= (k+1)*dec total mass,
    which is what bounds the per-partition error at n_p/(k+1)).
    NULL keys fold into a single None counter (value_counts keeps
    nulls; NaN is normalized to None so repeated batches hit the same
    dict slot).
    """
    import pandas as pd

    out_schema = T.StructType(
        df.select(key_col).schema.fields + [T.StructField("_w", T.LongType())]
    )

    def sketch(batches):
        counters: dict = {}
        for pdf in batches:
            for key, c in pdf[key_col].value_counts(dropna=False).items():
                if not isinstance(key, (str, bytes)) and pd.isna(key):
                    key = None
                counters[key] = counters.get(key, 0) + int(c)
            if len(counters) > k:
                dec = sorted(counters.values(), reverse=True)[k]
                counters = {key: c - dec for key, c in counters.items() if c > dec}
        if counters:
            yield pd.DataFrame(
                {key_col: list(counters.keys()), "_w": list(counters.values())}
            )

    return df.select(key_col).mapInPandas(sketch, out_schema)


def merged_candidates(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """The <= k candidate keys of the MERGED k-counter sketch.

    Per-partition sketch rows are summed per key (shuffle volume:
    sketch rows only) and the union is reduced exactly as one MG step
    would: subtract the (k+1)-th largest merged weight d from every
    counter and keep the strictly-positive ones — i.e. keys with
    merged weight > d. The removed mass is >= (k+1)*d, so the global
    N/(k+1) undercount bound (module docstring) is preserved, and the
    surviving set is <= k rows AT ANY INPUT PARTITION COUNT — the
    broadcast to pass 2 is bounded by k, not k x n_partitions.
    """
    summed = (
        misra_gries_candidates(df, key_col, k)
        .groupBy(key_col)
        .agg(F.sum("_w").alias("_w"))
    )
    # d = (k+1)-th largest merged weight (0 when fewer than k+1 keys
    # survive pass 1 — nothing to reduce). The global window sorts
    # sketch rows only: <= k x n_partitions of them, never input rows.
    d = (
        summed.select(
            F.col("_w").alias("_d"),
            F.row_number()
            .over(Window.orderBy(F.desc("_w")))
            .alias("_rn"),
        )
        .filter(F.col("_rn") == k + 1)
        .select("_d")
    )
    return (
        summed.join(
            F.broadcast(d.groupBy().agg(F.coalesce(F.max("_d"), F.lit(0)).alias("_d"))),
            how="cross",
        )
        .filter(F.col("_w") > F.col("_d"))
        .select(key_col)
    )


def exact_heavy_hitters(
    df: DataFrame,
    key_col: str,
    *,
    min_count: int,
    k: int = 2048,
    count_alias: str = "n",
    total: int | None = None,
) -> DataFrame:
    """All keys whose EXACT count >= min_count, computed without
    shuffling the full key space (see module docstring).

    Exactness requires min_count > N/(k+1); this is CHECKED (one
    count job when `total` isn't supplied — footer-bound on a plain
    parquet scan) and violation raises rather than silently returning
    a subset. Size k for the data: k >= N/min_count (+ headroom).
    """
    n_total = df.count() if total is None else total
    if min_count <= n_total / (k + 1):
        raise ValueError(
            f"exactness violated: min_count={min_count} must exceed "
            f"N/(k+1)={n_total}/{k + 1}={n_total / (k + 1):.1f}; raise k to "
            f">= {math.ceil(n_total / min_count)} (plus headroom) or raise "
            "min_count"
        )
    cand = merged_candidates(df, key_col, k).withColumnRenamed(key_col, "_ck")
    # null-safe semi-join: a NULL heavy key must survive to the exact
    # recount (plain equi-join would drop it)
    return (
        df.join(
            F.broadcast(cand), F.col(key_col).eqNullSafe(F.col("_ck")), "semi"
        )
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias(count_alias))
        .filter(F.col(count_alias) >= min_count)
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketches — Bar-Yossef et al. 2002,
# the theta-sketch family (Apache DataSketches — public designs).
#
# Spark's own approx_count_distinct is HLL++ and answers only "how
# many distinct" for the groups you aggregated; its sketch state is
# not exposed, so you cannot ask the questions a corpus audit needs:
# how many distinct users appear in BOTH the train and eval segments?
# What is the Jaccard overlap of two crawls' URL spaces? KMV keeps
# the k smallest distinct 64-bit hashes of a set: that retained
# sample IS the sketch, it is mergeable (the k smallest of A∪B are a
# subset of the union of the two sketches), and thresholded
# intersection (theta style) gives set algebra with relative error
# ~1/sqrt(k).
#
# Shuffle story at 100 TB: pass 1 reduces each input partition to
# <= k hash rows per segment with NO shuffle of input rows
# (mapInPandas fold, same justification as Misra-Gries above: the
# fold is inherently stateful per partition and vectorized via
# numpy); the global merge shuffles sketch rows only (<= k x
# n_partitions per segment) and re-truncates to k. The final sketch
# is PARTITIONING-INVARIANT — the k smallest distinct hashes of a set
# do not depend on how the set was split — which the tests pin by
# comparing sketches computed at different partition counts.
# ---------------------------------------------------------------------------

# xxhash64 is signed; shift into [0, 2^64) then to (0, 1]. The kth
# smallest hash of n uniform draws sits near k/n, so est = (k-1)/theta.
_HASH_SPAN = float(2**64)


def _theta(h_col):
    """Normalized position of a raw xxhash64 value in (0, 1]."""
    return (h_col.cast("double") + float(2**63) + 1.0) / _HASH_SPAN


def kmv_sketch(
    df: DataFrame, key_col: str, k: int, *, seg_cols: list[str] | None = None
) -> DataFrame:
    """KMV sketch rows (seg_cols..., _h): the k smallest DISTINCT
    xxhash64 values of key_col, per segment (global when seg_cols is
    empty). Deterministic and partitioning-invariant.

    NULL keys hash to xxhash64's seed constant, so NULL contributes
    exactly one distinct value — the same contract a COUNT(DISTINCT)
    with null included would give.
    """
    import numpy as np
    import pandas as pd

    seg_cols = list(seg_cols or [])
    hashed = df.select(
        *seg_cols, F.xxhash64(F.col(key_col)).alias("_h")
    )
    out_schema = hashed.schema

    def fold(batches):
        # per-partition: segment -> sorted np.array of <= k smallest
        # distinct hashes; each batch folds via vectorized union1d.
        state: dict = {}
        for pdf in batches:
            if seg_cols:
                grouped = pdf.groupby(seg_cols, dropna=False, sort=False)["_h"]
                items = [(seg, grp.to_numpy()) for seg, grp in grouped]
            else:
                items = [((), pdf["_h"].to_numpy())]
            for seg, arr in items:
                merged = np.union1d(state.get(seg, arr[:0]), arr)
                state[seg] = merged[:k]
        for seg, arr in state.items():
            seg = seg if isinstance(seg, tuple) else (seg,)
            out = {c: [v] * len(arr) for c, v in zip(seg_cols, seg)}
            out["_h"] = arr
            yield pd.DataFrame(out)

    cand = hashed.mapInPandas(fold, out_schema).dropDuplicates(
        seg_cols + ["_h"]
    )
    # global re-truncation over candidate rows only: the window sorts
    # <= k x n_partitions sketch rows per segment, never input rows.
    w = Window.partitionBy(*[F.col(c) for c in seg_cols]).orderBy("_h")
    return (
        cand.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def kmv_distinct_estimate(
    sketch: DataFrame, k: int, *, seg_cols: list[str] | None = None
) -> DataFrame:
    """(seg_cols..., n_distinct_est) from KMV sketch rows.

    A segment whose sketch holds fewer than k hashes retained EVERY
    distinct hash — the answer is exact. A full sketch estimates
    (k-1)/theta with theta the normalized kth-smallest hash
    (relative error ~1/sqrt(k-2))."""
    seg_cols = list(seg_cols or [])
    agg = sketch.groupBy(*[F.col(c) for c in seg_cols]).agg(
        F.count(F.lit(1)).alias("_n"), F.max("_h").alias("_kth")
    )
    return agg.select(
        *seg_cols,
        F.when(F.col("_n") < k, F.col("_n").cast("double"))
        .otherwise((F.lit(float(k - 1))) / _theta(F.col("_kth")))
        .alias("n_distinct_est"),
    )


def kmv_merge(a: DataFrame, b: DataFrame, k: int, *, seg_cols: list[str] | None = None) -> DataFrame:
    """KMV sketch of the UNION of the two sketched sets: the k
    smallest of A∪B are a subset of sketch(A) ∪ sketch(B), so merging
    is dedup + re-truncate over sketch rows only (2k per segment)."""
    seg_cols = list(seg_cols or [])
    merged = a.unionByName(b).dropDuplicates(seg_cols + ["_h"])
    w = Window.partitionBy(*[F.col(c) for c in seg_cols]).orderBy("_h")
    return (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def kmv_set_estimates(a: DataFrame, b: DataFrame, k: int) -> DataFrame:
    """One row of theta-style set algebra over two global KMV
    sketches: (union_est, intersection_est, jaccard_est).

    Theta intersection: cut both sketches at theta = min(theta_a,
    theta_b) — below the cut each sketch is a uniform hash SAMPLE of
    its set with known inclusion probability theta — then
    |A' ∩ B'| / theta estimates |A ∩ B|. When neither sketch filled
    up (both exact), the cut is +inf and every answer is exact.
    Estimates are doubles; callers round as needed.
    """
    # cut = min over FULL sketches of the kth-smallest raw hash;
    # exact (non-full) sketches impose no cut.
    def stats(s, tag):
        return s.groupBy().agg(
            F.count(F.lit(1)).alias(f"_n_{tag}"),
            F.max("_h").alias(f"_kth_{tag}"),
        )

    a_stats, b_stats = stats(a, "a"), stats(b, "b")
    cut_row = a_stats.join(b_stats, how="cross").select(
        F.least(
            F.when(F.col("_n_a") >= k, F.col("_kth_a")),
            F.when(F.col("_n_b") >= k, F.col("_kth_b")),
        ).alias("_cut")  # NULL when both sketches are exact
    )

    # A'/B': sketch rows at or below the cut (whole sketch when exact).
    def below(s, cut):
        return s.join(F.broadcast(cut), how="cross").filter(
            F.col("_cut").isNull() | (F.col("_h") <= F.col("_cut"))
        )

    a_cut, b_cut = below(a, cut_row), below(b, cut_row)
    inter_n = a_cut.join(b_cut.select("_h"), on="_h", how="semi").count()
    a_n, b_n = a_cut.count(), b_cut.count()
    cut_val = cut_row.collect()[0]["_cut"]
    if cut_val is None:
        theta = 1.0
        union_est = float(a_n + b_n - inter_n)
        inter_est = float(inter_n)
    else:
        theta = (float(cut_val) + float(2**63) + 1.0) / _HASH_SPAN
        # sampled union size below the cut, scaled back up
        union_est = (a_n + b_n - inter_n) / theta
        inter_est = inter_n / theta
    jaccard = (inter_n / (a_n + b_n - inter_n)) if (a_n + b_n - inter_n) else 0.0
    spark = a.sparkSession
    from idhub_spark.session import literal_frame

    # JVM literal, not createDataFrame (r19): the pickled-RDD path
    # parallelizes even this 1-row frame over defaultParallelism
    # Python slices — the literal_frame discipline every other
    # control-plane frame in the engine already follows
    return literal_frame(
        spark,
        [(float(union_est), float(inter_est), float(jaccard))],
        "union_est double, intersection_est double, jaccard_est double",
    )
