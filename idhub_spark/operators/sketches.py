"""Frequency sketches: EXACT heavy hitters without a full-key shuffle.

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
