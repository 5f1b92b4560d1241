"""Frequency sketches: EXACT heavy hitters without a full-key shuffle.

The naive heavy-hitter plan — groupBy(key).count().filter(n >= t) —
shuffles one row per DISTINCT key. At 100 TB that key space (users,
URLs, n-grams) can be billions of rows of shuffle for an answer that
keeps only a handful. The classic two-pass fix (Misra-Gries 1982 +
the mergeability result of Agarwal et al., PODS'12 — public
algorithms):

  pass 1  per-partition Misra-Gries sketch with k counters, emitted
          as candidate keys only (<= k rows per partition, NO shuffle)
  pass 2  exact recount restricted to the candidate set via a
          broadcast semi-join; threshold filter on the exact counts

Union-of-partitions guarantee: within one partition each MG reduction
subtracts its decrement from >= k+1 counters, so the total decrement
is <= n_p/(k+1); an item with partition count > n_p/(k+1) therefore
survives that partition's sketch. An item missing from EVERY
partition's candidates thus has global count <= sum(n_p)/(k+1) =
N/(k+1): with threshold t > N/(k+1) the candidate union is a strict
superset of the true heavy hitters, and pass 2's exact counts make
the final answer EXACT and deterministic under any partitioning (the
candidate SET varies with partitioning; the thresholded result does
not — extra candidates are filtered by their exact counts).

Python is justified here (the one criterion in operators/multimodal):
the sketch is inherently stateful per partition and Arrow-batched —
each batch is folded via a vectorized value_counts, never a Python
row loop. The reference has no sketch surface; this extends the
profile/report family (SURVEY.md §2.6) the way a training-data
pipeline needs at corpus scale.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries_candidates(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries candidate keys (<= k per partition).

    Arrow-batched: each incoming batch folds into the counter table
    via pandas value_counts; when the table exceeds k counters the MG
    reduction subtracts the (k+1)-th largest count from every counter
    and drops the non-positive ones (removes >= (k+1)*dec total mass,
    which is what bounds the per-partition error at n_p/(k+1)).
    """
    import pandas as pd

    out_schema = df.select(key_col).schema

    def sketch(batches):
        counters: dict = {}
        for pdf in batches:
            for key, c in pdf[key_col].value_counts().items():
                counters[key] = counters.get(key, 0) + int(c)
            if len(counters) > k:
                dec = sorted(counters.values(), reverse=True)[k]
                counters = {key: c - dec for key, c in counters.items() if c > dec}
        if counters:
            yield pd.DataFrame({key_col: list(counters.keys())})

    return df.select(key_col).mapInPandas(sketch, out_schema)


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
    cand = misra_gries_candidates(df, key_col, k).distinct()
    return (
        df.join(F.broadcast(cand), key_col, "semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias(count_alias))
        .filter(F.col(count_alias) >= min_count)
    )
