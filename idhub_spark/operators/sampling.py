"""Deterministic sampling / splitting operators for training-data
pipelines.

All selection is hash-based (md5 of a stable key), never RNG-based:
the same row lands in the same split on every run, any cluster size,
any partitioning — the property that makes dataset versions
reproducible. (Spark's randomSplit is partition-order-dependent;
that's a bug factory for training pipelines.)

hash_bucket maps a key uniformly to [0, buckets) via the first 8 hex
chars of md5 — available identically in DuckDB, so every operator
here is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_bucket(key: Column, buckets: int = 100, salt: str = "") -> Column:
    """Uniform deterministic bucket in [0, buckets)."""
    h = F.md5(F.concat(F.lit(salt), key.cast("string")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % buckets).cast("int")


def train_test_split(
    df: DataFrame, key: str, *, test_pct: int = 20, salt: str = "split"
) -> tuple[DataFrame, DataFrame]:
    """Deterministic holdout: rows whose hash bucket < test_pct go to
    test. Same key -> same side, forever (leakage-safe: split on the
    DOCUMENT/subject key, not the row, so derived rows stay together).
    """
    b = hash_bucket(F.col(key), 100, salt)
    return df.filter(b >= test_pct), df.filter(b < test_pct)


def stratified_take(
    df: DataFrame, *, strata: str, key: str, n_per_stratum: int, salt: str = "strat"
) -> DataFrame:
    """Exactly-n-per-stratum deterministic sample: rank rows within
    each stratum by their hash (a stable pseudo-random order) and keep
    the first n. One window shuffle on the stratum key."""
    h = F.md5(F.concat(F.lit(salt), F.col(key).cast("string")))
    w = Window.partitionBy(strata).orderBy(h, F.col(key))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_stratum)
        .drop("_rn")
    )


def pack_sequences(
    df: DataFrame,
    *,
    key: str,
    token_count: Column,
    n_shards: int = 8,
    seq_len: int = 2048,
    salt: str = "pack",
) -> DataFrame:
    """GPT-style concat-and-chunk sequence packing ASSIGNMENT: map
    each document to its position in the packed training stream
    without materializing the stream.

    Documents are sharded by hash (reproducible on any cluster), given
    a stable pseudo-random order within the shard (hash order — the
    'shuffle' a training run wants, minus the RNG), and laid
    end-to-end; a document occupying token offsets
    [offset, offset + n_tokens) of its shard's stream lands in
    training sequence seq_id = offset // seq_len at offset_in_seq =
    offset % seq_len (documents may span sequence boundaries, exactly
    like GPT-style packing).

    Scale: ONE window (cumulative token sum) per shard — shards are
    independent, so the only shuffle is the repartition-by-shard that
    the window needs, and each shard's running sum is a single
    ordered pass. The writer that materializes token shards downstream
    consumes (shard, seq_id, offset_in_seq) as its layout.
    """
    shard = hash_bucket(F.col(key), n_shards, salt)
    order = F.md5(F.concat(F.lit(salt + "o"), F.col(key).cast("string")))
    w = (
        Window.partitionBy("shard")
        .orderBy(order, F.col(key))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offset = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("bigint")
    return (
        df.select(
            F.col(key),
            shard.alias("shard"),
            token_count.cast("bigint").alias("n_tokens"),
        )
        .withColumn("offset", offset)
        .select(
            key,
            "shard",
            # integer div, not double-div-then-cast: exact at any offset
            F.expr(f"offset div {seq_len}").alias("seq_id"),
            (F.col("offset") % seq_len).alias("offset_in_seq"),
            "n_tokens",
        )
    )


def downsample_majority(
    df: DataFrame, *, label: str, key: str, keep_pct: dict[str, int], salt: str = "ds"
) -> DataFrame:
    """Class rebalancing: per-label deterministic keep percentage
    (e.g. {'en': 10} keeps ~10% of 'en' rows, everything else full).
    A pure filter — no shuffle at all."""
    b = hash_bucket(F.col(key), 100, salt)
    cond = F.lit(True)
    for lbl, pct in keep_pct.items():
        cond = F.when(F.col(label) == lbl, b < pct).otherwise(cond)
    return df.filter(cond)
