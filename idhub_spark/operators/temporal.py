"""Temporal join operators Spark lacks natively: as-of join and
bounded interval (range) join.

As-of join — "for each left row, the most recent right row at or
before its timestamp, per key" — is implemented with the union+window
technique rather than an inequality join: tag both sides, union,
sort within key by (ts, tag) and carry the last seen right-side
payload forward with last_value(ignorenulls) over preceding rows.

Why this scales: an inequality join (l.ts >= r.ts) is a broadcast
nested loop (quadratic per key); the union+window is ONE shuffle on
the key and a linear within-partition scan — the same plan shape a
hand-written sort-merge as-of would produce, but expressed
declaratively so AQE still manages partitioning. Skewed keys hit the
window sort, which spills; salting does not apply (the window needs
total per-key order), so extreme single-key skew is handled by
time-bucketing the key first (bucket boundary rows duplicated into
the next bucket carry the last value across).

Interval join — pairs within a bounded window — buckets both sides
by floor(ts / width) and joins each left bucket to its own and the
previous right bucket, turning the range predicate into an equi-join
prefilter (standard time-bucketing; the residual BETWEEN filter runs
on candidate pairs only). Bound = the bucket width; at scale choose
width = max interval so each row lands in exactly 2 candidate
buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_values: list[str],
    tolerance_seconds: int | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row: the latest right row with
    right_ts <= left_ts on the same key (optionally within
    tolerance). Right payload columns come back as <col><suffix>,
    NULL when no prior right row exists."""
    lcols = left.columns
    l_tag = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*lcols).alias("_l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_rv_{c}") for c in right_values],
        F.lit(None).cast("timestamp").alias("_r_ts"),
    )
    r_tag = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_tag.schema["_l"].dataType).alias("_l"),
        *[F.col(c).alias(f"_rv_{c}") for c in right_values],
        F.col(right_ts).cast("timestamp").alias("_r_ts"),
    )
    # right rows sort before left rows at equal ts (_side 0 < 1), so
    # "at or before" includes same-timestamp right rows. The payload
    # columns complete the sort to a TOTAL order: without them, two
    # right rows sharing (key, ts) would tie and last(ignorenulls)
    # would carry whichever the shuffle happened to order second —
    # partition-order nondeterminism. With the tie-break, the carried
    # row is the greatest payload tuple, on any partitioning.
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side", *[f"_rv_{c}" for c in right_values])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = l_tag.unionByName(r_tag)
    carried = unioned.select(
        "_k",
        "_ts",
        "_side",
        "_l",
        *[
            F.last(f"_rv_{c}", ignorenulls=True).over(w).alias(f"_cv_{c}")
            for c in right_values
        ],
        F.last("_r_ts", ignorenulls=True).over(w).alias("_carried_ts"),
    )
    out = carried.filter(F.col("_side") == 1)
    if tolerance_seconds is not None:
        # compare at MICROsecond precision: cast("long") truncates to
        # whole seconds, which silently widens the tolerance by up to
        # a second at the boundary (real event times are sub-second).
        # cast to TIMESTAMP first so a TIMESTAMP_NTZ input is legal.
        in_tol = (
            F.col("_carried_ts").isNotNull()
            & (
                F.unix_micros(F.col("_ts").cast("timestamp"))
                - F.unix_micros(F.col("_carried_ts"))
                <= tolerance_seconds * 1_000_000
            )
        )
        out = out.select(
            "_k", "_ts", "_l",
            *[F.when(in_tol, F.col(f"_cv_{c}")).alias(f"_cv_{c}") for c in right_values],
        )
    return out.select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        *[F.col(f"_cv_{c}").alias(f"{c}{suffix}") for c in right_values],
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    max_before_seconds: int = 0,
    max_after_seconds: int = 60,
    suffix: str = "_r",
) -> DataFrame:
    """Pairs (l, r) on the same key with
    l.ts - max_before <= r.ts <= l.ts + max_after, via time-bucket
    equi-join prefilter + residual range filter. Right columns whose
    names collide with a left column (e.g. both sides' default 'ts')
    come back as <col><suffix>, so the output is never ambiguous."""
    # Bucket at MICROsecond granularity — the same unit as the residual
    # predicate below (a second-granularity bucket with a microsecond
    # residual was internally inconsistent), and NTZ-proof: cast to
    # TIMESTAMP before unix_micros so a TIMESTAMP_NTZ input is legal.
    width_us = max(max_before_seconds + max_after_seconds, 1) * 1_000_000
    l_b = left.withColumn(
        "_lb",
        F.floor(F.unix_micros(F.col(left_ts).cast("timestamp")) / F.lit(width_us)).cast("long"),
    )
    r_b = right.withColumn(
        "_rb",
        F.floor(F.unix_micros(F.col(right_ts).cast("timestamp")) / F.lit(width_us)).cast("long"),
    )
    # each left bucket needs right buckets {b-1, b, b+1} to cover the
    # asymmetric window; explode the LEFT side 3x (cheaper side may
    # vary; at scale explode the smaller input)
    cand = l_b.withColumn(
        "_probe", F.explode(F.array(F.col("_lb") - 1, F.col("_lb"), F.col("_lb") + 1))
    )
    # residual predicate at MICROsecond precision — the bucket
    # prefilter may truncate to seconds (coverage is unaffected:
    # probes span ±1 bucket), but the exact range test must not, or a
    # pair whose true gap is e.g. 1800.4s passes a 1800s window
    lus = F.unix_micros(F.col(f"l.{left_ts}").cast("timestamp"))
    rus = F.unix_micros(F.col(f"r.{right_ts}").cast("timestamp"))
    # keep the left image of the join key (they are equal by
    # construction); suffix right columns that collide with left names
    keep = [F.col(f"l.{c}").alias(c) for c in left.columns] + [
        F.col(f"r.{c}").alias(f"{c}{suffix}" if c in left.columns else c)
        for c in right.columns
        if c != on
    ]
    return (
        cand.alias("l")
        .join(
            r_b.alias("r"),
            (F.col("l._probe") == F.col("r._rb")) & (F.col(f"l.{on}") == F.col(f"r.{on}")),
        )
        .filter(
            (rus >= lus - max_before_seconds * 1_000_000)
            & (rus <= lus + max_after_seconds * 1_000_000)
        )
        .select(*keep)
    )
