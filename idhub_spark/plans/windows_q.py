"""Window-function queries (SURVEY.md §2.7-§2.8) + sessionization.

The reference uses windows only for ranking/top-1 and global distinct
flags; sessionization is added as the batch twin of the streaming
gap-session operator (streaming/sessions.py). All windows partition
on keys the data is already grouped by, so at scale each window is
one shuffle on its partition key; running totals use the exact
scaled-int sum so partition order never affects the result.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from idhub_spark.plans._util import SCALE
from idhub_spark.queries import query, tables

_SCALE_D = float(10**SCALE)


@query(
    "global_distinct_flag",
    """
    WITH sub AS (SELECT DISTINCT user_id, event_type FROM events WHERE value > 140)
    SELECT s.user_id, s.event_type, g.n_users_total > 1 AS conflict_flag
    FROM sub s CROSS JOIN (SELECT COUNT(DISTINCT user_id) AS n_users_total FROM sub) g
    """,
    doc="W1/W2: COUNT(DISTINCT) OVER () global-flag pattern "
    "(01-schema.sql:414-419,441-452). Spark lacks distinct window "
    "aggregates — and an empty-partition window (collect_set over ()) "
    "funnels EVERY row through one task, the one plan shape that "
    "cannot scale. Instead: the global distinct count is a 1-row "
    "aggregate broadcast-joined back (the same shape as the DuckDB "
    "oracle's scalar cross join) — distributed agg + map-side join, "
    "zero single-partition stages.",
)
def global_distinct_flag(spark, sf_dir):
    t = tables(spark, sf_dir, "events")
    sub = (
        t["events"].filter(F.col("value") > 140).select("user_id", "event_type").distinct()
    )
    total = sub.agg(F.countDistinct("user_id").alias("_n_users_total"))
    return sub.crossJoin(F.broadcast(total)).select(
        "user_id",
        "event_type",
        (F.col("_n_users_total") > 1).alias("conflict_flag"),
    )


@query(
    "oldest_pick",
    """
    SELECT user_id, event_id AS first_event_id, ts AS first_ts, event_type AS first_type
    FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    doc="W3: oldest-per-key pick with deterministic (ts, id) tie-break "
    "(identity_resolution.py:180-183).",
)
def oldest_pick(spark, sf_dir):
    t = tables(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        t["events"]
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("first_event_id"),
            F.col("ts").alias("first_ts"),
            F.col("event_type").alias("first_type"),
        )
    )


@query(
    "running_value_total",
    f"""
    SELECT event_id, user_id, ts,
           CAST(CAST(SUM(CAST(round(value * {10**SCALE}.0) AS BIGINT))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS DOUBLE)
             / {10**SCALE}.0 AS running_total
    FROM events
    WHERE user_id < 10
    """,
    doc="Running total per user — rows-frame cumulative sum, exact "
    "scaled-int arithmetic so the frame order is the only order that "
    "matters (training-pipeline extension; reference has no frames).",
)
def running_value_total(spark, sf_dir):
    t = tables(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    scaled = F.round(F.col("value") * _SCALE_D, 0).cast("bigint")
    return (
        t["events"]
        .filter(F.col("user_id") < 10)
        .select(
            "event_id",
            "user_id",
            "ts",
            (F.sum(scaled).over(w).cast("double") / F.lit(_SCALE_D)).alias(
                "running_total"
            ),
        )
    )


@query(
    "sessionize",
    """
    WITH gaps AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE OR
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    sess AS (
      SELECT user_id, ts, event_id,
             CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no
      FROM gaps)
    SELECT user_id, session_no, COUNT(*) AS n_events,
           min(ts) AS session_start, max(ts) AS session_end
    FROM sess GROUP BY user_id, session_no
    """,
    doc="Gap-based sessionization (30-min inactivity): the batch twin "
    "of the streaming session-window operator (§2.12 extension). "
    "lag -> boundary flag -> cumulative session number -> per-session agg.",
)
def sessionize(spark, sf_dir):
    t = tables(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag("ts").over(wo)
    new_session = (
        F.when(
            # microsecond-precision gap: cast("long") would truncate to
            # seconds and misclassify a 1800.4s gap as same-session.
            # cast("timestamp") first so a TIMESTAMP_NTZ ts is legal.
            prev.isNull()
            | (
                F.unix_micros(F.col("ts").cast("timestamp"))
                - F.unix_micros(prev.cast("timestamp"))
                > 1800 * 1_000_000
            ),
            1,
        ).otherwise(0)
    )
    return (
        t["events"]
        .withColumn("new_session", new_session)
        .withColumn("session_no", F.sum("new_session").over(wrun))
        .groupBy("user_id", "session_no")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


@query(
    "recent_changes_topk",
    """
    SELECT event_id, ts, user_id, event_type
    FROM events
    ORDER BY ts DESC, event_id DESC
    LIMIT 100
    """,
    doc="§2.8: ORDER BY created_at DESC LIMIT k "
    "(01-schema.sql:716-728) — Spark plans a TakeOrderedAndProject, "
    "no global sort.",
)
def recent_changes_topk(spark, sf_dir):
    t = tables(spark, sf_dir, "events")
    return (
        t["events"]
        .select("event_id", "ts", "user_id", "event_type")
        .orderBy(F.desc("ts"), F.desc("event_id"))
        .limit(100)
    )


@query(
    "hourly_rollup",
    f"""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type,
           COUNT(*) AS n,
           CAST(CAST(SUM(CAST(round(value * {10**SCALE}.0) AS BIGINT)) AS BIGINT) AS DOUBLE) / {10**SCALE}.0 AS total_value
    FROM events
    GROUP BY hour, event_type
    """,
    doc="Tumbling-window aggregate — the batch twin of the streaming "
    "windowed agg (Structured Streaming uses window(ts, '1 hour') with "
    "a watermark; semantics identical on closed windows).",
)
def hourly_rollup(spark, sf_dir):
    t = tables(spark, sf_dir, "events")
    scaled = F.round(F.col("value") * _SCALE_D, 0).cast("bigint")
    return (
        t["events"]
        .groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(scaled).cast("double") / F.lit(_SCALE_D)).alias("total_value"),
        )
    )


@query(
    "sliding_window_rollup",
    f"""
    WITH slid AS (
      SELECT make_timestamp(((epoch_us(ts) // 900000000) - k) * 900000000)
               AS window_start,
             event_type, value
      FROM events, UNNEST(range(0, 4)) t(k))
    SELECT window_start,
           window_start + INTERVAL 1 HOUR AS window_end,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(CAST(SUM(CAST(round(value * {10**SCALE}.0) AS BIGINT))
                AS BIGINT) AS DOUBLE) / {10**SCALE}.0 AS total_value
    FROM slid
    GROUP BY window_start, event_type
    """,
    doc="SLIDING-window aggregate — window(ts, '1 hour', '15 minutes'): "
    "every event lands in duration/slide = 4 overlapping windows, "
    "epoch-aligned exactly as Spark aligns slides. The overlap factor "
    "is a fixed pre-aggregation fanout absorbed by map-side combine "
    "(shuffle carries one row per window x type, never per event), so "
    "the plan scales with distinct windows, not corpus x 4. Oracle "
    "derives each event's 4 window starts with the same integer "
    "epoch-microsecond arithmetic (floor-div by the 15-min slide), so "
    "a hash match pins Spark's slide alignment, both inclusive "
    "boundaries, and the scaled-int64 sums. Batch twin of the "
    "streaming windowed family (§2.12); the streaming form only adds "
    "a watermark.",
)
def sliding_window_rollup(spark, sf_dir):
    t = tables(spark, sf_dir, "events")
    scaled = F.round(F.col("value") * _SCALE_D, 0).cast("bigint")
    return (
        t["events"]
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(scaled).cast("double") / F.lit(_SCALE_D)).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )
