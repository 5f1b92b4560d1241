"""Temporal join queries: as-of join and bounded interval join over
the events stream (custom operators Spark lacks natively; see
operators/temporal.py for the scale analysis).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from idhub_spark.operators.temporal import asof_join, interval_join
from idhub_spark.queries import query, tables


@query(
    "asof_last_click",
    """
    WITH errors AS (
      SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'error'),
    clicks AS (
      SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'click')
    SELECT e.event_id, e.user_id, e.ts,
           c.value AS value_asof, c.event_id AS event_id_asof
    FROM errors e
    ASOF LEFT JOIN clicks c
      ON e.user_id = c.user_id AND e.ts >= c.ts
    """,
    doc="As-of join: each error event picks the user's most recent "
    "click at-or-before it. Spark side is the union+window carry "
    "(one shuffle, linear scan) — the declarative equivalent of a "
    "sort-merge as-of; DuckDB oracle uses its native ASOF JOIN.",
)
def asof_last_click(spark, sf_dir):
    t = tables(spark, sf_dir, "events")
    e = t["events"]
    errors = e.filter(F.col("event_type") == "error").select(
        "user_id", "ts", "event_id", "value"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "value"
    )
    out = asof_join(
        errors, clicks, on="user_id", right_values=["value", "event_id"]
    )
    return out.select("event_id", "user_id", "ts", "value_asof", "event_id_asof")


@query(
    "interval_followup_purchases",
    """
    SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
           CAST(p.ts AS TIMESTAMP) AS purchase_ts
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts
     AND p.ts <= c.ts + INTERVAL 30 MINUTE
    """,
    doc="Bounded interval join: purchases within 30 minutes after a "
    "click by the same user. Time-bucket equi-join prefilter turns "
    "the range predicate into candidate buckets; the exact BETWEEN "
    "runs on candidates only.",
)
def interval_followup_purchases(spark, sf_dir):
    t = tables(spark, sf_dir, "events")
    e = t["events"]
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    out = interval_join(
        clicks.withColumnRenamed("user_id", "user_id"),
        purchases.withColumnRenamed("p_user", "user_id"),
        on="user_id",
        left_ts="ts",
        right_ts="p_ts",
        max_before_seconds=0,
        max_after_seconds=1800,
    )
    return out.select(
        "click_id",
        "purchase_id",
        "user_id",
        F.col("p_ts").alias("purchase_ts"),
    )


@query(
    "funnel_conversion",
    """
    WITH clicks AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
    converted AS (
      SELECT DISTINCT c.event_id
      FROM clicks c JOIN events p
        ON p.event_type = 'purchase' AND p.user_id = c.user_id
       AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE)
    SELECT COUNT(*) AS n_clicks,
           (SELECT COUNT(*) FROM converted) AS n_converted,
           CAST((SELECT COUNT(*) FROM converted) AS DOUBLE) / COUNT(*) AS conversion_rate
    FROM clicks
    """,
    doc="Funnel step conversion: share of clicks followed by a "
    "purchase within 30 minutes — the interval join feeding a "
    "two-level aggregate (sessionized product analytics shape).",
)
def funnel_conversion(spark, sf_dir):
    from idhub_spark.operators.temporal import interval_join

    t = tables(spark, sf_dir, "events")
    e = t["events"]
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("user_id"), F.col("ts").alias("p_ts")
    )
    converted = (
        interval_join(
            clicks, purchases, on="user_id", left_ts="ts", right_ts="p_ts",
            max_before_seconds=0, max_after_seconds=1800,
        )
        .select("click_id")
        .distinct()
    )
    counts = clicks.agg(F.count(F.lit(1)).alias("n_clicks"))
    conv = converted.agg(F.count(F.lit(1)).alias("n_converted"))
    return counts.crossJoin(conv).select(
        "n_clicks",
        "n_converted",
        (F.col("n_converted").cast("double") / F.col("n_clicks")).alias("conversion_rate"),
    )


@query(
    "cohort_retention",
    """
    WITH act AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events),
    coh AS (SELECT user_id, min(wk) AS cohort_week FROM act GROUP BY user_id)
    SELECT c.cohort_week,
           CAST(datediff('day', c.cohort_week, a.wk) // 7 AS INTEGER) AS week_offset,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
    FROM act a JOIN coh c ON c.user_id = a.user_id
    GROUP BY c.cohort_week, week_offset
    """,
    doc="Cohort retention matrix — the product-analytics staple over "
    "the events stream: users cohorted by first-active week "
    "(date_trunc week, UTC-pinned session so both engines truncate "
    "identical wall times), counted distinct per (cohort_week, "
    "week_offset). Plan: one distinct on (user, week) shrinks the "
    "stream before anything else, cohort = min-week per user, offset "
    "by exact day arithmetic (floor(datediff/7) — week-difference "
    "functions disagree across engines on year boundaries). Shuffles "
    "only user-keyed aggregates; the retention matrix is "
    "weeks x weeks tiny.",
)
def cohort_retention(spark, sf_dir):
    t = tables(spark, sf_dir, "events")
    act = (
        t["events"]
        .select("user_id", F.date_trunc("week", F.col("ts")).alias("wk"))
        .distinct()
    )
    coh = act.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    return (
        act.join(coh, "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.floor(F.datediff(F.col("wk"), F.col("cohort_week")) / F.lit(7))
            .cast("int")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )
