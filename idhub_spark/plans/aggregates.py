"""Aggregation queries (SURVEY.md §2.6, A1-A11 analogs).

All single-pass hash aggregates: Spark computes map-side partial
aggregates before the shuffle, so the exchange carries only
(group-key, partial-state) — at 100 TB the shuffle volume is bounded
by group cardinality, not row count. collect_set results are
sort_array'd for cross-engine determinism, then concat_ws'd because
array round-tripping through pandas differs between engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from idhub_spark.plans._util import savg, sql_savg, sql_ssum, ssum
from idhub_spark.queries import query, tables


@query(
    "resolution_stats",
    f"""
    SELECT event_type AS action, COUNT(*) AS n, {sql_savg("value", "avg_value")}
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-03 00:00:00' AND ts < TIMESTAMP '2024-01-10 00:00:00'
    GROUP BY event_type
    """,
    doc="A1: resolution stats — count/avg by action with date-range "
    "filter (01-schema.sql:456-479).",
)
def resolution_stats(spark, sf_dir):
    t = tables(spark, sf_dir, "events")
    return (
        t["events"]
        .filter(
            (F.col("ts") >= F.lit("2024-01-03 00:00:00").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-10 00:00:00").cast("timestamp"))
        )
        .groupBy(F.col("event_type").alias("action"))
        .agg(F.count(F.lit(1)).alias("n"), savg(F.col("value"), "avg_value"))
    )


@query(
    "multi_type_subjects",
    """
    SELECT user_id,
           array_to_string(list_sort(list(DISTINCT event_type)), ',') AS id_types,
           COUNT(DISTINCT event_type) AS type_count
    FROM events
    GROUP BY user_id
    HAVING COUNT(DISTINCT event_type) > 3
    """,
    doc="A2: subjects with multiple identifier types — ARRAY_AGG "
    "DISTINCT + HAVING (01-schema.sql:482-503).",
)
def multi_type_subjects(spark, sf_dir):
    t = tables(spark, sf_dir, "events")
    return (
        t["events"]
        .groupBy("user_id")
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_set("event_type"))).alias("id_types"),
            F.countDistinct("event_type").alias("type_count"),
        )
        .filter(F.col("type_count") > 3)
    )


@query(
    "duplicate_subject_finder",
    """
    SELECT o_custkey,
           COUNT(DISTINCT o_orderpriority) AS n_priorities,
           array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',') AS priorities
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(DISTINCT o_orderpriority) >= 5
    """,
    doc="A3: duplicate-subject finder shape — group key, COUNT(DISTINCT)"
    " threshold, collected arrays (01-schema.sql:537-561).",
)
def duplicate_subject_finder(spark, sf_dir):
    t = tables(spark, sf_dir, "orders")
    return (
        t["orders"]
        .groupBy("o_custkey")
        .agg(
            F.countDistinct("o_orderpriority").alias("n_priorities"),
            F.concat_ws(",", F.sort_array(F.collect_set("o_orderpriority"))).alias(
                "priorities"
            ),
        )
        .filter(F.col("n_priorities") >= 5)
    )


@query(
    "change_stats",
    """
    SELECT event_type AS table_name, COUNT(*) AS n_changes,
           COUNT(DISTINCT user_id) AS n_records,
           min(ts) AS first_change, max(ts) AS last_change
    FROM events GROUP BY event_type
    """,
    doc="A4: change stats by table — counts, COUNT(DISTINCT), MIN/MAX "
    "timestamps (01-schema.sql:594-621).",
)
def change_stats(spark, sf_dir):
    t = tables(spark, sf_dir, "events")
    return (
        t["events"]
        .groupBy(F.col("event_type").alias("table_name"))
        .agg(
            F.count(F.lit(1)).alias("n_changes"),
            F.countDistinct("user_id").alias("n_records"),
            F.min("ts").alias("first_change"),
            F.max("ts").alias("last_change"),
        )
    )


@query(
    "per_center_summary",
    f"""
    SELECT o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
           {sql_savg("o_totalprice", "avg_price")}
    FROM orders GROUP BY o_orderpriority
    """,
    doc="A5: per-center summary — counts + conditional SUM(CASE WHEN) "
    "+ avg (view 01-schema.sql:689-701).",
)
def per_center_summary(spark, sf_dir):
    t = tables(spark, sf_dir, "orders")
    return (
        t["orders"]
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias(
                "n_finished"
            ),
            savg(F.col("o_totalprice"), "avg_price"),
        )
    )


@query(
    "subjects_by_source",
    f"""
    SELECT source, COUNT(*) AS n_docs, COUNT(DISTINCT lang) AS n_langs,
           {sql_savg("n_chars", "avg_chars")}
    FROM documents GROUP BY source
    """,
    doc="A6: subjects-by-source rollup (01-schema.sql:704-713) over the "
    "documents table.",
)
def subjects_by_source(spark, sf_dir):
    t = tables(spark, sf_dir, "documents")
    return (
        t["documents"]
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("lang").alias("n_langs"),
            savg(F.col("n_chars").cast("double"), "avg_chars"),
        )
    )


@query(
    "per_subject_review",
    """
    SELECT user_id,
           COUNT(DISTINCT event_type) AS n_types,
           COUNT(DISTINCT props) AS n_props,
           COUNT(*) AS n_events
    FROM events
    WHERE value > 50
    GROUP BY user_id
    """,
    doc="A7: review-view agg — per-subject COUNT(DISTINCT) pairs "
    "(01-schema.sql:627-646).",
)
def per_subject_review(spark, sf_dir):
    t = tables(spark, sf_dir, "events")
    return (
        t["events"]
        .filter(F.col("value") > 50)
        .groupBy("user_id")
        .agg(
            F.countDistinct("event_type").alias("n_types"),
            F.countDistinct("props").alias("n_props"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@query(
    "data_type_counts",
    """
    SELECT 'orders' AS data_type, COUNT(*) AS n FROM orders
    UNION ALL
    SELECT 'lineitem', COUNT(*) FROM lineitem
    UNION ALL
    SELECT 'events', COUNT(*) FROM events
    """,
    doc="A10/D4: UNION ALL of per-table counts "
    "(docs/example-queries.md:59-86).",
)
def data_type_counts(spark, sf_dir):
    t = tables(spark, sf_dir, "orders", "lineitem", "events")

    def one(name):
        return t[name].agg(F.count(F.lit(1)).alias("n")).select(
            F.lit(name).alias("data_type"), "n"
        )

    return one("orders").unionByName(one("lineitem")).unionByName(one("events"))


@query(
    "load_stats",
    f"""
    SELECT l_linestatus AS status,
           COUNT(*) AS rows_attempted,
           CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS rows_failed,
           CAST(SUM(CASE WHEN l_returnflag <> 'R' THEN 1 ELSE 0 END) AS BIGINT) AS rows_loaded,
           {sql_ssum("l_quantity", "total_qty")}
    FROM lineitem GROUP BY l_linestatus
    """,
    doc="A9/A11: batch load bookkeeping tallies in one pass — "
    "count(when(...)) per status (load_strategies.py:163-194).",
)
def load_stats(spark, sf_dir):
    t = tables(spark, sf_dir, "lineitem")
    return (
        t["lineitem"]
        .groupBy(F.col("l_linestatus").alias("status"))
        .agg(
            F.count(F.lit(1)).alias("rows_attempted"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias(
                "rows_failed"
            ),
            F.sum(F.when(F.col("l_returnflag") != "R", 1).otherwise(0)).alias(
                "rows_loaded"
            ),
            ssum(F.col("l_quantity"), "total_qty"),
        )
    )
