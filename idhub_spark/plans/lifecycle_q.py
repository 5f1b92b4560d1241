"""Lifecycle queries rounding out SURVEY.md §2: conflict summary
(A8), keyed semi-join lookup (S7/J9), curated fragment assembly
(P14), and the local_subject_ids center-migration merge (§2.10.5).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from idhub_spark.operators.local_ids import merge_local_subject_ids
from idhub_spark.queries import query, tables


@query(
    "conflict_summary",
    """
    WITH existing AS (
      SELECT c_name AS local_subject_id, c_nationkey AS center_id,
             'G-' || lpad(CAST(c_custkey AS VARCHAR), 9, '0') AS global_subject_id
      FROM customer),
    incoming AS (
      SELECT c_name AS local_subject_id,
             CASE WHEN c_custkey % 7 = 0 THEN c_nationkey + 1 ELSE c_nationkey END AS center_id,
             CASE WHEN c_custkey % 11 = 0 THEN 'G-X' || CAST(c_custkey AS VARCHAR)
                  ELSE 'G-' || lpad(CAST(c_custkey AS VARCHAR), 9, '0') END AS global_subject_id
      FROM customer)
    SELECT conflict_type, COUNT(*) AS n FROM (
      SELECT CASE WHEN i.center_id <> e.center_id THEN 'center_mismatch'
                  ELSE 'multi_gsid' END AS conflict_type
      FROM incoming i JOIN existing e ON i.local_subject_id = e.local_subject_id
      WHERE i.center_id <> e.center_id OR i.global_subject_id <> e.global_subject_id)
    GROUP BY conflict_type
    """,
    doc="A8: conflict counts by type (conflict_detector.py:184-198).",
)
def conflict_summary(spark, sf_dir):
    from idhub_spark.plans.identity_q import conflict_detection

    return (
        conflict_detection(spark, sf_dir)
        .groupBy("conflict_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "keyed_lookup_semi",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM customer c
                  WHERE c.c_custkey = o.o_custkey AND c.c_acctbal < 0)
    """,
    doc="S7/J9: the reference's batched IN-list natural-key lookup "
    "(batch_size=1000, load_strategies.py:501-586) as one semi-join — "
    "no batching; Catalyst broadcasts the filtered key set.",
)
def keyed_lookup_semi(spark, sf_dir):
    t = tables(spark, sf_dir, "orders", "customer")
    neg = t["customer"].filter(F.col("c_acctbal") < 0).select("c_custkey")
    return (
        t["orders"]
        .join(neg, F.col("o_custkey") == F.col("c_custkey"), "semi")
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "fragment_assembly",
    """
    WITH grouped AS (
      SELECT l_orderkey, l_linestatus,
             array_to_string(list_sort(list(DISTINCT l_partkey)), ',') AS ids
      FROM lineitem
      WHERE l_orderkey % 100 = 0
      GROUP BY l_orderkey, l_linestatus)
    SELECT l_orderkey,
           array_to_string(list_sort(list(l_linestatus || ':' || ids)), ';') AS samples
    FROM grouped GROUP BY l_orderkey
    """,
    doc="P14: curated per-subject fragment assembly — IDs grouped by "
    "sample_type into a nested map (data_processor.py:554-612); "
    "serialized to a sorted string for the cross-engine compare, the "
    "pipeline twin (redcap_sync.fragments) keeps the real map type.",
)
def fragment_assembly(spark, sf_dir):
    t = tables(spark, sf_dir, "lineitem")
    grouped = (
        t["lineitem"]
        .filter(F.col("l_orderkey") % 100 == 0)
        .groupBy("l_orderkey", "l_linestatus")
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_set("l_partkey"))).alias("ids")
        )
    )
    return grouped.groupBy("l_orderkey").agg(
        F.concat_ws(
            ";",
            F.sort_array(F.collect_list(F.concat_ws(":", "l_linestatus", "ids"))),
        ).alias("samples")
    )


@query(
    "local_ids_merge",
    """
    WITH cur AS (
      SELECT c_nationkey AS center_id, c_name AS local_subject_id,
             'name' AS identifier_type,
             'G-' || lpad(CAST(c_custkey AS VARCHAR), 9, '0') AS global_subject_id
      FROM customer WHERE c_custkey % 3 <> 0),
    inc AS (
      SELECT CASE WHEN c_custkey % 5 = 0 THEN c_nationkey + 1 ELSE c_nationkey END AS center_id,
             upper(c_name) AS local_subject_id,
             'name' AS identifier_type,
             CASE WHEN c_custkey % 7 = 0 THEN 'G-NEW' || CAST(c_custkey AS VARCHAR)
                  ELSE 'G-' || lpad(CAST(c_custkey AS VARCHAR), 9, '0') END AS global_subject_id
      FROM customer WHERE c_custkey % 3 <> 1),
    j AS (
      SELECT COALESCE(lower(i.local_subject_id), lower(c.local_subject_id)) AS k,
             i.center_id AS inc_center, i.local_subject_id AS inc_id,
             i.global_subject_id AS inc_gsid,
             c.center_id AS cur_center, c.local_subject_id AS cur_id,
             c.global_subject_id AS cur_gsid
      FROM inc i FULL OUTER JOIN cur c
        ON lower(i.local_subject_id) = lower(c.local_subject_id)
       AND i.identifier_type = c.identifier_type)
    SELECT CASE WHEN cur_gsid IS NULL THEN inc_center
                WHEN inc_gsid IS NULL THEN cur_center
                WHEN inc_center <> cur_center THEN inc_center
                WHEN inc_gsid <> cur_gsid THEN inc_center
                ELSE cur_center END AS center_id,
           COALESCE(CASE WHEN cur_gsid IS NULL OR inc_center <> cur_center
                              OR inc_gsid <> cur_gsid THEN inc_id END,
                    cur_id, inc_id) AS local_subject_id,
           'name' AS identifier_type,
           CASE WHEN cur_gsid IS NULL THEN inc_gsid
                WHEN inc_gsid IS NULL THEN cur_gsid
                WHEN inc_gsid <> cur_gsid THEN inc_gsid
                ELSE cur_gsid END AS global_subject_id
    FROM j
    """,
    doc="§2.10.5: the local_subject_ids merge — center-agnostic "
    "case-insensitive match, case-preserving storage, center "
    "migration as delete+insert (load_strategies.py:196-352).",
)
def local_ids_merge(spark, sf_dir):
    t = tables(spark, sf_dir, "customer")
    c = t["customer"]
    gsid = F.concat(F.lit("G-"), F.lpad(F.col("c_custkey").cast("string"), 9, "0"))
    cur = c.filter(F.col("c_custkey") % 3 != 0).select(
        F.col("c_nationkey").alias("center_id"),
        F.col("c_name").alias("local_subject_id"),
        F.lit("name").alias("identifier_type"),
        gsid.alias("global_subject_id"),
    )
    inc = c.filter(F.col("c_custkey") % 3 != 1).select(
        F.when(F.col("c_custkey") % 5 == 0, F.col("c_nationkey") + 1)
        .otherwise(F.col("c_nationkey"))
        .alias("center_id"),
        F.upper("c_name").alias("local_subject_id"),
        F.lit("name").alias("identifier_type"),
        F.when(
            F.col("c_custkey") % 7 == 0,
            F.concat(F.lit("G-NEW"), F.col("c_custkey").cast("string")),
        )
        .otherwise(gsid)
        .alias("global_subject_id"),
    )
    return merge_local_subject_ids(inc, cur).merged
