"""Reporting layer (reference §2.6 views/functions as DataFrame
queries; validation report assembly A9, validator.py:180-252).

These are the operational dashboards: resolution stats, per-center
summaries, duplicate finders, change history. Each is a one-pass
aggregate; at scale they read the (partitioned) registry tables and
shuffle only group keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolution_stats(
    resolutions: DataFrame, *, since=None, until=None
) -> DataFrame:
    """A1 (01-schema.sql:456-479): counts + avg confidence by
    (action, match_strategy), optional created_at range."""
    df = resolutions
    if since is not None:
        df = df.filter(F.col("created_at") >= since)
    if until is not None:
        df = df.filter(F.col("created_at") < until)
    return df.groupBy("action", "match_strategy").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.col("confidence").cast("double")).alias("avg_confidence"),
    )


def find_duplicate_subjects(local_ids: DataFrame) -> DataFrame:
    """A3 (01-schema.sql:537-561): (local_id, type) resolving to >1
    GSID, with the colliding gsid/center sets."""
    return (
        local_ids.groupBy(
            F.lower("local_subject_id").alias("local_subject_id"), "identifier_type"
        )
        .agg(
            F.countDistinct("global_subject_id").alias("gsid_count"),
            F.sort_array(F.collect_set("global_subject_id")).alias("gsids"),
            F.sort_array(F.collect_set("center_id")).alias("center_ids"),
        )
        .filter(F.col("gsid_count") > 1)
    )


def per_center_summary(resolutions: DataFrame, centers: DataFrame) -> DataFrame:
    """A5 view (01-schema.sql:689-701): groups identity_resolutions on
    input_center_id — the column the canonical schema and
    resolution_log actually carry (a bare center_id does not exist on
    resolution rows)."""
    return (
        resolutions.groupBy(F.col("input_center_id").alias("center_id"))
        .agg(
            F.count(F.lit(1)).alias("n_resolutions"),
            F.avg(F.col("confidence").cast("double")).alias("avg_confidence"),
            F.sum(F.when(F.col("requires_review"), 1).otherwise(0)).alias(
                "n_requires_review"
            ),
        )
        .join(F.broadcast(centers), "center_id", "left")
    )


def subjects_by_source(subjects: DataFrame) -> DataFrame:
    """A6 view (01-schema.sql:704-713)."""
    return subjects.groupBy("created_by").agg(
        F.countDistinct("global_subject_id").alias("n_subjects"),
        F.countDistinct("center_id").alias("n_centers"),
        F.min("created_at").alias("first_created"),
        F.max("created_at").alias("last_created"),
    )


def change_history(
    audit: DataFrame, *, table_name: str | None = None, limit: int = 1000
) -> DataFrame:
    """get_change_history / v_recent_data_changes
    (01-schema.sql:588-590,716-728): newest first, bounded."""
    df = audit
    if table_name:
        df = df.filter(F.col("table_name") == table_name)
    return df.orderBy(F.desc("changed_at"), F.desc("field")).limit(limit)
