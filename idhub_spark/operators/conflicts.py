"""Conflict detection & resolution application (reference J7, J8, F3).

- detect_conflicts: unique incoming (local_id, id_type, center, gsid)
  joined against existing rows on (local_id, id_type); center
  mismatch -> `center_mismatch`, gsid mismatch -> `multi_gsid`
  (fragment-validator/services/conflict_detector.py:20-104).
- find_duplicates: (local_id, id_type) groups with >1 row in the
  existing table (conflict_detector.py:130-182).
- apply_resolutions: `keep_existing` / pending -> anti-join incoming
  out; `use_incoming` -> keep incoming (caller deletes existing);
  `delete_both` -> drop both (loader.py:124-171,
  fragment_resolution.py:125-174).

Scale: the conflict join is an equi-join on (local_id, id_type) —
same key as the registry's physical layout, so it co-partitions with
the identity-resolution join and reuses the exchange. The exclusion
set (resolved conflicts) is small -> broadcast anti-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def detect_conflicts(incoming: DataFrame, existing: DataFrame) -> DataFrame:
    """J7: returns conflict rows
    (local_subject_id, identifier_type, conflict_type,
     incoming_center_id, existing_center_id,
     incoming_gsid, existing_gsid, requires_review).
    """
    inc = incoming.dropDuplicates(
        ["local_subject_id", "identifier_type", "center_id", "global_subject_id"]
    ).select(
        F.lower(F.col("local_subject_id")).alias("_k"),
        F.col("local_subject_id"),
        F.col("identifier_type"),
        F.col("center_id").alias("incoming_center_id"),
        F.col("global_subject_id").alias("incoming_gsid"),
    )
    ex = existing.select(
        F.lower(F.col("local_subject_id")).alias("_k"),
        F.col("identifier_type"),
        F.col("center_id").alias("existing_center_id"),
        F.col("global_subject_id").alias("existing_gsid"),
    )
    j = inc.join(ex, ["_k", "identifier_type"])
    center_mismatch = (
        F.col("incoming_center_id").isNotNull()
        & F.col("existing_center_id").isNotNull()
        & (F.col("incoming_center_id") != F.col("existing_center_id"))
    )
    gsid_mismatch = (
        F.col("incoming_gsid").isNotNull()
        & F.col("existing_gsid").isNotNull()
        & (F.col("incoming_gsid") != F.col("existing_gsid"))
    )
    return (
        j.filter(center_mismatch | gsid_mismatch)
        .select(
            "local_subject_id",
            "identifier_type",
            # precedence matches the reference exactly: center mismatch
            # is checked FIRST, so a row with both mismatches is
            # center_mismatch (conflict_detector.py:61-83's if/elif)
            F.when(center_mismatch, F.lit("center_mismatch"))
            .otherwise(F.lit("multi_gsid"))
            .alias("conflict_type"),
            "incoming_center_id",
            "existing_center_id",
            "incoming_gsid",
            "existing_gsid",
            F.lit(True).alias("requires_review"),
        )
    )


def find_duplicates(existing: DataFrame) -> DataFrame:
    """J8/A3: (local_id, id_type) appearing with >1 distinct GSID."""
    return (
        existing.groupBy(F.lower("local_subject_id").alias("local_subject_id_norm"), "identifier_type")
        .agg(
            F.countDistinct("global_subject_id").alias("gsid_count"),
            F.sort_array(F.collect_set("global_subject_id")).alias("gsids"),
            F.sort_array(F.collect_set("center_id")).alias("centers"),
        )
        .filter(F.col("gsid_count") > 1)
    )


def apply_resolutions(
    incoming: DataFrame, resolutions: DataFrame, key: list[str]
) -> DataFrame:
    """F3: drop incoming rows whose key has a resolution with action
    keep_existing / delete_both / pending-review (the exclusion set,
    loader.py:279-292). Small resolution table -> broadcast anti-join.
    """
    excl = resolutions.filter(
        F.col("resolution_action").isin("keep_existing", "delete_both", "pending")
    ).select(*key).distinct()
    return incoming.join(F.broadcast(excl), key, "left_anti")
