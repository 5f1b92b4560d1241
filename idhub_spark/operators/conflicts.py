"""Conflict detection & resolution application (reference J7, J8, F3).

- detect_conflicts: unique incoming (local_id, id_type, center, gsid)
  joined against existing rows on (local_id, id_type); center
  mismatch -> `center_mismatch`, gsid mismatch -> `multi_gsid`
  (fragment-validator/services/conflict_detector.py:20-104).
- find_duplicates: (local_id, id_type) groups with >1 row in the
  existing table (conflict_detector.py:130-182).
- apply_resolutions: `keep_existing` / pending -> anti-join incoming
  out; `use_incoming` -> keep incoming; `delete_both` -> drop both
  (loader.py:124-171, fragment_resolution.py:125-174).
- apply_resolutions_existing: the existing-side twin —
  `use_incoming` / `delete_both` delete the matching existing rows
  (conflict_resolver.py:61-75,91-110 _delete_existing_record).
- apply_center_updates: center_mismatch + use_incoming propagates the
  incoming center to `subjects` and deletes the stale
  `local_subject_ids` row (fragment_resolution.py:389-564).
- The reference's `merge` action is explicitly unimplemented there
  (conflict_resolver.py:77-81 logs a warning and does nothing); here
  it is the same documented no-op on BOTH sides: incoming loads
  (fragment_resolution.py:158-161), existing stays.

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


_RESOLUTION_COLS = [
    "batch_id",
    "local_subject_id",
    "identifier_type",
    "conflict_type",
    "resolution_action",
    "resolved",
    "existing_gsid",
    "existing_center_id",
    "incoming_center_id",
]


def pending_resolutions(resolutions: DataFrame, batch_id: str) -> DataFrame:
    """F5 batch/status predicates — the reference's
    get_resolved_conflicts (fragment_resolution.py:302-350): the
    resolutions for ONE batch that a curator has actioned
    (resolution_action IS NOT NULL) but the loader has not yet applied
    (resolved = FALSE). This is the work-queue scan that gates every
    conflict-application pass; mark_applied is its closing half.

    Scale: batch_id is the natural partition key of the resolutions
    table; the predicate prunes to one batch before anything shuffles.
    """
    return resolutions.filter(
        (F.col("batch_id") == batch_id)
        & F.col("resolution_action").isNotNull()
        & (F.col("resolved") == F.lit(False))
    ).select(*_RESOLUTION_COLS)


def mark_applied(resolutions: DataFrame, batch_id: str) -> DataFrame:
    """F5's closing half — mark_conflicts_as_applied
    (fragment_resolution.py:352-387): after application, every
    actioned resolution in the batch flips resolved := TRUE. Pure
    column rewrite — no shuffle."""
    flip = (
        (F.col("batch_id") == batch_id)
        & F.col("resolution_action").isNotNull()
        & (F.col("resolved") == F.lit(False))
    )
    return resolutions.withColumn(
        "resolved", F.when(flip, F.lit(True)).otherwise(F.col("resolved"))
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


def _ci_anti_join(big: DataFrame, keys_df: DataFrame, key: list[str]) -> DataFrame:
    """Broadcast anti-join that matches local_subject_id (when it is a
    key component) CASE-INSENSITIVELY — conflicts are DETECTED on
    lower(local_subject_id) and resolution rows store the incoming
    row's casing, so an exact-match delete would silently miss an
    existing row that differs only in case, leaving the conflict to
    re-fire every batch (extends docs/deviations.md #8: application
    matches detection)."""
    if "local_subject_id" not in key:
        return big.join(F.broadcast(keys_df), key, "left_anti")
    jkey = [("_lid" if k == "local_subject_id" else k) for k in key]
    keys_ci = keys_df.withColumn("_lid", F.lower("local_subject_id")).drop(
        "local_subject_id"
    )
    return (
        big.withColumn("_lid", F.lower("local_subject_id"))
        .join(F.broadcast(keys_ci), jkey, "left_anti")
        .drop("_lid")
    )


def apply_resolutions_existing(
    existing: DataFrame, resolutions: DataFrame, key: list[str]
) -> DataFrame:
    """Existing-side effects of resolutions: `use_incoming` and
    `delete_both` delete the matching existing rows
    (conflict_resolver.py:61-75 -> _delete_existing_record:91-110 —
    the incoming row then replaces it for use_incoming, nothing does
    for delete_both). `keep_existing`, pending, and the reference's
    unimplemented `merge` leave existing untouched. Matching is
    case-insensitive on local_subject_id (see _ci_anti_join). The
    resolution set is human-curated and tiny -> broadcast anti-join;
    existing never shuffles.
    """
    excl = resolutions.filter(
        F.col("resolution_action").isin("use_incoming", "delete_both")
    ).select(*key).distinct()
    return _ci_anti_join(existing, excl, key)


def resolution_deleted_rows(
    existing: DataFrame, resolutions: DataFrame, key: list[str]
) -> DataFrame:
    """The complement of apply_resolutions_existing: the existing rows
    a use_incoming/delete_both resolution REMOVES (same case-
    insensitive matching). A physical binding needs these as exact
    rows — the logical anti-join only drops them from the in-memory
    frame, and a pruned on-disk rewrite that never learns their
    natural keys would leave them alive in untouched buckets
    (operators/merge_into.py delete_keys)."""
    excl = resolutions.filter(
        F.col("resolution_action").isin("use_incoming", "delete_both")
    ).select(*key).distinct()
    if "local_subject_id" not in key:
        return existing.join(F.broadcast(excl), key, "left_semi")
    jkey = [("_lid" if k == "local_subject_id" else k) for k in key]
    keys_ci = excl.withColumn("_lid", F.lower("local_subject_id")).drop(
        "local_subject_id"
    )
    return (
        existing.withColumn("_lid", F.lower("local_subject_id"))
        .join(F.broadcast(keys_ci), jkey, "left_semi")
        .drop("_lid")
    )


def apply_center_updates(
    subjects: DataFrame,
    local_ids: DataFrame,
    resolutions: DataFrame,
) -> tuple[DataFrame, DataFrame]:
    """Center-mismatch propagation for `use_incoming` resolutions
    (fragment_resolution.py:389-480 apply_center_updates_to_subjects,
    :482-564 apply_center_updates_to_local_ids):

    - subjects rows matching (existing_gsid, existing_center_id) get
      center_id := incoming_center_id;
    - local_subject_ids rows matching (existing_center_id,
      local_subject_id, identifier_type) are deleted — the incoming
      row re-inserts them under the new center.

    The reference applies updates row-by-row in cursor order, with a
    WHERE center_id = old guard making later duplicates no-ops; the
    set-based twin pins the equivalent determinism by reducing to ONE
    incoming center per (existing_gsid, existing_center_id) with min().

    Returns (subjects', local_ids'). Both joins broadcast the tiny
    resolution side; the big tables keep their partitioning.
    """
    cr = resolutions.filter(
        (F.col("conflict_type") == "center_mismatch")
        & (F.col("resolution_action") == "use_incoming")
    )
    upd = (
        cr.groupBy(
            F.col("existing_gsid").alias("_gsid"),
            F.col("existing_center_id").alias("_old_center"),
        )
        .agg(F.min("incoming_center_id").alias("_new_center"))
    )
    subjects2 = subjects.join(
        F.broadcast(upd),
        (subjects["global_subject_id"] == upd["_gsid"])
        & (subjects["center_id"] == upd["_old_center"]),
        "left",
    ).select(
        *[
            F.coalesce(F.col("_new_center"), subjects[c]).alias("center_id")
            if c == "center_id"
            else subjects[c]
            for c in subjects.columns
        ]
    )
    del_keys = cr.select(
        F.col("existing_center_id").alias("center_id"),
        "local_subject_id",
        "identifier_type",
    ).distinct()
    local2 = _ci_anti_join(
        local_ids, del_keys, ["center_id", "local_subject_id", "identifier_type"]
    )
    return subjects2, local2
