"""local_subject_ids special merge path (reference §2.10.5,
table-loader/services/load_strategies.py:196-352).

Match is on (local_subject_id, identifier_type) IGNORING center
(case-insensitive on the id value, case-preserving storage):

- no existing row            -> INSERT
- same center, same GSID     -> unchanged
- same center, GSID change   -> UPDATE gsid + audit
- center change              -> DELETE old row + INSERT new + audit
  (the center-migration path; a plain UPDATE would violate the
  (center,id,type) PK when the target row exists)
- >1 existing rows for key   -> delete-all-then-insert-one (D6
  duplicate cleanup, load_strategies.py:241-270)

Expressed as one classification join + a rebuilt table image (the
Delta equivalent: MERGE whenMatchedDelete + staged insert).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


@dataclass
class LocalIdMergeResult:
    merged: DataFrame
    audit: DataFrame  # (local_subject_id, identifier_type, change, detail)


def merge_local_subject_ids(incoming: DataFrame, current: DataFrame) -> LocalIdMergeResult:
    """incoming/current: (center_id, local_subject_id,
    identifier_type, global_subject_id)."""
    key = F.lower(F.col("local_subject_id")).alias("_k")
    # deterministic one-row-per-key pick: plain dropDuplicates keeps a
    # partition-order-dependent arbitrary row, so a batch carrying two
    # rows for one (id, type) — e.g. a multi-GSID component's link-back
    # output — would merge a different winner run to run (the
    # determinism discipline sampling.py documents)
    wi = Window.partitionBy("_k", "_t").orderBy("inc_center", "inc_gsid", "inc_id")
    inc = (
        incoming.select(
            key,
            F.col("identifier_type").alias("_t"),
            F.col("center_id").alias("inc_center"),
            F.col("local_subject_id").alias("inc_id"),
            F.col("global_subject_id").alias("inc_gsid"),
        )
        .withColumn("_irn", F.row_number().over(wi))
        .filter(F.col("_irn") == 1)
        .drop("_irn")
    )

    # collapse duplicate existing rows per key (delete-all-then-insert
    # semantics: only ONE surviving row per key after the merge)
    w = Window.partitionBy(F.lower("local_subject_id"), "identifier_type").orderBy(
        "center_id", "global_subject_id"
    )
    cur = (
        current.withColumn("_dup_count", F.count(F.lit(1)).over(
            Window.partitionBy(F.lower("local_subject_id"), "identifier_type")
        ))
        .withColumn("_rn", F.row_number().over(w))
    )
    cur_one = cur.filter(F.col("_rn") == 1).select(
        F.lower("local_subject_id").alias("_k"),
        F.col("identifier_type").alias("_t"),
        F.col("center_id").alias("cur_center"),
        F.col("local_subject_id").alias("cur_id"),
        F.col("global_subject_id").alias("cur_gsid"),
        (F.col("_dup_count") > 1).alias("had_duplicates"),
    )

    j = inc.join(cur_one, ["_k", "_t"], "full_outer")
    # center 0 means UNKNOWN (gsid-service/services/identity_resolution
    # .py:222-245): an incoming unknown center never downgrades an
    # existing real one — the effective center keeps the current value
    # in that case, so the row classifies by GSID instead of spuriously
    # migrating to center 0
    eff_center = F.when(
        (F.col("inc_center") == 0)
        & F.col("cur_center").isNotNull()
        & (F.col("cur_center") != 0),
        F.col("cur_center"),
    ).otherwise(F.col("inc_center"))
    change = (
        F.when(F.col("cur_gsid").isNull(), F.lit("insert"))
        .when(F.col("inc_gsid").isNull(), F.lit("keep"))
        .when(F.col("had_duplicates"), F.lit("dedup_rewrite"))
        .when(eff_center != F.col("cur_center"), F.lit("center_migration"))
        .when(F.col("inc_gsid") != F.col("cur_gsid"), F.lit("gsid_update"))
        .otherwise(F.lit("unchanged"))
    )
    classified = j.withColumn("change", change).withColumn("_eff_center", eff_center)

    take_incoming = classified.filter(
        F.col("change").isin("insert", "center_migration", "gsid_update", "dedup_rewrite")
    ).select(
        F.col("_eff_center").alias("center_id"),
        F.col("inc_id").alias("local_subject_id"),
        F.col("_t").alias("identifier_type"),
        F.col("inc_gsid").alias("global_subject_id"),
    )
    keep_current = classified.filter(F.col("change").isin("keep", "unchanged")).select(
        F.col("cur_center").alias("center_id"),
        F.col("cur_id").alias("local_subject_id"),
        F.col("_t").alias("identifier_type"),
        F.col("cur_gsid").alias("global_subject_id"),
    )
    merged = take_incoming.unionByName(keep_current)

    audit = classified.filter(
        ~F.col("change").isin("keep", "unchanged", "insert")
    ).select(
        F.coalesce("inc_id", "cur_id").alias("local_subject_id"),
        F.col("_t").alias("identifier_type"),
        "change",
        F.concat_ws(
            "->",
            F.concat_ws(":", F.col("cur_center").cast("string"), "cur_gsid"),
            F.concat_ws(":", F.col("inc_center").cast("string"), "inc_gsid"),
        ).alias("detail"),
    )
    return LocalIdMergeResult(merged=merged, audit=audit)
