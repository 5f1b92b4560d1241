"""LabKey specimen sync (reference §2 J10: labkey-sync/services/
sync_service.py:19-80, specimen_updater.py:29-100).

The reference pages DB sample_ids in batches of 100 and issues one
LabKey `IN (...)` query per batch, then updates specimens row by row.
Spark shape: the LabKey extract (RestSource or file drop) semi-joins
the specimen table on sample_id and MERGEs the matched updates:

- status == 'consumed'  -> sample_available = false
  (specimen_updater.py:57-61)
- collection date       -> year_collected (specimen_updater.py:63-66)

Incremental: pass only LabKey rows with Modified > last_sync
(data-flow.md:493-523) — the merge is idempotent so overlap is safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from idhub_spark.functions.expressions import flexible_timestamp_expr
from idhub_spark.operators.merge import MergeResult, merge_upsert


def labkey_sync(
    specimen: DataFrame,
    labkey_rows: DataFrame,
    *,
    batch_id: str = "labkey",
) -> MergeResult:
    """labkey_rows: (sample_id, status, collected_date ts).
    Returns the MergeResult over the specimen table."""
    # Each field updates ONLY when its condition holds, exactly like
    # the reference's per-field UPDATE list (specimen_updater.py:57-66):
    # - sample_available := false only when status == 'consumed'; any
    #   other status (including NULL) leaves the current value — the
    #   reference never sets it back to true;
    # - year_collected := year(date) only when a date parses; a
    #   missing/unparseable date keeps the current year.
    updates = labkey_rows.select(
        "sample_id",
        F.lower(F.trim("status")).alias("_status"),
        # ISO strings or epoch millis both parse (P15,
        # labkey_client.py:83-101)
        F.year(flexible_timestamp_expr(F.col("collected_date"))).alias("_year_new"),
    )
    # inner join == the J10 semi-join plus the update payload; current
    # field values come along for the keep-when-condition-fails arms
    incoming = specimen.join(updates, "sample_id").select(
        "sample_id",
        "global_subject_id",
        "sample_type",
        F.when(F.col("_status") == "consumed", F.lit(False))
        .otherwise(F.col("sample_available"))
        .alias("sample_available"),
        F.coalesce(F.col("_year_new"), F.col("year_collected")).alias(
            "year_collected"
        ),
    )
    return merge_upsert(
        incoming,
        specimen,
        ["sample_id"],
        mode="update_only",
        table_name="specimen",
        batch_id=batch_id,
    )
