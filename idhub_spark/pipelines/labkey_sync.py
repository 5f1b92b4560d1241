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
    updates = (
        labkey_rows.join(
            specimen.select("sample_id"), "sample_id", "semi"
        )  # only samples we track (J10 semi-join)
        .select(
            "sample_id",
            (F.lower(F.trim("status")) != "consumed").alias("sample_available"),
            # ISO strings or epoch millis both parse (P15,
            # labkey_client.py:83-101)
            F.year(flexible_timestamp_expr(F.col("collected_date"))).alias(
                "year_collected"
            ),
        )
    )
    # merge updates into specimen, preserving untouched columns
    incoming = (
        specimen.join(updates.withColumnRenamed("sample_available", "_avail")
                      .withColumnRenamed("year_collected", "_year"), "sample_id")
        .select(
            "sample_id",
            "global_subject_id",
            "sample_type",
            F.col("_avail").alias("sample_available"),
            F.col("_year").alias("year_collected"),
        )
    )
    return merge_upsert(
        incoming,
        specimen,
        ["sample_id"],
        mode="update_only",
        table_name="specimen",
        batch_id=batch_id,
    )
