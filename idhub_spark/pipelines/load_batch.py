"""Batch load pipeline (reference §3.3: table-loader/main.py ->
TableLoader.load_batch, services/loader.py:68-254).

  staged fragment + validation report -> conflict-resolution
  anti-filter (F3) -> exclusion projection + type coercion (P4/P5) ->
  strategy-dispatched merge (upsert / insert_only / update_only) with
  field-level audit -> fragment_resolutions bookkeeping.

Dry-run (the reference's transaction-rollback default,
loader.py:213-234) = compute everything, skip the write: all outputs
are lazy DataFrames; `execute=False` returns them unexecuted.

Persisting the result is the caller's binding choice
(operators/merge_into.py): apply_merge executes the emitted
MERGE INTO on a Delta/Iceberg catalog, partition_pruned_upsert
rewrites only the touched key-buckets on plain parquet, and
snapshots.SnapshotStore gives the fully-atomic snapshot swap.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from idhub_spark.operators.conflicts import (
    apply_resolutions,
    apply_resolutions_existing,
    resolution_deleted_rows,
)
from idhub_spark.operators.merge import MergeResult, merge_upsert
from idhub_spark.schema import (
    DEFAULT_EXCLUDES,
    IMMUTABLE_FIELDS,
    NATURAL_KEYS,
    UPDATE_STRATEGIES,
)


@dataclass
class LoadResult:
    merge: MergeResult
    bookkeeping: DataFrame  # one fragment_resolutions row
    # the fragment AFTER exclusions / conflict-resolution filtering /
    # invalid-GSID filter / schema intersection — what a physical
    # binding (merge_into.apply_merge / partition_pruned_upsert)
    # should persist when the caller writes bucketed instead of
    # snapshot
    incoming: DataFrame = None
    # existing rows use_incoming/delete_both resolutions REMOVED from
    # the logical current. The snapshot layout persists their absence
    # for free (it writes the full merged image); the bucketed layout
    # MUST pass their keys to partition_pruned_upsert(delete_keys=...)
    # or the deletions silently survive on disk (r7 ADVICE). None when
    # no resolutions were supplied.
    deleted_keys: DataFrame | None = None


def load_batch(
    fragment: DataFrame,
    current: DataFrame,
    *,
    table_name: str,
    batch_id: str,
    report: dict | None = None,
    resolutions: DataFrame | None = None,
    keep_new_columns: bool = False,
) -> LoadResult:
    report = report or {}
    natural_key = NATURAL_KEYS.get(table_name, [fragment.columns[0]])
    mode = UPDATE_STRATEGIES.get(table_name, "upsert")
    immutable = IMMUTABLE_FIELDS.get(table_name, [])

    # report-driven + per-table default exclusions (loader.py:82-86)
    exclude = set(report.get("exclude_from_load", [])) | set(
        DEFAULT_EXCLUDES.get(table_name, [])
    )
    incoming = fragment.drop(*[c for c in exclude if c in fragment.columns])

    # resolved-conflict exclusion set (F3, loader.py:124-171)
    deleted_keys = None
    if resolutions is not None:
        key = [k for k in ("local_subject_id", "identifier_type") if k in incoming.columns]
        if key:
            incoming = apply_resolutions(incoming, resolutions, key)
            # existing-side twin (conflict_resolver.py:61-110): rows
            # resolved use_incoming/delete_both are deleted from the
            # current table before the merge — use_incoming rows are
            # then re-inserted from the fragment, delete_both rows are
            # gone from both sides. The reference deletes by
            # (center_id, local_id, type); include the center key when
            # both sides carry it.
            ekey = list(key)
            res_e = resolutions
            if (
                "existing_center_id" in resolutions.columns
                and "center_id" in current.columns
            ):
                res_e = resolutions.withColumn(
                    "center_id", F.col("existing_center_id")
                )
                ekey = ["center_id", *key]
            # exact rows being removed, captured BEFORE the anti-join
            # so a bucketed binding can delete them on disk too
            deleted_keys = resolution_deleted_rows(current, res_e, ekey).select(
                *[k for k in natural_key if k in current.columns]
            )
            current = apply_resolutions_existing(current, res_e, ekey)

    # invalid-GSID row filter (F2, data_transformer.py:120-134)
    if "global_subject_id" in incoming.columns:
        g = F.trim(F.col("global_subject_id"))
        incoming = incoming.filter(
            F.col("global_subject_id").isNotNull() & (g != "") & (F.lower(g) != "nan")
        )

    # schema-intersection projection (P4): only columns the target has
    # (loader.py drops unknown columns by design). keep_new_columns is
    # the schema-EVOLUTION variant: fragment-only columns survive into
    # the merge so an evolve='rewrite' binding can widen the table.
    if not keep_new_columns:
        incoming = incoming.select(
            *[c for c in incoming.columns if c in current.columns]
        )

    merge = merge_upsert(
        incoming,
        current,
        natural_key,
        mode=mode,
        immutable=immutable,
        table_name=table_name,
        batch_id=batch_id,
    )

    # rows_attempted counts FRAGMENT rows only: classify_changes' full
    # outer join also emits one 'orphan' row per current-table key the
    # fragment doesn't touch, and counting those would report ~the
    # whole target table size for a small batch
    # (fragment_resolution.py:268-296 records batch-sized tallies)
    counts = merge.classified.filter(F.col("change_type") != "orphan").groupBy().agg(
        F.count(F.lit(1)).alias("rows_attempted"),
        F.sum(F.when(F.col("change_type") == "new", 1).otherwise(0)).alias("rows_inserted"),
        F.sum(F.when(F.col("change_type") == "updated", 1).otherwise(0)).alias("rows_updated"),
        F.sum(F.when(F.col("change_type") == "unchanged", 1).otherwise(0)).alias(
            "rows_unchanged"
        ),
    )
    # rows_loaded counts what the MODE actually applied: inserts don't
    # load in update_only, updates don't load in insert_only
    applied_new = F.col("rows_inserted") if mode != "update_only" else F.lit(0)
    applied_upd = F.col("rows_updated") if mode != "insert_only" else F.lit(0)
    bookkeeping = counts.select(
        F.lit(batch_id).alias("batch_id"),
        F.lit(table_name).alias("table_name"),
        F.lit("LOADED").alias("status"),
        "rows_attempted",
        (applied_new + applied_upd + F.col("rows_unchanged")).alias("rows_loaded"),
        F.lit(0).cast("long").alias("rows_failed"),
        "rows_inserted",
        "rows_updated",
        "rows_unchanged",
    )
    return LoadResult(
        merge=merge,
        bookkeeping=bookkeeping,
        incoming=incoming,
        deleted_keys=deleted_keys,
    )
