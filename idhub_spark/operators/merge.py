"""Universal upsert / MERGE with field-level audit capture.

Reference: the Universal Upsert (table-loader/services/
load_strategies.py:92-194; docs/developers/architecture/
update-strategy.md:1-157) — fetch by natural key, classify
new/changed/unchanged, insert new, update changed fields only, audit
every changed field; modes `upsert` | `insert_only` | `update_only`
(update-strategy.md:142-196); immutable-field protection
(update-strategy.md:198-241).

Spark-first: the classification is one full-outer join
(operators/changes.py); the merge result is expressed as a DataFrame
(current rows patched with incoming values per mode) so the caller
writes it wherever (parquet snapshot here; Delta MERGE INTO verbatim
on a Delta-enabled cluster — the change-set/audit computation is the
part Delta lacks, SURVEY.md §4.3). Writes use
snapshot-replace-by-partition: at 100 TB the table is partitioned
(e.g. by hash bucket of the natural key) and only partitions
containing touched keys rewrite — the classified change-set tells us
exactly which.

Dry-run (loader.py:213-234) falls out naturally: `merge_upsert`
computes everything lazily; a dry run just reads `stats`/`audit`
without writing `merged`.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from idhub_spark.operators.changes import audit_rows, classify_changes

MODES = ("upsert", "insert_only", "update_only")


@dataclass
class MergeResult:
    merged: DataFrame  # the post-merge table contents
    classified: DataFrame  # per-key change_type + changes map
    audit: DataFrame  # data_change_audit rows (K6)
    inserted: DataFrame
    updated: DataFrame
    unchanged: DataFrame

    def stats(self) -> DataFrame:
        """A11: per-change-type tallies for fragment_resolutions."""
        return self.classified.groupBy("change_type").agg(
            F.count(F.lit(1)).alias("n")
        )


def merge_upsert(
    incoming: DataFrame,
    current: DataFrame,
    natural_key: list[str],
    *,
    mode: str = "upsert",
    immutable: list[str] | None = None,
    exclude: list[str] | None = None,
    table_name: str = "?",
    batch_id: str = "?",
) -> MergeResult:
    if mode not in MODES:
        raise ValueError(f"mode must be one of {MODES}")
    immutable = list(immutable or [])
    classified = classify_changes(
        incoming, current, natural_key, exclude=list(exclude or []) + immutable
    )

    inserted = classified.filter(F.col("change_type") == "new")
    updated = classified.filter(F.col("change_type") == "updated")
    unchanged = classified.filter(F.col("change_type") == "unchanged")

    take_new = {"upsert": ["new"], "insert_only": ["new"], "update_only": []}[mode]
    take_upd = {"upsert": ["updated"], "insert_only": [], "update_only": ["updated"]}[mode]

    # The merged image is built on CURRENT's full schema (plus any
    # incoming-only columns appended): a fragment carrying a subset of
    # the table's columns (the normal case — the reference's
    # update-strategy patches only present fields) must never destroy
    # the columns it doesn't carry.
    cur_value_cols = [c for c in current.columns if c not in natural_key]
    # immutable columns are excluded here: the cur_imm join below
    # always carries them, and joining them in twice (once via cur_imm,
    # once via the cur_only join) is an ambiguous-reference error when
    # the fragment doesn't carry the immutable column
    cur_only = [
        c
        for c in cur_value_cols
        if c not in incoming.columns and c not in set(immutable)
    ]
    inc_only = [
        c for c in incoming.columns if c not in current.columns and c not in natural_key
    ]
    out_cols = cur_value_cols + inc_only
    cur_types = {f.name: f.dataType for f in current.schema.fields}
    inc_types = {f.name: f.dataType for f in incoming.schema.fields}

    patch_keys = classified.filter(F.col("change_type").isin(take_upd)).select(*natural_key)

    # rows that keep their current image: untouched keys + (in
    # insert_only mode) updated-but-ignored keys
    kept = current.join(patch_keys, natural_key, "left_anti").select(
        *natural_key,
        *[F.col(c) for c in cur_value_cols],
        *[F.lit(None).cast(inc_types[c]).alias(c) for c in inc_only],
    )
    # patched rows take incoming values for the columns incoming
    # carries (value->NULL transitions are real audited changes, so
    # carried NULLs do overwrite) but keep current values for
    # immutable fields and for columns incoming doesn't carry
    patch_src = classified.filter(F.col("change_type").isin(take_upd))
    imm_in_cur = [c for c in immutable if c in current.columns]
    if imm_in_cur:
        # replace only immutable columns current actually has; an
        # immutable name that exists only in incoming keeps its
        # incoming value (there is no current value to protect)
        cur_imm = current.select(*natural_key, *imm_in_cur)
        patch_src = patch_src.drop(*imm_in_cur).join(cur_imm, natural_key, "left")
    if cur_only:
        patch_src = patch_src.join(
            current.select(*natural_key, *cur_only), natural_key, "left"
        )
    patched = patch_src.select(*natural_key, *[F.col(c) for c in out_cols])
    # fresh rows have no current image: any output column the
    # classified frame doesn't carry (current-only, or an immutable
    # column absent from the fragment) is NULL
    fresh_src = classified.filter(F.col("change_type").isin(take_new))
    fresh = fresh_src.select(
        *natural_key,
        *[
            F.col(c)
            if c in fresh_src.columns
            else F.lit(None).cast(cur_types[c]).alias(c)
            for c in out_cols
        ],
    )

    merged = kept.unionByName(patched).unionByName(fresh)
    audit = audit_rows(
        classified if mode != "insert_only" else classified.limit(0),
        natural_key,
        table_name=table_name,
        batch_id=batch_id,
    )
    return MergeResult(
        merged=merged,
        classified=classified,
        audit=audit,
        inserted=inserted,
        updated=updated,
        unchanged=unchanged,
    )
