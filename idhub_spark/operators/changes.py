"""Change detection / upsert classification (reference J5-J6).

The reference has three slightly divergent pandas implementations
(table-loader/services/load_strategies.py:141-182,588-606;
fragment-validator/services/update_detector.py:114-238;
table-loader/services/fragment_resolution.py:37-123). This module is
the single Spark source of truth (SURVEY.md §7.3 risk (c)):

- incoming vs current FULL OUTER JOIN on the natural key
- per-field comparison skips key + excluded fields
- null normalization: '' == NULL == 'NA'... (update_detector.py:229-234)
- classification: new / updated / unchanged / orphan (orphan = current
  key absent from incoming, update_detector.py:184-192)
- `changes` map {field: {old, new}} for the audit sink (K6)

Scale notes: one shuffle on the natural key for the outer join (both
sides repartition identically); the per-field comparison is a pure
projection. At 100 TB the join key should be the table's physical
partitioning/bucketing key so the join is co-located; AQE handles the
common case where `incoming` (one batch) is much smaller than
`current` (full table) by broadcasting incoming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from idhub_spark.functions.expressions import null_normalize_expr


def _norm(side: str, field: str) -> F.Column:
    return null_normalize_expr(F.col(f"{side}.{field}").cast("string"))


def classify_changes(
    incoming: DataFrame,
    current: DataFrame,
    natural_key: list[str],
    *,
    exclude: list[str] | None = None,
) -> DataFrame:
    """Full-outer-join change classifier.

    Returns one row per natural key present on either side:
      <natural key cols>,
      change_type      new | updated | unchanged | orphan,
      changed_fields   sorted array of field names that differ,
      changes          map<string, struct<old string, new string>>
                       (null-normalized string images, as the
                        reference audits them as JSONB text)
    plus every incoming field (for downstream merge).
    """
    exclude = set(exclude or [])
    # all incoming payload fields pass through; excluded ones are
    # carried but not compared (immutable/system columns)
    fields = [f for f in incoming.columns if f not in natural_key]
    common = [f for f in fields if f in current.columns and f not in exclude]

    # presence flags use a synthetic marker so all-null rows still
    # classify correctly
    inc = incoming.withColumn("_inc_present", F.lit(True)).alias("inc")
    cur = current.withColumn("_cur_present", F.lit(True)).alias("cur")
    joined = inc.join(cur, natural_key, "full_outer")

    diffs = [
        F.when(
            ~(_norm("inc", f).eqNullSafe(_norm("cur", f))),
            F.struct(
                F.lit(f).alias("field"),
                F.struct(
                    _norm("cur", f).alias("old"),
                    _norm("inc", f).alias("new"),
                ).alias("delta"),
            ),
        )
        for f in common
    ]
    delta_t = "array<struct<field:string,delta:struct<old:string,new:string>>>"
    empty = F.array().cast(delta_t)
    # field diffs only exist when BOTH sides are present; new/orphan
    # rows get an empty change set (the reference only diffs matches)
    delta_arr = (
        F.when(
            F.col("inc._inc_present").isNotNull() & F.col("cur._cur_present").isNotNull(),
            F.array_compact(F.array(*diffs)).cast(delta_t),
        ).otherwise(empty)
        if diffs
        else empty
    )

    change_type = (
        F.when(F.col("cur._cur_present").isNull(), F.lit("new"))
        .when(F.col("inc._inc_present").isNull(), F.lit("orphan"))
        .when(F.size("_delta") > 0, F.lit("updated"))
        .otherwise(F.lit("unchanged"))
    )

    out_cols = (
        [F.col(k) for k in natural_key]
        + [F.col(f"inc.{f}").alias(f) for f in fields]
        + [
            change_type.alias("change_type"),
            F.sort_array(F.transform("_delta", lambda d: d["field"])).alias(
                "changed_fields"
            ),
            F.map_from_entries(
                F.transform("_delta", lambda d: F.struct(d["field"], d["delta"]))
            ).alias("changes"),
        ]
    )
    return joined.withColumn("_delta", delta_arr).select(*out_cols)


def orphans(classified: DataFrame) -> DataFrame:
    """D3/J6: keys present in current but missing from incoming."""
    return classified.filter(F.col("change_type") == "orphan")


def audit_rows(
    classified: DataFrame,
    natural_key: list[str],
    *,
    table_name: str,
    batch_id: str,
    source_fragment: str | None = None,
) -> DataFrame:
    """K6: one audit row per changed FIELD, shaped like
    `data_change_audit` (01-schema.sql:118-127): record_key (the
    natural key as a map), field, old/new values, batch/source."""
    exploded = (
        classified.filter(F.col("change_type") == "updated")
        .select(*natural_key, F.explode("changes").alias("field", "delta"))
    )
    return exploded.select(
        F.lit(table_name).alias("table_name"),
        F.map_from_arrays(
            F.array(*[F.lit(k) for k in natural_key]),
            F.array(*[F.col(k).cast("string") for k in natural_key]),
        ).alias("record_key"),
        "field",
        F.col("delta.old").alias("old_value"),
        F.col("delta.new").alias("new_value"),
        F.lit(batch_id).alias("batch_id"),
        F.lit(source_fragment).alias("source_fragment"),
        F.current_timestamp().alias("changed_at"),
    )


def scd2_versions(
    images: DataFrame,
    natural_key: list[str],
    attrs: list[str],
    seq_col: str = "batch_seq",
) -> DataFrame:
    """SCD Type-2 version materialization from a sequence of per-batch
    entity images: collapse consecutive batches where every tracked
    attribute is unchanged (null-safe) into ONE version row with an
    inclusive [valid_from, valid_to] batch interval; the open version
    has valid_to NULL and is_current true.

    The reference keeps field-level history (data_change_audit,
    01-schema.sql:118-127) and full snapshots; this is the row-version
    view warehouses call a type-2 dimension, derived purely with two
    keyed windows (lag to detect change starts, lead to close
    intervals) — one shuffle on the natural key, no self-joins, scale
    bounded by images not versions. A key absent from a later image is
    NOT a tracked event (no tombstones here): feed deletions as an
    explicit attribute (e.g. a deleted flag) if they must version.
    """
    w = Window.partitionBy(*natural_key).orderBy(seq_col)
    prev_missing = F.lag(seq_col).over(w).isNull()
    changed = prev_missing
    for a in attrs:
        changed = changed | ~F.col(a).eqNullSafe(F.lag(a).over(w))
    starts = images.withColumn("_chg", changed).filter(F.col("_chg"))
    w2 = Window.partitionBy(*natural_key).orderBy(seq_col)
    nxt = F.lead(seq_col).over(w2)
    return starts.select(
        *natural_key,
        *attrs,
        F.col(seq_col).alias("valid_from"),
        (nxt - 1).alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )
