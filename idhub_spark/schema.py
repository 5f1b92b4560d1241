"""Table schemas and per-table load policy (reference §1.2).

StructTypes mirror database/init-scripts/01-schema.sql; natural keys
and update strategies come from fragment-validator/config/
table_configs.json, which wins over table-loader/services/
loader.py:23-31 where the two disagree (SURVEY.md §2.10.4 — the
config file matches the schema's PK semantics for `specimen` and
`genotype`; documented here as the single source of truth).
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _s(*fields) -> StructType:
    return StructType([StructField(n, t, nullable) for n, t, nullable in fields])


CENTERS = _s(
    ("center_id", IntegerType(), False),
    ("center_name", StringType(), False),
    ("center_code", StringType(), True),
)

SUBJECTS = _s(
    ("global_subject_id", StringType(), False),  # 21-char GSID
    ("center_id", IntegerType(), True),
    ("family_id", StringType(), True),
    ("registration_year", TimestampType(), True),
    ("control", BooleanType(), True),
    ("withdrawn", BooleanType(), True),
    ("flagged_for_review", BooleanType(), True),
    ("created_by", StringType(), True),
    ("created_at", TimestampType(), True),
    ("updated_at", TimestampType(), True),
)

LOCAL_SUBJECT_IDS = _s(
    ("center_id", IntegerType(), False),
    ("local_subject_id", StringType(), False),
    ("identifier_type", StringType(), False),
    ("global_subject_id", StringType(), False),
    ("created_at", TimestampType(), True),
)

IDENTITY_RESOLUTIONS = _s(
    # resolution_id is the sink's serial PK (01-schema.sql:59) —
    # assigned at write time, not carried by the in-flight log rows
    ("resolution_id", LongType(), False),
    ("record_key", StringType(), True),
    ("action", StringType(), False),  # create_new|link_existing|conflict_resolved
    ("match_strategy", StringType(), True),
    ("confidence", StringType(), True),
    ("global_subject_id", StringType(), True),
    ("matched_gsids", StringType(), True),  # JSON array image
    ("requires_review", BooleanType(), True),
    # the resolving request's center (01-schema.sql input_center_id;
    # the per-center summary view groups on it)
    ("input_center_id", IntegerType(), True),
    ("batch_id", StringType(), True),
    ("created_at", TimestampType(), True),
)

DATA_CHANGE_AUDIT = _s(
    ("table_name", StringType(), False),
    ("record_key", StringType(), False),
    ("field", StringType(), False),
    ("old_value", StringType(), True),
    ("new_value", StringType(), True),
    ("batch_id", StringType(), True),
    ("source_fragment", StringType(), True),
    ("changed_at", TimestampType(), True),
)

SPECIMEN = _s(
    ("sample_id", StringType(), False),
    ("global_subject_id", StringType(), False),
    ("sample_type", StringType(), True),
    ("sample_available", BooleanType(), True),
    ("year_collected", IntegerType(), True),
)

SEQUENCE = _s(
    ("sample_id", StringType(), False),
    ("global_subject_id", StringType(), False),
    ("sequence_type", StringType(), True),
    ("platform", StringType(), True),
)

FAMILY = _s(
    ("family_id", StringType(), False),
    ("center_id", IntegerType(), True),
)

CONFLICT_RESOLUTIONS = _s(
    ("conflict_id", LongType(), False),
    ("local_subject_id", StringType(), False),
    ("identifier_type", StringType(), False),
    ("conflict_type", StringType(), False),  # center_mismatch|duplicate_id|multi_gsid
    ("resolution_action", StringType(), True),  # keep_existing|use_incoming|delete_both|merge|pending
    ("resolved", BooleanType(), True),
    ("batch_id", StringType(), True),
)

FRAGMENT_RESOLUTIONS = _s(
    ("batch_id", StringType(), False),
    ("table_name", StringType(), False),
    ("status", StringType(), True),
    ("rows_attempted", LongType(), True),
    ("rows_loaded", LongType(), True),
    ("rows_failed", LongType(), True),
    ("rows_inserted", LongType(), True),
    ("rows_updated", LongType(), True),
    ("rows_unchanged", LongType(), True),
)

TABLES: dict[str, StructType] = {
    "centers": CENTERS,
    "subjects": SUBJECTS,
    "local_subject_ids": LOCAL_SUBJECT_IDS,
    "identity_resolutions": IDENTITY_RESOLUTIONS,
    "data_change_audit": DATA_CHANGE_AUDIT,
    "specimen": SPECIMEN,
    "sequence": SEQUENCE,
    "family": FAMILY,
    "conflict_resolutions": CONFLICT_RESOLUTIONS,
    "fragment_resolutions": FRAGMENT_RESOLUTIONS,
}

# Natural keys (table_configs.json:1-46 semantics).
NATURAL_KEYS: dict[str, list[str]] = {
    "subjects": ["global_subject_id"],
    "local_subject_ids": ["local_subject_id", "identifier_type"],  # center-agnostic match
    "specimen": ["sample_id"],
    "sequence": ["sample_id"],
    "family": ["family_id"],
    "centers": ["center_id"],
}

# update-strategy.md:142-196; subjects is update_only with immutable
# identity fields (table_configs.json:37-45).
UPDATE_STRATEGIES: dict[str, str] = {
    "subjects": "update_only",
    "local_subject_ids": "upsert",
    "specimen": "upsert",
    "sequence": "upsert",
    "family": "upsert",
}

IMMUTABLE_FIELDS: dict[str, list[str]] = {
    "subjects": ["global_subject_id", "created_at", "registration_year"],
}

# Per-table default load exclusions (loader.py:34-38).
DEFAULT_EXCLUDES: dict[str, list[str]] = {
    "specimen": ["center_id"],
    "sequence": ["center_id"],
}
