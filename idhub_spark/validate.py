"""Schema & data validation (reference §2.11).

- validate_schema: required-column presence + NOT-NULL null counts,
  skipping PK/system columns (fragment-validator/services/
  schema_validator.py:22-103). One aggregate pass computes every
  null count simultaneously (count(when(isNull,1)) per column) —
  a single job, map-side combined, instead of the reference's
  column-at-a-time loop.
- ID pattern validation lives in functions.expressions
  (id_validation_expr, P12).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

SYSTEM_COLUMNS = {"created_at", "updated_at", "id"}


@dataclass
class ValidationReport:
    ok: bool
    missing_columns: list[str] = field(default_factory=list)
    extra_columns: list[str] = field(default_factory=list)
    null_violations: dict[str, int] = field(default_factory=dict)
    row_count: int = 0


def validate_schema(
    df: DataFrame,
    target: StructType,
    *,
    required: list[str] | None = None,
    not_null: list[str] | None = None,
) -> ValidationReport:
    have = set(df.columns)
    want = {f.name for f in target.fields} - SYSTEM_COLUMNS
    required = [c for c in (required or sorted(want)) if c not in SYSTEM_COLUMNS]
    missing = [c for c in required if c not in have]
    extra = sorted(have - want - SYSTEM_COLUMNS)

    not_null = [c for c in (not_null or []) if c in have]
    null_counts: dict[str, int] = {}
    row_count = 0
    aggs = [F.count(F.lit(1)).alias("_rows")] + [
        F.count(F.when(F.col(c).isNull() | (F.trim(F.col(c).cast("string")) == ""), 1)).alias(c)
        for c in not_null
    ]
    row = df.agg(*aggs).collect()[0]
    row_count = row["_rows"]
    null_counts = {c: row[c] for c in not_null if row[c] > 0}

    return ValidationReport(
        ok=not missing and not null_counts,
        missing_columns=missing,
        extra_columns=extra,
        null_violations=null_counts,
        row_count=row_count,
    )


BATCH_ID_PATTERN = r"^batch_[0-9]{8}_[A-Za-z0-9_\-]+$"


def batch_id_valid(batch_id: str) -> bool:
    """Batch-ID format gate (the reference enforces it in CI,
    .github/workflows/fragment-ingestion.yml:29-38):
    batch_YYYYMMDD_<slug>."""
    import re

    return bool(re.match(BATCH_ID_PATTERN, batch_id or ""))


def infer_source_schema(df: DataFrame) -> dict[str, str]:
    """S2-style metadata helper: column -> Spark type name for a
    scanned source, used to draft mapping configs."""
    return {f.name: f.dataType.simpleString() for f in df.schema.fields}


@dataclass
class DictionaryReport:
    ok: bool
    missing_sources: list[str] = field(default_factory=list)
    missing_candidates: list[str] = field(default_factory=list)
    field_types: dict[str, str] = field(default_factory=dict)


def validate_mapping_against_dictionary(mapping, dictionary: DataFrame) -> DictionaryReport:
    """S2: check a FragmentMapping's source fields against the REDCap
    data dictionary (sources.rest.redcap_metadata) BEFORE fetching
    records — the reference pulls the dictionary for exactly this
    mapping sanity pass (redcap_client.py:189-204 + data_processor's
    field lookups). The dictionary is tiny (hundreds of rows); one
    collect, CAPPED so a mis-wired call can never pull a data table
    into the driver."""
    _DICT_ROW_CAP = 100_000
    rows = (
        dictionary.select("field_name", "field_type")
        .limit(_DICT_ROW_CAP + 1)
        .collect()
    )
    if len(rows) > _DICT_ROW_CAP:
        raise ValueError(
            f"data dictionary exceeds {_DICT_ROW_CAP} rows — this looks "
            "like a data table, not a metadata dictionary; refusing to "
            "collect it to the driver"
        )
    known = {r.field_name: r.field_type for r in rows}
    missing_sources = sorted(
        src for src in mapping.field_mapping.values() if src not in known
    )
    missing_candidates = sorted(
        c for c in mapping.subject_id_candidates
        if c not in known and c not in mapping.field_mapping
    )
    used = set(mapping.field_mapping.values()) | set(mapping.subject_id_candidates)
    return DictionaryReport(
        ok=not missing_sources and not missing_candidates,
        missing_sources=missing_sources,
        missing_candidates=missing_candidates,
        field_types={f: t for f, t in known.items() if f in used},
    )
