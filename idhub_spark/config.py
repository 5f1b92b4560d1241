"""Mapping-config loader/compiler (reference §1.1 dynamic schemas).

Two JSON dialects exist in the reference and both are supported:

1. Validator dialect (fragment-validator/config/bge_mapping.json:1-16,
   docs/curators/creating-mapping-files.md:11-120):
   {
     "table_name": "...",
     "field_mapping": {target: source, ...},
     "static_fields": {column: constant, ...},
     "subject_id_candidates": {column: identifier_type, ...},
     "center_id_field": "...", "default_center_id": 0,
     "exclude_from_load": [...]
   }

2. REDCap dialect (redcap-pipeline/config/gap_field_mappings.json:
   2-314): {"mappings": [{"source_field", "target_table",
   "target_field", "transform"?, "sample_type"?}, ...]}

Both compile to a flat FragmentMapping whose `select_columns()`
returns pure Column expressions — the config is resolved entirely at
plan-build time, so the executed plan is a plain projection.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from idhub_spark.functions.expressions import (
    boolean_expr,
    control_status_expr,
    extract_year_expr,
    null_normalize_expr,
    registration_year_expr,
)

# Transform registry (data_processor.py:68-86 + the documented fuller
# set, data-flow.md:559-585). Name -> Column -> Column.
TRANSFORMS = {
    "extract_year": extract_year_expr,
    "boolean": boolean_expr,
    "control": control_status_expr,
    "registration_year": registration_year_expr,
    # tolerant numeric parses: Spark 4's default ANSI mode makes a
    # plain .cast() THROW on malformed input; the reference nulls the
    # value instead (data_transformer.py:171-183, int(float(x)))
    "integer": lambda c: null_normalize_expr(c).try_cast("double").try_cast("int"),
    "float": lambda c: null_normalize_expr(c).try_cast("double"),
    "string": lambda c: null_normalize_expr(c),
    "upper": lambda c: F.upper(F.trim(c)),
    "lower": lambda c: F.lower(F.trim(c)),
}


@dataclass
class FragmentMapping:
    table_name: str
    field_mapping: dict[str, str] = field(default_factory=dict)  # target <- source
    static_fields: dict[str, object] = field(default_factory=dict)
    subject_id_candidates: dict[str, str] = field(default_factory=dict)  # column -> id type
    center_id_field: str | None = None
    default_center_id: int = 0
    exclude_from_load: list[str] = field(default_factory=list)
    transforms: dict[str, str] = field(default_factory=dict)  # target -> transform name

    def select_columns(self, df: DataFrame) -> list[Column]:
        """Compile the mapping to a projection list; warns (via the
        returned missing list) on absent sources like
        field_mapper.py:13-77."""
        cols: list[Column] = []
        for tgt, src in self.field_mapping.items():
            if src in df.columns:
                c = F.col(src)
                if tgt in self.transforms:
                    c = TRANSFORMS[self.transforms[tgt]](c)
                cols.append(c.alias(tgt))
            else:
                cols.append(F.lit(None).cast("string").alias(tgt))
        for k, v in self.static_fields.items():
            cols.append(F.lit(v).alias(k))
        # auto-include candidate/center columns (field_mapper.py:52-71)
        mapped_targets = set(self.field_mapping) | set(self.static_fields)
        for c in list(self.subject_id_candidates) + (
            [self.center_id_field] if self.center_id_field else []
        ):
            if c and c not in mapped_targets and c in df.columns:
                cols.append(F.col(c))
        return cols

    def missing_sources(self, df: DataFrame) -> list[str]:
        return sorted(
            src for src in self.field_mapping.values() if src not in df.columns
        )

    def apply(self, df: DataFrame) -> DataFrame:
        return df.select(*self.select_columns(df))


def load_mapping(path_or_dict) -> FragmentMapping:
    cfg = (
        path_or_dict
        if isinstance(path_or_dict, dict)
        else json.load(open(path_or_dict))
    )
    if "mappings" in cfg:
        return _from_redcap_dialect(cfg)
    return FragmentMapping(
        table_name=cfg.get("table_name", "?"),
        field_mapping=cfg.get("field_mapping", {}),
        static_fields=cfg.get("static_fields", {}),
        subject_id_candidates=cfg.get("subject_id_candidates", {}),
        center_id_field=cfg.get("center_id_field"),
        default_center_id=cfg.get("default_center_id", 0),
        exclude_from_load=cfg.get("exclude_from_load", []),
        transforms=cfg.get("transforms", {}),
    )


def enabled_projects(projects: dict[str, dict]) -> dict[str, dict]:
    """F6 enabled-project filter (redcap-pipeline/main.py:66-73): a
    multi-project run skips any project whose config sets
    enabled=false; an absent key defaults to enabled. Driver-side by
    design — the project list is a handful of dicts, and the gate runs
    before any Spark plan is built, so a disabled project costs zero
    cluster work."""
    return {k: v for k, v in projects.items() if v.get("enabled", True)}


def _from_redcap_dialect(cfg: dict) -> FragmentMapping:
    """Flatten a SINGLE-TABLE record-list dialect. A config whose
    mappings span several target_tables (the real
    gap_field_mappings.json shape: 5 tables, 46 specimen sample
    columns all targeting 'sample_id') must go through
    load_mappings_by_table — flattening it here would silently keep
    one of the 46 sample_id entries (last-writer-wins) and mix five
    tables' fields, so that is an error, not a quiet guess."""
    tables = {m["target_table"] for m in cfg["mappings"] if m.get("target_table")}
    if len(tables) > 1:
        raise ValueError(
            f"mapping config targets {len(tables)} tables {sorted(tables)}; "
            "use load_mappings_by_table() for multi-table REDCap configs"
        )
    # A SINGLE-table specimen config with several sample_type columns
    # all targeting 'sample_id' hits the same last-writer-wins collapse
    # the multi-table guard exists for — refuse it too.
    fan_out = sorted(m["source_field"] for m in cfg["mappings"] if m.get("sample_type"))
    if fan_out:
        raise ValueError(
            f"mapping config has sample_type fan-out columns {fan_out}; "
            "use load_mappings_by_table() + sample_columns() so every "
            "sample column survives"
        )
    # the general form of the same hazard: ANY repeated target_field
    # (sample_type or not) would collapse last-writer-wins below
    targets = [m["target_field"] for m in cfg["mappings"]]
    dupes = sorted({t for t in targets if targets.count(t) > 1})
    if dupes:
        raise ValueError(
            f"mapping config maps multiple source fields onto {dupes}; "
            "flattening would silently keep only the last source per "
            "target — make targets unique or use load_mappings_by_table()"
        )
    field_mapping: dict[str, str] = {}
    transforms: dict[str, str] = {}
    candidates: dict[str, str] = {}
    for m in cfg["mappings"]:
        tgt = m["target_field"]
        field_mapping[tgt] = m["source_field"]
        if m.get("transform"):
            transforms[tgt] = m["transform"]
        if m.get("identifier_type"):
            candidates[tgt] = m["identifier_type"]
    return FragmentMapping(
        table_name=cfg.get("target_table", cfg.get("table_name", "?")),
        field_mapping=field_mapping,
        transforms=transforms,
        subject_id_candidates=candidates,
        center_id_field=cfg.get("center_id_field"),
        default_center_id=cfg.get("default_center_id", 0),
    )


# target_fields whose transform is implied by name in the REDCap
# dialect (the reference hard-wires these in data_processor.py:
# extract_registration_year / extract_control_status)
_IMPLIED_TRANSFORMS = {"registration_year": "registration_year", "control": "control"}


def load_mappings_by_table(path_or_dict) -> dict[str, FragmentMapping]:
    """Compile a MULTI-TABLE REDCap record-list config (the real
    redcap-pipeline/config/gap_field_mappings.json shape) into one
    FragmentMapping per target table:

    - `local_subject_ids` entries are the subject-ID candidate
      columns (identifier type = the source field name, exactly how
      the reference's extract_subject_ids labels them);
    - `specimen` entries carrying `sample_type` are the sample
      fan-out columns — exposed via `sample_columns()` below, NOT
      collapsed into one last-writer-wins field_mapping;
    - everything else maps target_field <- source_field with implied
      transforms for registration_year/control.
    """
    cfg = (
        path_or_dict
        if isinstance(path_or_dict, dict)
        else json.load(open(path_or_dict))
    )
    out: dict[str, FragmentMapping] = {}
    ms = cfg["mappings"]
    candidates = {
        m["source_field"]: m["source_field"]
        for m in ms
        if m.get("target_table") == "local_subject_ids"
    }
    for table in sorted({m["target_table"] for m in ms}):
        sub = [m for m in ms if m["target_table"] == table]
        field_mapping: dict[str, str] = {}
        transforms: dict[str, str] = {}
        for m in sub:
            if m.get("sample_type"):
                continue  # sample fan-out column, see sample_columns()
            tgt = m["target_field"]
            field_mapping[tgt] = m["source_field"]
            t = m.get("transform") or _IMPLIED_TRANSFORMS.get(tgt)
            if t:
                transforms[tgt] = t
        out[table] = FragmentMapping(
            table_name=table,
            field_mapping=field_mapping,
            transforms=transforms,
            subject_id_candidates=candidates if table == "local_subject_ids" else {},
            center_id_field=cfg.get("center_id_field"),
            default_center_id=cfg.get("default_center_id", 0),
        )
    return out


def sample_columns(path_or_dict) -> dict[str, str]:
    """source_field -> sample_type for the specimen fan-out columns
    (redcap_sync's `sample_columns` parameter; data_processor.py:
    416-552 emits one specimen/sequence row per non-null column)."""
    cfg = (
        path_or_dict
        if isinstance(path_or_dict, dict)
        else json.load(open(path_or_dict))
    )
    return {
        m["source_field"]: m["sample_type"]
        for m in cfg["mappings"]
        if m.get("sample_type")
    }
