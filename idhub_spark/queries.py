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
        # import-time guards: a duplicate name silently shadows a
        # query, and STACKED @query decorators bind one function to
        # two names — r7 shipped exactly that bug (a new @query block
        # inserted between an existing decorator and its def), caught
        # only by the sf0.1 oracle sim. Fail loudly at import instead.
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        for spec in REGISTRY.values():
            if spec.fn is fn:
                raise ValueError(
                    f"query {name!r}: function already registered as "
                    f"{spec.name!r} — stacked @query decorators?"
                )
        # arity guard: ANY def inserted between a @query decorator and
        # its intended function silently captures the registration —
        # r8 nearly shipped a 1-arg helper bound to simhash_buckets
        # (caught only at driver runtime). Every query callable takes
        # (spark, sf_dir); reject anything that can't.
        import inspect

        pos = [
            p
            for p in inspect.signature(fn).parameters.values()
            if p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)
        ]
        if len(pos) < 2:
            raise ValueError(
                f"query {name!r}: {fn.__name__} does not accept "
                "(spark, sf_dir) — did a helper def land between the "
                "@query decorator and its function?"
            )
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
    merge_into_q,
    multimodal_q,
    parity_q,
    projections,
    sampling_q,
    similarity_q,
    stats_q,
    streaming_q,
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
    # round 19 window (= first 50), composed EXACTLY as VERDICT r18
    # ask #1 pins. r19 is the first OPTIMIZATION round: this window
    # change is the one rotation action taken (no new queries, no
    # retirements; registry stays 146).
    # (1) the four r17-evidenced index composites riding r18-changed
    # dedup_index.py — the r18 dup-check rewrite is on their append
    # path, AND the r19 optimization diff hits the same paths again
    # (shuffle-free _doc_state, _params marker fast path, overlapped
    # staged writes, materialized retraction sets, expr-built
    # signature plans). All four MATCHed the r19 full sf0.01 + sf0.1
    # sims on the optimized tree.
    "minhash_index_lifecycle_state",
    "minhash_index_cadence_state",
    "minhash_index_stopbucket_state",
    "ivf_maintenance_state",
    # (2) the 46-key r16-latest cohort (r16's 50 minus the 4 rows
    # re-evidenced in r18), enumerated by the r18 round notes and
    # verified against CORRECTNESS_r16 + the live registry.
    # 4 + 46 = 50 exactly; after this pass no live evidence is older
    # than r17.
    "alias_resolution",
    "asof_last_click",
    "audit_trail",
    "avg_yearly_small_qty",
    "binary_features",
    "bpe_merge_apply",
    "change_stats",
    "conflict_apply_state",
    "conflict_detection",
    "conflict_exclusion",
    "conflict_summary",
    "csv_roundtrip_staging",
    "customer_order_distribution",
    "data_type_counts",
    "doc_chunking",
    "doc_fingerprint",
    "domain_mixture_weights",
    "event_value_percentiles",
    "family_linkage",
    "first_wins_dedup",
    "flexible_timestamp_parse",
    "forecast_revenue_change",
    "funnel_conversion",
    "fuzzy_center_match",
    "gopher_quality_rules",
    "gsid_filter",
    "heavy_hitter_users",
    "identity_link_back",
    "identity_resolution",
    "image_resize_check",
    "labkey_sync_state",
    "lang_id_heuristic",
    "per_center_summary",
    "per_subject_review",
    "pii_redaction",
    "priority_status_rollup",
    "quality_score",
    "repetition_filter",
    "replica_divergence",
    "returnflag_status_cube",
    "stateful_sessionize",
    "subject_enrichment",
    "token_count",
    "top_revenue_supplier",
    "type_coercion",
    "vocabulary_topk",
]


# Window guard, sibling to the duplicate/stacked/arity guards on
# @query: the 50-name window is rewritten by hand every round, and a
# typo'd or retired-but-not-removed name would otherwise be silently
# filtered — shrinking the driver's exactly-50 evidence window and
# sliding an arbitrary alphabetical query into the vacated slot with
# no signal (the intended row then expires under the 3-round policy).
# Checked on every _ordered() call, NOT at module import: importing a
# plan module directly (plans.X -> this module) re-enters while the
# plan package is mid-import, so REGISTRY is only partially populated
# at this module's top level — a module-level check raises spuriously
# on perfectly valid windows (found the hard way; conftest masked it
# by importing this module first).
def _check_driver_order(order: list[str], registry: dict) -> None:
    unknown = [n for n in order if n not in registry]
    if unknown:
        raise ValueError(f"_DRIVER_ORDER names not in REGISTRY: {unknown}")
    if len(order) != len(set(order)):
        dups = sorted({n for n in order if order.count(n) > 1})
        raise ValueError(f"_DRIVER_ORDER contains duplicate names: {dups}")


def _ordered() -> list[str]:
    _check_driver_order(_DRIVER_ORDER, REGISTRY)
    front = list(_DRIVER_ORDER)
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
