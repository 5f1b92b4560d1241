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
    # round 16 front (window = first 50, composed EXACTLY as VERDICT
    # r15 ask #1 pinned — 2 changed-code rows + 48 of the 49-key
    # r13-latest cohort):
    # (1) the two rows riding r15-CHANGED entry points on r14
    # evidence: split_hot_clusters_state's entry gained the mandatory
    # append-staging settle (d13c2ef, ann.py), and
    # minhash_index_probe_state's probe entry gained the best-effort
    # _settle_delta_rewrite (8ae2840, dedup_index.py). Both paths
    # changed AGAIN in r16 (the ADVICE r15 fixes: the IVF append's
    # mandatory maintenance settle touches the shared materialize
    # path; the delta-rewrite rollback grew the rerun flag).
    "split_hot_clusters_state",
    "minhash_index_probe_state",
    # (2) the 48-key slice of the 49-key r13-latest cohort
    # (CORRECTNESS_r13 keys never re-evidenced in r14/r15, standing
    # <=3-rounds rotation policy). 2 + 49 = 51 > 50, so ONE cohort
    # key — order_priority_pivot (TPC-H micro, code untouched since
    # r13) — is DEFERRED to first position in r17, covered this round
    # by a targeted sf0.01 sim MATCH (the r14 lifecycle precedent;
    # run recorded in the round notes). After this pass no live
    # evidence is older than r14 except that one documented deferral.
    # NOTE: the four r15-evidenced index rows (lifecycle, cadence,
    # ivf_maintenance, stopbucket) ride code that changed in r16 (the
    # ADVICE fixes); their r15 evidence is valid until r18 and this
    # round's full-registry sf0.01+sf0.1 sims re-verify them vs the
    # oracle on the changed code — front them in r17.
    "alias_resolution",
    "ann_topk_ivf",
    "ann_topk_multiprobe",
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
