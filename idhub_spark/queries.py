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
    lifecycle_q,
    multimodal_q,
    projections,
    sampling_q,
    similarity_q,
    stats_q,
    temporal_q,
    text_q,
    tpch,
    windows_q,
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
