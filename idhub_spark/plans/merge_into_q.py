"""Partition-pruned upsert driver queries (the lakehouse MERGE
binding, operators/merge_into.py).

Fixture geometry: the registry is customer partitioned by
bucket = c_custkey % 64 (a DuckDB-reproducible bucket function — the
production default is pmod(xxhash64(key), n), same pruning shape).
The incoming batch is CLUSTERED in bucket space (every incoming key
has bucket < 8), so a correct implementation rewrites at most 8 of 64
partitions — the stats query hashes exactly that, and
tests/test_storage.py asserts at the file level that untouched
partition files keep their mtimes.

Incoming classes (all derived from customer, deterministic):
- updated:   bucket < 8 and key % 3 == 0 -> c_acctbal + 5.0
- unchanged: bucket < 8 and key % 3 == 1 -> identical row (must NOT
  force a rewrite of its bucket unless an update/insert shares it)
- new:       key + 10_000_000 (10M % 64 == 0, so the bucket is
  unchanged) for bucket < 8 and key % 9 == 0
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from idhub_spark.queries import query, tables

_N_BUCKETS = 64


def _bucket_of(df):
    return F.pmod(F.col("c_custkey"), F.lit(_N_BUCKETS)).cast("int")


def _incoming(cust):
    key = F.col("c_custkey")
    in_window = key % _N_BUCKETS < 8
    updated = (
        cust.filter(in_window & (key % 3 == 0))
        .withColumn("c_acctbal", F.col("c_acctbal") + F.lit(5.0))
    )
    unchanged = cust.filter(in_window & (key % 3 == 1))
    fresh = cust.filter(in_window & (key % 9 == 0)).select(
        (key + F.lit(10_000_000)).alias("c_custkey"),
        F.concat(F.lit("NEW-"), key.cast("string")).alias("c_name"),
        F.lit(0.0).alias("c_acctbal"),
    )
    return updated.unionByName(unchanged).unionByName(fresh)


# Both driver queries replay the SAME deterministic seed+upsert. The
# STATE query always recomputes (it is the benchmark of the upsert —
# serving a bench pass from a memo would turn min-of-2 into a no-work
# replay and hide regressions); the derived STATS query reuses the
# state query's result when one exists in-process, and is
# self-contained when run alone.
_MEMO: dict[str, tuple] = {}


def _run_upsert(spark, sf_dir, *, force: bool):
    from idhub_spark.operators.merge_into import (
        partition_pruned_upsert,
        seed_bucketed_table,
    )

    if not force and sf_dir in _MEMO:
        return _MEMO[sf_dir]
    t = tables(spark, sf_dir, "customer")
    cust = t["customer"].select("c_custkey", "c_name", "c_acctbal")
    root = os.path.join(
        tempfile.gettempdir(),
        # PID-scoped like the streaming memory-sink names: two
        # concurrent driver/bench processes must not rmtree and
        # rewrite each other's seeded table mid-run
        f"idhub_pruned_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    shutil.rmtree(root, ignore_errors=True)
    seed_bucketed_table(
        cust, root, ["c_custkey"], n_buckets=_N_BUCKETS, bucket_of=_bucket_of
    )
    stats = partition_pruned_upsert(
        spark,
        root,
        _incoming(cust),
        ["c_custkey"],
        n_buckets=_N_BUCKETS,
        bucket_of=_bucket_of,
    )
    _MEMO[sf_dir] = (root, stats)
    return root, stats


@query(
    "partition_pruned_upsert",
    """
    WITH cur AS (SELECT c_custkey, c_name, c_acctbal FROM customer),
    inc AS (
      SELECT c_custkey, c_name, c_acctbal + 5.0 AS c_acctbal
      FROM cur WHERE c_custkey % 64 < 8 AND c_custkey % 3 = 0
      UNION ALL
      SELECT c_custkey, c_name, c_acctbal
      FROM cur WHERE c_custkey % 64 < 8 AND c_custkey % 3 = 1
      UNION ALL
      SELECT c_custkey + 10000000, 'NEW-' || CAST(c_custkey AS VARCHAR), 0.0
      FROM cur WHERE c_custkey % 64 < 8 AND c_custkey % 9 = 0)
    SELECT COALESCE(i.c_custkey, c.c_custkey) AS c_custkey,
           COALESCE(i.c_name, c.c_name) AS c_name,
           CAST(round(COALESCE(i.c_acctbal, c.c_acctbal) * 100) AS BIGINT) AS cents,
           CAST(COALESCE(i.c_custkey, c.c_custkey) % 64 AS BIGINT) AS bucket
    FROM cur c FULL OUTER JOIN inc i ON c.c_custkey = i.c_custkey
    """,
    doc="The MERGE binding's plain-parquet scale path, driver-checked "
    "END TO END: seed a bucket-partitioned registry "
    "(operators/merge_into.py:seed_bucketed_table), apply a clustered "
    "incoming batch through partition_pruned_upsert (pruned "
    "current-scan, full-outer classification, dynamic partition "
    "overwrite of ONLY the insert/update buckets), then read the "
    "table back from disk. Oracle = the full-outer-join merge image. "
    "A hash match proves the rewritten partitions carry the patched "
    "rows AND the untouched partitions still serve the original "
    "rows — i.e. pruning lost nothing. Reference semantics: "
    "table-loader/services/load_strategies.py:707-776.",
)
def partition_pruned_upsert_q(spark, sf_dir):
    root, _ = _run_upsert(spark, sf_dir, force=True)
    final = spark.read.parquet(root)
    return final.select(
        "c_custkey",
        "c_name",
        F.round(F.col("c_acctbal") * 100, 0).cast("bigint").alias("cents"),
        F.pmod(F.col("c_custkey"), F.lit(_N_BUCKETS)).cast("bigint").alias("bucket"),
    )


@query(
    "partition_pruned_upsert_stats",
    """
    WITH cur AS (SELECT c_custkey FROM customer),
    touched AS (
      SELECT DISTINCT c_custkey % 64 AS b FROM cur
      WHERE c_custkey % 64 < 8 AND (c_custkey % 3 <= 1 OR c_custkey % 9 = 0)),
    rw AS (
      SELECT DISTINCT c_custkey % 64 AS b FROM cur
      WHERE c_custkey % 64 < 8 AND (c_custkey % 3 = 0 OR c_custkey % 9 = 0))
    SELECT
      CAST((SELECT COUNT(DISTINCT c_custkey % 64) FROM cur) AS BIGINT) AS n_buckets_total,
      CAST((SELECT COUNT(*) FROM touched) AS BIGINT) AS n_buckets_touched,
      CAST((SELECT COUNT(*) FROM rw) AS BIGINT) AS n_buckets_rewritten,
      CAST((SELECT COUNT(*) FROM cur WHERE c_custkey % 64 IN (SELECT b FROM rw))
           + (SELECT COUNT(*) FROM cur
              WHERE c_custkey % 64 < 8 AND c_custkey % 9 = 0
                AND c_custkey % 64 IN (SELECT b FROM rw)) AS BIGINT) AS rows_rewritten
    """,
    doc="The PRUNING evidence for partition_pruned_upsert, "
    "hash-checked: the incoming batch is clustered into buckets < 8 "
    "of 64, so n_buckets_rewritten must be the (data-derived) count "
    "of buckets actually containing an insert or update — unchanged "
    "incoming rows alone must NOT rewrite their bucket — and "
    "rows_rewritten only the final rows of those buckets. The oracle "
    "derives all four numbers from the fixture arithmetic; an "
    "implementation that rewrote the whole table (the r6 VERDICT "
    "concern) or skipped the unchanged-class refinement fails the "
    "hash.",
)
def partition_pruned_upsert_stats_q(spark, sf_dir):
    _, stats = _run_upsert(spark, sf_dir, force=False)
    return (
        spark.range(1)
        .select(
            F.lit(stats.n_buckets_total).cast("long").alias("n_buckets_total"),
            F.lit(stats.n_buckets_touched).cast("long").alias("n_buckets_touched"),
            F.lit(stats.n_buckets_rewritten).cast("long").alias("n_buckets_rewritten"),
            F.lit(stats.rows_rewritten).cast("long").alias("rows_rewritten"),
        )
    )
