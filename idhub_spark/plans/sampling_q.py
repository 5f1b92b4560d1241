"""Deterministic sampling / split queries (training-pipeline
extension; operators/sampling.py). The md5-bucket selection is
reproduced verbatim in the DuckDB oracle, so the exact membership of
every split is verified — not just its size.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from idhub_spark.operators.sampling import (
    downsample_majority,
    hash_bucket,
    stratified_take,
    train_test_split,
)
from idhub_spark.queries import query, tables

_BUCKET_SQL = (
    "CAST(CAST(('0x' || substr(md5('{salt}' || CAST({key} AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS INTEGER)"
)


@query(
    "train_test_split",
    f"""
    SELECT split, COUNT(*) AS n_docs, min(doc_id) AS first_doc
    FROM (
      SELECT doc_id,
             CASE WHEN {_BUCKET_SQL.format(salt="split", key="doc_id")} < 20
                  THEN 'test' ELSE 'train' END AS split
      FROM documents)
    GROUP BY split
    """,
    doc="Deterministic hash-bucket holdout (20% test): same key -> "
    "same side on any run/cluster/partitioning, unlike randomSplit. "
    "Oracle verifies per-split counts AND representative membership.",
)
def train_test_split_q(spark, sf_dir):
    t = tables(spark, sf_dir, "documents")
    train, test = train_test_split(t["documents"], "doc_id", test_pct=20)

    def tag(df, name):
        return df.select("doc_id", F.lit(name).alias("split"))

    return (
        tag(train, "train")
        .unionByName(tag(test, "test"))
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("first_doc"))
    )


@query(
    "stratified_sample",
    f"""
    SELECT lang, doc_id FROM (
      SELECT lang, doc_id,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5('strat' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents)
    WHERE rn <= 10
    """,
    doc="Exactly-10-per-language deterministic sample: hash-ordered "
    "rank within stratum (stable pseudo-random order, no RNG).",
)
def stratified_sample_q(spark, sf_dir):
    t = tables(spark, sf_dir, "documents")
    return stratified_take(
        t["documents"], strata="lang", key="doc_id", n_per_stratum=10
    ).select("lang", "doc_id")


@query(
    "downsample_majority_class",
    f"""
    SELECT lang, COUNT(*) AS n
    FROM documents
    WHERE CASE WHEN lang = 'en'
               THEN {_BUCKET_SQL.format(salt="ds", key="doc_id")} < 25
               ELSE TRUE END
    GROUP BY lang
    """,
    doc="Class rebalancing: keep ~25% of the majority language, all "
    "of the rest — a pure deterministic filter, zero shuffle.",
)
def downsample_majority_q(spark, sf_dir):
    t = tables(spark, sf_dir, "documents")
    return (
        downsample_majority(
            t["documents"], label="lang", key="doc_id", keep_pct={"en": 25}
        )
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )
