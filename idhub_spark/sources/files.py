"""File scans (S3/S4/S9, K1/K2 read-side).

spark.read with explicit options; paths may be local, s3a://, or any
Hadoop-supported filesystem — the staging layout
staging/validated/{batch_id}/{table}.csv from the reference maps to
the same keys on object storage (s3_client.py:22-41).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def csv_scan(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    *,
    header: bool = True,
) -> DataFrame:
    """CSV fragment scan (validator.py:64, loader.py:148). With an
    explicit schema Spark skips the inference pass (one read, not
    two) — required at scale."""
    r = spark.read.option("header", header).option("mode", "PERMISSIVE")
    if schema is not None:
        r = r.schema(schema)
    else:
        r = r.option("inferSchema", True)
    return r.csv(path)


def json_scan(spark: SparkSession, path: str, schema: StructType | str | None = None) -> DataFrame:
    """JSON manifest / report scan (loader.py:74-85)."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.json(path)


def parquet_scan(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
