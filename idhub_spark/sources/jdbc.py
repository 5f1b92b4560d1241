"""JDBC source/sink adapter (S6 Postgres scans, K3/K4 write-side on a
real database).

The reference reads its registry tables straight from Postgres with
psycopg2 (table-loader/services/database.py, gsid-service/services/
database.py). On a cluster the same tables arrive through Spark's JDBC
data source; this module centralizes the option plumbing so every
caller gets partitioned, pushdown-friendly scans instead of a
single-connection full pull.

Scale rules encoded here:
- ALWAYS partition the read (partitionColumn/lowerBound/upperBound/
  numPartitions) — an unpartitioned JDBC scan is one executor holding
  one connection streaming the whole table.
- Push the projection and predicate into the `query`/`dbtable` option
  (database-side WHERE beats Spark-side filter on a full pull; Spark
  also pushes simple filters itself).
- fetchsize tuned >= 1000 (psycopg2's default cursor buffering is the
  reference's equivalent knob).
- Writes go through append/overwrite of a staging table + database-side
  MERGE; Spark's JDBC writer has no upsert, so merge_upsert computes
  the change set and only `inserted`/`updated` rows ship.

Exercised end to end against embedded Derby (bundled with Spark) by
the driver query `jdbc_partitioned_scan` (plans/io_q.py): Spark's
JDBC writer lands the table, JdbcSource reads it back partitioned,
and the aggregate hash-matches the parquet oracle. Production swaps
the URL/driver for Postgres; the option surface is identical.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class JdbcSource:
    """Connection + partitioning spec for one table/query scan."""

    url: str  # jdbc:postgresql://host:5432/db
    table: str  # table name or "(SELECT ...) AS sub" pushdown query
    user: str | None = None
    password: str | None = None
    driver: str = "org.postgresql.Driver"
    fetchsize: int = 10_000
    partition_column: str | None = None  # numeric/date/timestamp column
    lower_bound: int | str | None = None
    upper_bound: int | str | None = None
    num_partitions: int | None = None
    extra: dict[str, str] = field(default_factory=dict)

    def options(self) -> dict[str, str]:
        opts: dict[str, str] = {
            "url": self.url,
            "dbtable": self.table,
            "driver": self.driver,
            "fetchsize": str(self.fetchsize),
        }
        if self.user is not None:
            opts["user"] = self.user
        if self.password is not None:
            opts["password"] = self.password
        if self.partition_column is not None:
            if (
                self.lower_bound is None
                or self.upper_bound is None
                or not self.num_partitions
            ):
                raise ValueError(
                    "partition_column requires lower_bound, upper_bound and "
                    "num_partitions (unpartitioned JDBC scans do not scale)"
                )
            opts.update(
                partitionColumn=self.partition_column,
                lowerBound=str(self.lower_bound),
                upperBound=str(self.upper_bound),
                numPartitions=str(self.num_partitions),
            )
        opts.update(self.extra)
        return opts

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.format("jdbc").options(**self.options()).load()


def s3a_session_configs(
    *,
    endpoint: str | None = None,
    access_key_env: str = "AWS_ACCESS_KEY_ID",
    secret_key_env: str = "AWS_SECRET_ACCESS_KEY",
) -> dict[str, str]:
    """The builder configs that make `s3a://` paths work on a real
    cluster (S4; the reference's boto3 staging bucket,
    s3_client.py:22-41). Credentials come from the standard env/IAM
    provider chain — never inline literals. Apply with
    `for k, v in s3a_session_configs().items(): builder.config(k, v)`.
    Requires hadoop-aws on the cluster classpath (standard on EMR/
    Dataproc/Databricks images; not installable in this sandbox).
    """
    cfg = {
        "spark.hadoop.fs.s3a.aws.credentials.provider": (
            "com.amazonaws.auth.EnvironmentVariableCredentialsProvider,"
            "com.amazonaws.auth.InstanceProfileCredentialsProvider"
        ),
        # upload/commit tuning: the "magic" committer avoids the
        # rename-based commit that is O(data) on object stores
        "spark.hadoop.fs.s3a.committer.name": "magic",
        "spark.hadoop.fs.s3a.committer.magic.enabled": "true",
        "spark.hadoop.fs.s3a.connection.maximum": "64",
        "spark.hadoop.fs.s3a.fast.upload": "true",
    }
    if endpoint:
        cfg["spark.hadoop.fs.s3a.endpoint"] = endpoint
        cfg["spark.hadoop.fs.s3a.path.style.access"] = "true"
    return cfg
