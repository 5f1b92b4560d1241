"""Source/sink round-trip queries (SURVEY.md §2.1 S3/S4, §2.2 K1).

The reference's staging contract is
`staging/validated/{batch_id}/{table}.csv` on S3
(fragment-validator/services/validator.py:139-145, s3_client.py:22-41)
read back by the loader's CSV scan (loader.py:148). Here the SAME
write-then-scan path runs against a local staging root (the s3a://
URI scheme is the only difference at cluster scale), and the oracle
reads the original parquet directly — a hash-exact result proves the
sink+source glue is lossless, including doubles (Spark CSV writes
shortest-round-trip representations).

These were "untested*" components in rounds 1-4: real code, unit
tests only, no driver row. The round-trip query gives the file
source/sink pair driver-hash evidence.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from idhub_spark.plans._util import sql_ssum, ssum
from idhub_spark.queries import query, tables
from idhub_spark.sources.files import csv_scan
from idhub_spark.storage import write_staging_csv

_STAGING_SCHEMA = (
    "c_custkey bigint, c_name string, c_nationkey int, "
    "c_acctbal double, c_mktsegment string"
)

# The REST fixture servers materialize their corpus on the driver to
# simulate the external API; this constant bounds that materialization
# at any sf. Oracles carry the same ORDER BY + LIMIT.
_FIXTURE_ROW_CAP = 50000


@query(
    "csv_roundtrip_staging",
    f"""
    SELECT c_nationkey, c_mktsegment,
           COUNT(*) AS n_customers,
           {sql_ssum("c_acctbal", "total_acctbal")},
           min(c_name) AS first_name
    FROM customer
    GROUP BY c_nationkey, c_mktsegment
    """,
    doc="S3/S4 + K1 round-trip: customer -> write_staging_csv "
    "(staging/validated/{batch}/{table}.csv layout, K1) -> csv_scan "
    "with explicit schema (S3; no inference pass) -> aggregate. The "
    "oracle aggregates the original parquet, so a hash match proves "
    "the CSV sink/source pair preserves every value bit-exactly.",
)
def csv_roundtrip_staging(spark, sf_dir):
    t = tables(spark, sf_dir, "customer")
    # per-sf AND per-process staging root: sf scoping keeps sf0.001
    # tests and the sf0.01 driver run apart; PID scoping keeps two
    # CONCURRENT processes (driver + bench) from rmtree/overwriting
    # each other's staged data mid-read (same fix as merge_into_q)
    root = os.path.join(
        tempfile.gettempdir(),
        "idhub_stage_rt",
        f"{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    path = write_staging_csv(
        t["customer"], root, batch_id="b-rt", table="customer", single_file=False
    )
    staged = csv_scan(spark, path, schema=_STAGING_SCHEMA)
    return staged.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        ssum(F.col("c_acctbal"), "total_acctbal"),
        F.min("c_name").alias("first_name"),
    )


@query(
    "json_roundtrip_report",
    f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           {sql_ssum("o_totalprice", "total_price")},
           min(o_orderkey) AS first_key
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="K2 read-side + S9: JSON fragment sink (newline-delimited, the "
    "redcap_sync fragment layout, pipelines/redcap_sync.py:140-175) "
    "written then scanned back via sources/files.py:json_scan with an "
    "explicit schema; the oracle aggregates the original parquet, so "
    "a hash match proves JSON serialization preserves bigint/double/"
    "string values exactly.",
)
def json_roundtrip_report(spark, sf_dir):
    from idhub_spark.sources.files import json_scan

    t = tables(spark, sf_dir, "orders")
    # PID-scoped like idhub_stage_rt: concurrent processes must not
    # overwrite each other's staged files mid-read
    root = os.path.join(
        tempfile.gettempdir(),
        "idhub_json_rt",
        f"{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    path = os.path.join(root, "fragment.json")
    frag = t["orders"].select("o_orderkey", "o_orderpriority", "o_totalprice")
    frag.write.mode("overwrite").json(path)
    back = json_scan(
        spark, path,
        schema="o_orderkey bigint, o_orderpriority string, o_totalprice double",
    )
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        ssum(F.col("o_totalprice"), "total_price"),
        F.min("o_orderkey").alias("first_key"),
    )


@query(
    "rest_paginated_scan",
    f"""
    SELECT c_mktsegment,
           COUNT(*) AS n_customers,
           {sql_ssum("c_acctbal", "total_acctbal")},
           min(c_name) AS first_name
    FROM (SELECT * FROM customer ORDER BY c_custkey LIMIT {_FIXTURE_ROW_CAP}) customer
    GROUP BY c_mktsegment
    """,
    doc="S1: the REDCap-style paginated REST scan "
    "(redcap-pipeline/services/redcap_client.py:73-170) over REAL "
    "HTTP: an in-process server pages the customer table as JSON "
    "(offset/limit params) and fails the second page once with a 500 "
    "to prove the retry/backoff path; RestSource paginates, retries, "
    "and lands the records in a DataFrame. The oracle aggregates the "
    "parquet directly — a hash match proves the transport + pagination "
    "+ JSON decode pipeline is lossless, doubles included.",
)
def rest_paginated_scan(spark, sf_dir):
    import json as _json
    import threading
    import urllib.request
    from http.server import BaseHTTPRequestHandler, HTTPServer
    from urllib.parse import parse_qs, urlparse

    import pyarrow.parquet as pq

    from idhub_spark.sources.rest import RestSource

    # keep the parquet registered for the driver even though the scan
    # itself goes over HTTP
    tables(spark, sf_dir, "customer")
    # The fixture server materializes its corpus on the driver to play
    # the external API (the reference's S1 is inherently a driver-side
    # REST adapter) — cap it at a constant so the Python-object
    # conversion stays bounded if this ever runs at sf>=1: slice the
    # (columnar, zero-copy) Arrow table BEFORE to_pylist. The oracle
    # applies the same ORDER BY c_custkey LIMIT.
    rows = (
        pq.read_table(
            os.path.join(sf_dir, "customer.parquet"),
            columns=["c_custkey", "c_name", "c_mktsegment", "c_acctbal"],
        )
        .sort_by("c_custkey")
        .slice(0, _FIXTURE_ROW_CAP)
        .to_pylist()
    )
    failed_once = {"flag": False}

    class _Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # silence request logging
            pass

        def do_GET(self):
            qs = parse_qs(urlparse(self.path).query)
            offset = int(qs.get("offset", ["0"])[0])
            limit = int(qs.get("limit", ["100"])[0])
            # one transient 500 on the second page: the retry path is
            # exercised, the final result is unaffected
            if offset > 0 and not failed_once["flag"]:
                failed_once["flag"] = True
                self.send_response(500)
                self.end_headers()
                return
            body = _json.dumps(rows[offset : offset + limit]).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(body)

    server = HTTPServer(("127.0.0.1", 0), _Handler)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:

        def fetch_page(offset: int, limit: int) -> list[dict]:
            url = f"http://127.0.0.1:{port}/records?offset={offset}&limit={limit}"
            with urllib.request.urlopen(url, timeout=10) as resp:
                if resp.status != 200:
                    raise IOError(f"HTTP {resp.status}")
                return _json.loads(resp.read())

        src = RestSource(fetch_page, page_size=500, sleep=lambda _s: None)
        df = src.to_dataframe(
            spark,
            "c_custkey bigint, c_name string, c_mktsegment string, c_acctbal double",
        )
    finally:
        server.shutdown()
        thread.join(timeout=5)
    return df.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        ssum(F.col("c_acctbal"), "total_acctbal"),
        F.min("c_name").alias("first_name"),
    )


@query(
    "redcap_dictionary_scan",
    f"""
    SELECT 'f_' || CAST(p_partkey AS VARCHAR) AS field_name,
           lower(p_brand) AS form_name,
           CASE WHEN p_partkey % 3 = 0 THEN 'text'
                WHEN p_partkey % 3 = 1 THEN 'radio'
                ELSE 'yesno' END AS field_type,
           p_name AS field_label,
           NULLIF(CASE WHEN p_partkey % 3 = 1 THEN '1, Yes | 0, No' ELSE '' END, '')
             AS select_choices_or_calculations,
           NULLIF(CASE WHEN p_partkey % 5 = 0 THEN 'date_ymd' ELSE '' END, '')
             AS text_validation_type_or_show_slider_number,
           CASE WHEN p_partkey % 2 = 0 THEN 'y' ELSE 'n' END AS required_field,
           NULLIF('', '') AS identifier
    FROM (SELECT * FROM part ORDER BY p_partkey LIMIT {_FIXTURE_ROW_CAP}) part
    """,
    doc="S2: the REDCap data-dictionary scan "
    "(redcap-pipeline/services/redcap_client.py:189-204, "
    "content=metadata) over real HTTP with the same retry contract as "
    "the record scan (first request 500s once), including the "
    "dictionary's empty-string -> NULL normalization. Fixture "
    "dictionary derived from `part`; the oracle re-derives it with "
    "NULLIF-normalized blanks.",
)
def redcap_dictionary_scan(spark, sf_dir):
    import json as _json
    import threading
    import urllib.request
    from http.server import BaseHTTPRequestHandler, HTTPServer

    import pyarrow.parquet as pq

    from idhub_spark.sources.rest import redcap_metadata

    tables(spark, sf_dir, "part")
    # sf-bounded fixture: same constant cap + ORDER BY as the oracle;
    # Arrow-slice before to_pylist so the Python conversion is bounded
    parts = (
        pq.read_table(
            os.path.join(sf_dir, "part.parquet"),
            columns=["p_partkey", "p_name", "p_brand"],
        )
        .sort_by("p_partkey")
        .slice(0, _FIXTURE_ROW_CAP)
        .to_pylist()
    )
    dictionary = [
        {
            "field_name": f"f_{r['p_partkey']}",
            "form_name": r["p_brand"].lower(),
            "field_type": ("text", "radio", "yesno")[r["p_partkey"] % 3],
            "field_label": r["p_name"],
            "select_choices_or_calculations": (
                "1, Yes | 0, No" if r["p_partkey"] % 3 == 1 else ""
            ),
            "text_validation_type_or_show_slider_number": (
                "date_ymd" if r["p_partkey"] % 5 == 0 else ""
            ),
            "required_field": "y" if r["p_partkey"] % 2 == 0 else "n",
            "identifier": "",
        }
        for r in parts
    ]
    failed_once = {"flag": False}

    class _Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            if not failed_once["flag"]:
                failed_once["flag"] = True
                self.send_response(500)
                self.end_headers()
                return
            body = _json.dumps(dictionary).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(body)

    server = HTTPServer(("127.0.0.1", 0), _Handler)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:

        def fetch_dictionary() -> list[dict]:
            url = f"http://127.0.0.1:{port}/metadata"
            with urllib.request.urlopen(url, timeout=10) as resp:
                return _json.loads(resp.read())

        df = redcap_metadata(spark, fetch_dictionary, sleep=lambda _s: None)
    finally:
        server.shutdown()
        thread.join(timeout=5)
    return df


@query(
    "jdbc_partitioned_scan",
    f"""
    SELECT c_nationkey,
           COUNT(*) AS n_customers,
           {sql_ssum("c_acctbal", "total_acctbal")},
           min(c_name) AS first_name
    FROM customer
    GROUP BY c_nationkey
    """,
    doc="S6 + K3 write-side on a REAL database: customer lands in an "
    "embedded Derby instance through Spark's JDBC writer, then comes "
    "back through sources/jdbc.py:JdbcSource as a PARTITIONED scan "
    "(partitionColumn=c_custkey, 8 parallel connections — the scale "
    "rule the module enforces; an unpartitioned JDBC scan is one "
    "executor on one connection). Same option surface as the Postgres "
    "production path (table-loader/services/database.py) — only the "
    "URL/driver differ. Oracle aggregates the original parquet; a "
    "hash match proves the JDBC round-trip is lossless.",
)
def jdbc_partitioned_scan(spark, sf_dir):
    from idhub_spark.sources.jdbc import JdbcSource

    t = tables(spark, sf_dir, "customer")
    # Stable per-sf path: overwrite mode makes reruns idempotent, so
    # repeated bench/driver runs reuse one db dir instead of
    # accumulating a copy of customer per process (pid-suffixed paths
    # leaked disk). Keep derby.log out of the working directory by
    # pointing Derby's error stream into the db's parent (must be set
    # before the Derby engine first boots in this JVM; no-op after).
    db = os.path.join(
        tempfile.gettempdir(),
        f"idhub_derby_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    try:
        spark.sparkContext._jvm.java.lang.System.setProperty(
            "derby.stream.error.file", os.path.join(tempfile.gettempdir(), "derby.log")
        )
    except Exception:
        pass  # property is best-effort log hygiene, never query-fatal
    driver = "org.apache.derby.jdbc.EmbeddedDriver"

    def _write(path):
        u = f"jdbc:derby:{path};create=true"
        (
            t["customer"]
            .select("c_custkey", "c_name", "c_nationkey", "c_acctbal")
            .write.format("jdbc")
            .option("url", u)
            .option("dbtable", "CUSTOMER_RT")
            .option("driver", driver)
            .mode("overwrite")
            .save()
        )
        return u

    try:
        url = _write(db)
    except Exception:
        # embedded Derby is single-JVM: if another live process (e.g. a
        # concurrent pytest/bench run) has the shared per-sf db booted,
        # fall back to a pid-suffixed path — the rare-concurrency
        # escape hatch; the common sequential case reuses one dir
        db = f"{db}_{os.getpid()}"
        url = _write(db)
    # partition bounds: custkeys are dense 1..n (footer-served count)
    n = t["customer"].count()
    src = JdbcSource(
        url=url,
        table="CUSTOMER_RT",
        driver=driver,
        fetchsize=1000,
        partition_column="C_CUSTKEY",
        lower_bound=1,
        upper_bound=max(int(n), 2),
        num_partitions=8,
    )
    df = src.read(spark)
    # Derby uppercases identifiers; restore the parquet casing
    df = df.select(*[F.col(c).alias(c.lower()) for c in df.columns])
    return df.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_customers"),
        ssum(F.col("c_acctbal"), "total_acctbal"),
        F.min("c_name").alias("first_name"),
    )


@query(
    "orc_roundtrip_staging",
    f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_items,
           {sql_ssum("l_extendedprice", "total_price")},
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="Columnar-format parity beyond parquet: lineitem -> ORC sink "
    "(Spark's second built-in columnar format — vectorized reader, "
    "predicate pushdown, the Hive-ecosystem interchange format) -> "
    "ORC scan -> aggregate. The oracle aggregates the ORIGINAL "
    "parquet, so a hash match proves the ORC writer/reader pair "
    "preserves decimals, doubles, strings, and dates bit-exactly — "
    "the same sink/source contract csv_roundtrip_staging and "
    "json_roundtrip_report pin for the text formats.",
)
def orc_roundtrip_staging(spark, sf_dir):
    t = tables(spark, sf_dir, "lineitem")
    # PID-scoped like idhub_stage_rt: concurrent processes must not
    # overwrite each other's staged files mid-read
    root = os.path.join(
        tempfile.gettempdir(),
        "idhub_orc_rt",
        f"{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    cols = t["lineitem"].select(
        "l_returnflag", "l_linestatus", "l_extendedprice", "l_quantity"
    )
    cols.write.mode("overwrite").orc(root)
    staged = spark.read.orc(root)
    return staged.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        ssum(F.col("l_extendedprice"), "total_price"),
        F.sum(F.col("l_quantity").cast("bigint")).alias("total_qty"),
    )


_CK_BUCKET_SQL = (
    "CAST(CAST(('0x' || substr(md5('ck' || CAST(c_custkey AS VARCHAR)), 1, 8)) "
    "AS BIGINT) % 64 AS INTEGER)"
)
# NULL sentinel mirrors bucket_checksum: coalesce each column to
# chr(0)||'NULL' before joining (concat_ws skips nulls; '||' nulls the
# whole string — both would diverge from the Spark side on null data)
_CK_NULL = "chr(0) || 'NULL'"
_CK_ROW_SQL = (
    f"CAST(('0x' || substr(md5("
    f"COALESCE(CAST(c_custkey AS VARCHAR), {_CK_NULL}) || '|' || "
    f"COALESCE(c_name, {_CK_NULL}) || '|' || "
    f"COALESCE(CAST(cents AS VARCHAR), {_CK_NULL})), 1, 14)) AS BIGINT)"
)


@query(
    "replica_divergence",
    f"""
    WITH base AS (
      SELECT c_custkey, c_name,
             CAST(round(c_acctbal * 100) AS BIGINT) AS cents
      FROM customer),
    rep AS (
      SELECT c_custkey, c_name,
             cents + CASE WHEN c_custkey % 997 = 0 THEN 1 ELSE 0 END AS cents
      FROM base WHERE c_custkey % 991 <> 0),
    ca AS (
      SELECT {_CK_BUCKET_SQL} AS bucket, CAST(COUNT(*) AS BIGINT) AS n_a,
             CAST(SUM({_CK_ROW_SQL}) % 4611686018427387904 AS BIGINT) AS cs_a
      FROM base GROUP BY 1),
    cb AS (
      SELECT {_CK_BUCKET_SQL} AS bucket, CAST(COUNT(*) AS BIGINT) AS n_b,
             CAST(SUM({_CK_ROW_SQL}) % 4611686018427387904 AS BIGINT) AS cs_b
      FROM rep GROUP BY 1)
    SELECT COALESCE(ca.bucket, cb.bucket) AS bucket,
           COALESCE(n_a, 0) AS n_a, COALESCE(n_b, 0) AS n_b,
           CAST(ca.bucket IS NULL OR cb.bucket IS NULL
                OR n_a <> n_b OR cs_a <> cs_b AS BOOLEAN) AS diverged
    FROM ca FULL OUTER JOIN cb ON ca.bucket = cb.bucket
    """,
    doc="Anti-entropy replica comparison (storage.py:bucket_checksum): "
    "two copies of a table are compared by exchanging one "
    "(count, order-independent modular checksum) row per hash bucket "
    "— n_buckets summary rows each for a 100 TB table, no row "
    "shipping — and only divergent buckets need key-level diffing. "
    "The replica here is derived in-query with seeded divergence "
    "(cents drift on c_custkey % 997 = 0, deletions on % 991 = 0), "
    "and the oracle recomputes the identical md5-sum arithmetic, so "
    "a hash match proves the checksum algebra end to end: buckets "
    "holding a drifted/deleted key flag diverged, all others match "
    "byte-for-byte. Merkle-bucket repair scheme (Dynamo/Cassandra — "
    "public design), one level.",
)
def replica_divergence(spark, sf_dir):
    from idhub_spark.storage import bucket_checksum

    t = tables(spark, sf_dir, "customer")
    base = t["customer"].select(
        "c_custkey",
        "c_name",
        F.round(F.col("c_acctbal") * 100, 0).cast("bigint").alias("cents"),
    )
    rep = base.filter(F.col("c_custkey") % 991 != 0).select(
        "c_custkey",
        "c_name",
        (
            F.col("cents")
            + F.when(F.col("c_custkey") % 997 == 0, F.lit(1)).otherwise(F.lit(0))
        ).alias("cents"),
    )
    cols = ["c_custkey", "c_name", "cents"]
    ca = bucket_checksum(base, "c_custkey", cols).withColumnsRenamed(
        {"n_rows": "n_a", "checksum": "cs_a"}
    )
    cb = bucket_checksum(rep, "c_custkey", cols).withColumnsRenamed(
        {"n_rows": "n_b", "checksum": "cs_b"}
    )
    j = ca.join(cb, "bucket", "full_outer")
    return j.select(
        "bucket",
        F.coalesce("n_a", F.lit(0)).alias("n_a"),
        F.coalesce("n_b", F.lit(0)).alias("n_b"),
        (
            F.col("n_a").isNull()
            | F.col("n_b").isNull()
            | (F.col("n_a") != F.col("n_b"))
            | (F.col("cs_a") != F.col("cs_b"))
        ).alias("diverged"),
    )


@query(
    "compaction_roundtrip",
    """
    WITH src AS (
      SELECT event_id, user_id, event_type,
             CAST(round(value * 1000000.0) AS BIGINT) AS value_micros
      FROM events)
    SELECT CAST(CAST(('0x' || substr(md5('ck' || CAST(event_id AS VARCHAR)),
                      1, 8)) AS BIGINT) % 32 AS INTEGER) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(('0x' || substr(md5(
                  COALESCE(CAST(event_id AS VARCHAR), chr(0) || 'NULL') || '|' ||
                  COALESCE(CAST(user_id AS VARCHAR), chr(0) || 'NULL') || '|' ||
                  COALESCE(event_type, chr(0) || 'NULL') || '|' ||
                  COALESCE(CAST(value_micros AS VARCHAR), chr(0) || 'NULL')),
                  1, 14)) AS BIGINT))
                % 4611686018427387904 AS BIGINT) AS checksum
    FROM src GROUP BY 1
    """,
    doc="Small-file compaction proven LOSSLESS: events land as ~48 "
    "tiny parquet files (the incremental-ingestion debris shape), "
    "storage.compact_small_files coalesces them into ~target-size "
    "files with ZERO shuffle (coalesce glues partitions; a shuffling "
    "compactor would be the costliest job at 100 TB), and the result "
    "returned is the compacted directory's per-bucket anti-entropy "
    "checksum (storage.bucket_checksum). The oracle computes the "
    "same checksums from the ORIGINAL table, so a hash match proves "
    "row-exact preservation through the stage->compact->read chain — "
    "the verification a production compactor runs before swapping "
    "the compacted directory in. Floats canonicalized to micros "
    "before hashing (bucket_checksum discipline).",
)
def compaction_roundtrip(spark, sf_dir):
    from idhub_spark.storage import bucket_checksum, compact_small_files

    t = tables(spark, sf_dir, "events")
    src = t["events"].select(
        "event_id",
        "user_id",
        "event_type",
        F.round(F.col("value") * 1000000.0).cast("bigint").alias("value_micros"),
    )
    root = os.path.join(
        tempfile.gettempdir(),
        "idhub_compact",
        f"{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    small = os.path.join(root, "small")
    compacted = os.path.join(root, "compacted")
    src.repartition(48).write.mode("overwrite").parquet(small)
    compact_small_files(spark, small, compacted, target_bytes=1024 * 1024)
    out = spark.read.parquet(compacted)
    return bucket_checksum(
        out, "event_id", ["event_id", "user_id", "event_type", "value_micros"],
        n_buckets=32,
    )
