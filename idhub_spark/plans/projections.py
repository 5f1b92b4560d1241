"""Projection / mapping / scalar-transform queries (SURVEY.md §2.3).

Each query exercises one reference transform over the synthetic
tables, with a DuckDB oracle twin. The Spark side goes through the
library expressions in idhub_spark.functions (pure Catalyst — these
plans are all single-pass projections with pushdown-friendly scans;
no shuffle except the final small groupBys).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from idhub_spark.functions.expressions import (
    GSID_REGEX,
    boolean_expr,
    extract_year_expr,
    gsid_expr,
    id_validation_expr,
    normalize_name_expr,
    null_normalize_expr,
    registration_year_expr,
)
from idhub_spark.operators.identity import unpivot_candidates
from idhub_spark.plans._util import savg, sql_savg
from idhub_spark.queries import query, tables


@query(
    "field_mapping",
    """
    SELECT c_custkey AS subject_key,
           c_name AS subject_name,
           c_nationkey AS center_id,
           c_mktsegment AS segment,
           'fragment_upload' AS source_system
    FROM customer
    WHERE c_acctbal > 0
    """,
    doc="P1+P2+P4: config-driven rename/select + static field + exclusion "
    "(fragment-validator/services/field_mapper.py:13-77).",
)
def field_mapping(spark, sf_dir):
    t = tables(spark, sf_dir, "customer")
    mapping = {  # target <- source, as a bge_mapping.json-style dict
        "subject_key": "c_custkey",
        "subject_name": "c_name",
        "center_id": "c_nationkey",
        "segment": "c_mktsegment",
    }
    static_fields = {"source_system": "fragment_upload"}
    cols = [F.col(src).alias(tgt) for tgt, src in mapping.items()] + [
        F.lit(v).alias(k) for k, v in static_fields.items()
    ]
    return t["customer"].filter(F.col("c_acctbal") > 0).select(*cols)


@query(
    "type_coercion",
    r"""
    SELECT event_id,
           CAST(regexp_extract(props, '"k": (\d+)', 1) AS INTEGER) AS prop_k,
           CASE WHEN upper(trim(event_type)) IN ('', 'NULL', 'NA', 'N/A', 'NAN', 'NONE')
                THEN NULL ELSE trim(event_type) END AS event_type_clean,
           CAST(round(value * 100) AS BIGINT) AS value_cents
    FROM events
    WHERE event_id % 10 = 0
    """,
    doc="P5: schema-aware cast + null-sentinel normalization "
    "(table-loader/services/data_transformer.py:148-217).",
)
def type_coercion(spark, sf_dir):
    t = tables(spark, sf_dir, "events")
    return (
        t["events"]
        .filter(F.col("event_id") % 10 == 0)
        .select(
            "event_id",
            F.regexp_extract(F.col("props"), r'"k": (\d+)', 1).cast("int").alias("prop_k"),
            null_normalize_expr(F.col("event_type")).alias("event_type_clean"),
            # fixed-point cents as BIGINT: engine-exact, no decimal
            # formatting divergence between Spark and DuckDB
            F.round(F.col("value") * 100, 0).cast("bigint").alias("value_cents"),
        )
    )


@query(
    "extract_year",
    """
    SELECT TRY_CAST(string_split(CAST(o_orderdate AS VARCHAR), '-')[1] AS INTEGER) AS order_year,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY order_year
    """,
    doc="P6: first '-'-segment as tolerant int year (redcap "
    "data_processor.py:74-78 value.split('-')[0]; try_cast = the "
    "per-value None of the reference, ANSI-safe).",
)
def extract_year(spark, sf_dir):
    t = tables(spark, sf_dir, "orders")
    return (
        t["orders"]
        .select(extract_year_expr(F.col("o_orderdate")).alias("order_year"))
        .groupBy("order_year")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@query(
    "registration_year_normalize",
    """
    WITH formatted AS (
      SELECT o_orderkey,
             CASE o_orderkey % 6
               WHEN 0 THEN strftime(o_orderdate, '%Y-%m-%d')
               WHEN 1 THEN strftime(o_orderdate, '%m/%d/%Y')
               WHEN 2 THEN strftime(o_orderdate, '%Y/%m/%d')
               WHEN 3 THEN strftime(o_orderdate, '%Y-%m-%d') || ' 10:30:00'
               WHEN 4 THEN CAST(month(o_orderdate) AS VARCHAR) || '/' ||
                           CAST(day(o_orderdate) AS VARCHAR) || '/' ||
                           strftime(o_orderdate, '%Y')
               ELSE strftime(o_orderdate, '%Y')
             END AS raw_date
      FROM orders
    ), years AS (
      SELECT o_orderkey,
             CASE WHEN len(raw_date) >= 10 AND contains(raw_date, '-')
                    THEN TRY_CAST(string_split(raw_date, '-')[1] AS INTEGER)
                  WHEN regexp_matches(raw_date, '^\\d{4}$')
                    THEN TRY_CAST(raw_date AS INTEGER)
                  ELSE year(COALESCE(
                    CAST(try_strptime(raw_date, '%Y-%m-%d') AS DATE),
                    CAST(try_strptime(raw_date, '%m/%d/%Y') AS DATE),
                    CAST(try_strptime(raw_date, '%d/%m/%Y') AS DATE),
                    CAST(try_strptime(raw_date, '%Y/%m/%d') AS DATE)))
             END AS y
      FROM formatted
    )
    SELECT CAST(make_date(y, 1, 1) AS TIMESTAMP) AS registration_year, COUNT(*) AS n
    FROM years
    WHERE y BETWEEN 1900 AND 2100
    GROUP BY registration_year
    """,
    doc="P8: the reference's exact branch ORDER "
    "(data_processor.py:125-167): len>=10 with '-' takes the first "
    "segment as the year (so 'YYYY-MM-DD hh:mm:ss' datetime exports "
    "parse — branch %3 of the fixture), bare YYYY, then the four "
    "strptime formats with non-padded tolerance ('M/D/YYYY', branch "
    "%4). Jan-1 normalize, 1900-2100 validated.",
)
def registration_year_normalize(spark, sf_dir):
    t = tables(spark, sf_dir, "orders")
    # fixture strings built with lpad-concat, not date_format: the
    # DateTimeFormatter path costs more than the parse under test
    y = F.year("o_orderdate").cast("string")
    m1 = F.month("o_orderdate").cast("string")
    d1 = F.dayofmonth("o_orderdate").cast("string")
    m2 = F.lpad(m1, 2, "0")
    d2 = F.lpad(d1, 2, "0")
    raw = (
        F.when(F.col("o_orderkey") % 6 == 0, F.concat_ws("-", y, m2, d2))
        .when(F.col("o_orderkey") % 6 == 1, F.concat_ws("/", m2, d2, y))
        .when(F.col("o_orderkey") % 6 == 2, F.concat_ws("/", y, m2, d2))
        # datetime export: year taken from the first '-' segment
        .when(
            F.col("o_orderkey") % 6 == 3,
            F.concat(F.concat_ws("-", y, m2, d2), F.lit(" 10:30:00")),
        )
        # non-padded US date: the strptime-tolerance branch
        .when(F.col("o_orderkey") % 6 == 4, F.concat_ws("/", m1, d1, y))
        .otherwise(y)
    )
    # DuckDB %d/%m/%Y can mis-parse an MM/dd date as dd/mm when both
    # fields are <=12 — but the coalesce order tries %m/%d first in
    # both engines, so the first successful parse is identical.
    return (
        t["orders"]
        # timestamp output (not date): both engines hand back
        # datetime64, dodging date-vs-timestamp formatting divergence
        .select(registration_year_expr(raw).cast("timestamp").alias("registration_year"))
        .groupBy("registration_year")
        .agg(F.count(F.lit(1)).alias("n"))
        # no isNotNull filter: Catalyst pushes a group-key predicate
        # back below the aggregate, duplicating the whole parse chain
        # per row (measured 3x cost). Every fixture string parses and
        # the expr range-validates internally, so no null group exists
        # on either engine.
    )


@query(
    "boolean_parse",
    """
    SELECT COALESCE(CAST(parsed AS VARCHAR), '(null)') AS parsed_control, COUNT(*) AS n FROM (
      SELECT CASE lower(trim(CASE o_orderstatus WHEN 'O' THEN 'Yes' WHEN 'F' THEN '0' ELSE 'maybe' END))
               WHEN 'yes' THEN TRUE WHEN '1' THEN TRUE WHEN 'true' THEN TRUE WHEN 't' THEN TRUE WHEN 'y' THEN TRUE
               WHEN 'no' THEN FALSE WHEN '0' THEN FALSE WHEN 'false' THEN FALSE WHEN 'f' THEN FALSE WHEN 'n' THEN FALSE
               ELSE NULL END AS parsed
      FROM orders)
    GROUP BY parsed_control
    """,
    doc="P7+P9: truthy/falsy lexicon -> boolean (data_processor.py:79-84,169-197).",
)
def boolean_parse(spark, sf_dir):
    t = tables(spark, sf_dir, "orders")
    raw = (
        F.when(F.col("o_orderstatus") == "O", F.lit("Yes"))
        .when(F.col("o_orderstatus") == "F", F.lit("0"))
        .otherwise(F.lit("maybe"))
    )
    return (
        t["orders"]
        # string image of the tri-state bool: nullable-boolean group
        # keys round-trip differently through pandas in each engine
        .select(
            F.coalesce(boolean_expr(raw).cast("string"), F.lit("(null)")).alias(
                "parsed_control"
            )
        )
        .groupBy("parsed_control")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "id_validation",
    r"""
    WITH ids AS (
      SELECT c_custkey,
             CASE c_custkey % 8
               WHEN 0 THEN 'TEST' || CAST(c_custkey AS VARCHAR)
               WHEN 1 THEN CAST(c_custkey AS VARCHAR)
               WHEN 2 THEN 'id ' || CAST(c_custkey AS VARCHAR)
               WHEN 3 THEN 'OK-' || CAST(c_custkey AS VARCHAR)
               WHEN 4 THEN 'ab'
               WHEN 5 THEN 'Example' || CAST(c_custkey AS VARCHAR)
               WHEN 6 THEN repeat('9', 1 + c_custkey % 5)
               ELSE '  '
             END AS raw_id
      FROM customer),
    checked AS (
      SELECT c_custkey, raw_id, trim(raw_id) AS s,
             (trim(raw_id) = '') OR regexp_matches(trim(raw_id), '(?i)^test')
               OR regexp_matches(trim(raw_id), '(?i)^demo')
               OR regexp_matches(trim(raw_id), '(?i)^example')
               OR regexp_matches(trim(raw_id), '(?i)^0+$')
               OR regexp_matches(trim(raw_id), '(?i)^9+$')
               OR regexp_matches(trim(raw_id), '(?i)^x+$') AS is_error
      FROM ids)
    SELECT c_custkey, raw_id, NOT is_error AS valid,
           CASE WHEN s = '' THEN 'empty'
                WHEN is_error THEN 'error_pattern'
                ELSE concat_ws(',',
                  CASE WHEN regexp_matches(s, '^\d{1,3}$') THEN 'short_numeric' END,
                  CASE WHEN regexp_matches(s, '^[a-z]{1,2}$') THEN 'short_alpha' END,
                  CASE WHEN regexp_matches(s, '\s') THEN 'contains_whitespace' END,
                  CASE WHEN regexp_matches(s, '[^a-zA-Z0-9_-]') THEN 'special_characters' END,
                  CASE WHEN regexp_matches(s, '^\d+$') THEN 'purely_numeric' END,
                  CASE WHEN len(s) < 3 THEN 'too_short' END)
           END AS warnings
    FROM checked
    """,
    doc="P12: the reference's EXACT validator contract "
    "(gsid-service/services/id_validator.py:13-111): six error "
    "patterns incl. ^example and ^9+$, empty/whitespace-only ids are "
    "invalid errors (never silently valid), warning checks accumulate "
    "(short-numeric/short-alpha/whitespace/special/purely-numeric/"
    "len<3). Fixture branches plant every class incl. all-9s and "
    "whitespace-only ids.",
)
def id_validation(spark, sf_dir):
    t = tables(spark, sf_dir, "customer")
    key = F.col("c_custkey")
    raw = (
        F.when(key % 8 == 0, F.concat(F.lit("TEST"), key.cast("string")))
        .when(key % 8 == 1, key.cast("string"))
        .when(key % 8 == 2, F.concat(F.lit("id "), key.cast("string")))
        .when(key % 8 == 3, F.concat(F.lit("OK-"), key.cast("string")))
        .when(key % 8 == 4, F.lit("ab"))
        .when(key % 8 == 5, F.concat(F.lit("Example"), key.cast("string")))
        .when(key % 8 == 6, F.repeat(F.lit("9"), (F.lit(1) + key % 5).cast("int")))
        .otherwise(F.lit("  "))
    )
    v = id_validation_expr(F.col("raw_id"))
    return (
        t["customer"]
        .select("c_custkey", raw.alias("raw_id"))
        .select(
            "c_custkey",
            "raw_id",
            v["valid"].alias("valid"),
            F.concat_ws(",", v["warnings"]).alias("warnings"),
        )
    )


@query(
    "name_normalization",
    """
    SELECT lower(trim(replace('Seg_' || c_mktsegment, '_', ' '))) AS norm_name,
           COUNT(*) AS n
    FROM customer GROUP BY norm_name
    """,
    doc="P13: lower+trim+underscore->space (center_resolver.py:44-45).",
)
def name_normalization(spark, sf_dir):
    t = tables(spark, sf_dir, "customer")
    return (
        t["customer"]
        .select(
            normalize_name_expr(F.concat(F.lit("Seg_"), F.col("c_mktsegment"))).alias("norm_name")
        )
        .groupBy("norm_name")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "unpivot_candidates",
    """
    SELECT * FROM (
      SELECT c_custkey AS record_key, trim(c_name) AS local_subject_id,
             'name' AS identifier_type
      FROM customer
      UNION ALL
      SELECT c_custkey, trim(c_mktsegment), 'segment' FROM customer
      UNION ALL
      SELECT c_custkey,
             trim(CASE WHEN c_custkey % 3 = 0 THEN 'ALT-' || CAST(c_custkey AS VARCHAR)
                  WHEN c_custkey % 3 = 1 THEN 'NA' END),
             'alt' FROM customer
    ) WHERE local_subject_id IS NOT NULL
        AND upper(local_subject_id) NOT IN ('', 'NULL', 'NA', 'N/A', 'NAN', 'NONE')
    """,
    doc="P10: wide->long subject-ID candidate extraction with sentinel "
    "filtering (data_processor.py:199-211) — array+explode, one scan.",
)
def unpivot_candidates_q(spark, sf_dir):
    t = tables(spark, sf_dir, "customer")
    key = F.col("c_custkey")
    wide = t["customer"].select(
        "c_custkey",
        F.col("c_name").alias("name_id"),
        F.col("c_mktsegment").alias("segment_id"),
        F.when(key % 3 == 0, F.concat(F.lit("ALT-"), key.cast("string")))
        .when(key % 3 == 1, F.lit("NA"))
        .alias("alt_id"),
    )
    return unpivot_candidates(
        wide, "c_custkey", {"name_id": "name", "segment_id": "segment", "alt_id": "alt"}
    )


# NOT registered: xxhash64-minted GSIDs have no DuckDB twin, so a
# registry entry could only ever report `no_oracle` — burning a
# driver-window slot per rotation (the one non-hash row of
# CORRECTNESS_r09). The operator stays fully covered by the
# hash-green gsid_mint_shape twin below plus the mint-uniqueness
# property test (tests/test_properties.py).
def gsid_mint(spark, sf_dir):
    """P11: deterministic batch GSID minting (gsid_generator.py:15-60)."""
    t = tables(spark, sf_dir, "customer")
    return t["customer"].select(
        "c_custkey", gsid_expr(F.col("c_custkey")).alias("global_subject_id")
    )


@query(
    "gsid_mint_shape",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_distinct,
           CAST(count(*) AS BIGINT) AS n_valid_format,
           CAST(21 AS BIGINT) AS min_len,
           CAST(21 AS BIGINT) AS max_len
    FROM customer
    """,
    doc="P11 shape oracle: the minted GSID column has no DuckDB twin "
    "(xxhash64), but its CONTRACT does (gsid-service/tests/"
    "test_gsid_format.py:63-74) — every mint matches "
    "^GSID-[0-9A-HJ-NP-TV-Z]{16}$, is 21 chars, and is collision-free "
    "over the batch (count distinct = rows). The oracle states those "
    "invariants as constants; any format/length/collision break flips "
    "a Spark-side aggregate and fails the hash. Upgrades gsid_mint "
    "from rows-only to shape-checked.",
)
def gsid_mint_shape(spark, sf_dir):
    minted = gsid_mint(spark, sf_dir)
    return minted.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("global_subject_id").alias("n_distinct"),
        F.sum(
            F.when(F.col("global_subject_id").rlike(GSID_REGEX), 1).otherwise(0)
        ).cast("long").alias("n_valid_format"),
        F.min(F.length("global_subject_id")).cast("long").alias("min_len"),
        F.max(F.length("global_subject_id")).cast("long").alias("max_len"),
    )


@query(
    "acctbal_bucket_stats",
    f"""
    SELECT CASE WHEN c_acctbal < 0 THEN 'neg' WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END AS bucket,
           COUNT(*) AS n, {sql_savg("c_acctbal", "avg_bal")}
    FROM customer GROUP BY bucket
    """,
    doc="P5/A5 combo: derived bucketing + exact avg (validator report stats).",
)
def acctbal_bucket_stats(spark, sf_dir):
    t = tables(spark, sf_dir, "customer")
    bucket = (
        F.when(F.col("c_acctbal") < 0, F.lit("neg"))
        .when(F.col("c_acctbal") < 5000, F.lit("mid"))
        .otherwise(F.lit("high"))
    )
    return (
        t["customer"]
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"), savg(F.col("c_acctbal"), "avg_bal"))
    )


@query(
    "json_props_rollup",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           CAST(COUNT(DISTINCT k) AS BIGINT) AS n_distinct_k,
           CAST(min(k) AS BIGINT) AS min_k,
           CAST(max(k) AS BIGINT) AS max_k
    FROM (
      SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
      FROM events)
    GROUP BY event_type
    """,
    doc="Semi-structured extraction through the NATIVE JSON path "
    "(from_json with an explicit schema, not regexp): the props "
    "payload parses once into a typed struct per row — JVM-side, "
    "vectorized, mis-shaped payloads become NULL rather than "
    "killing the job — then rolls up per event_type. The regexp "
    "twin (prop_k in field_mapping's family) covers the reference's "
    "pattern-extract transform; this covers the schema'd-JSON "
    "ingestion every event pipeline actually uses. Oracle: DuckDB "
    "json_extract_string + identical integer aggregates.",
)
def json_props_rollup(spark, sf_dir):
    t = tables(spark, sf_dir, "events")
    k = F.from_json(F.col("props"), "k INT").getField("k")
    return (
        t["events"]
        .select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.countDistinct("k").alias("n_distinct_k"),
            F.min("k").cast("bigint").alias("min_k"),
            F.max("k").cast("bigint").alias("max_k"),
        )
    )
