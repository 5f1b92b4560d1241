"""Driver anchors for §2 rows without their own oracle query yet:
P15 flexible timestamp parse, F2 invalid-GSID row filter, F3
conflict-exclusion anti-join, J11 subject enrichment joins, J12
family linkage.

Each models its reference operator over the synthetic star schema the
same way identity_q does: deterministic fixtures derived from
customer/orders/nation, the library operator on the Spark side, the
same semantics re-derived in ANSI SQL on the oracle side.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from idhub_spark.functions.expressions import GSID_REGEX, flexible_timestamp_expr
from idhub_spark.operators.conflicts import apply_resolutions
from idhub_spark.queries import query, tables


@query(
    "flexible_timestamp_parse",
    """
    SELECT o_orderkey,
           CASE WHEN raw ~ '^[0-9]{12,}$'
                THEN epoch_ms(CAST(raw AS BIGINT))
                ELSE try_cast(raw AS TIMESTAMP) END AS parsed_ts
    FROM (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 3 = 0
                    THEN CAST(1500000000000 + o_orderkey * 1000 AS VARCHAR)
                  WHEN o_orderkey % 3 = 1
                    THEN '2023-0' || CAST(1 + o_orderkey % 9 AS VARCHAR)
                         || '-11 08:30:0' || CAST(o_orderkey % 10 AS VARCHAR)
                  ELSE 'not a time' END AS raw
      FROM orders)
    """,
    doc="P15: flexible date/epoch parse (labkey_client.py:83-101) — "
    "epoch-milliseconds recognized by shape (>=12 digits), ISO strings "
    "through the normal parser, garbage -> NULL.",
)
def flexible_timestamp_parse(spark, sf_dir):
    t = tables(spark, sf_dir, "orders")
    raw = (
        F.when(
            F.col("o_orderkey") % 3 == 0,
            (F.lit(1500000000000) + F.col("o_orderkey") * 1000).cast("string"),
        )
        .when(
            F.col("o_orderkey") % 3 == 1,
            F.concat(
                F.lit("2023-0"),
                (1 + F.col("o_orderkey") % 9).cast("string"),
                F.lit("-11 08:30:0"),
                (F.col("o_orderkey") % 10).cast("string"),
            ),
        )
        .otherwise(F.lit("not a time"))
    )
    return t["orders"].select(
        "o_orderkey", flexible_timestamp_expr(raw).alias("parsed_ts")
    )


@query(
    "gsid_filter",
    """
    SELECT gsid, o_orderkey FROM (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 7 = 0
                    THEN 'GSID-' || lower(lpad(CAST(o_orderkey % 100000 AS VARCHAR), 16, '7'))
                  WHEN o_orderkey % 7 = 1
                    THEN 'GSID-' || lpad(CAST(o_orderkey % 100000 AS VARCHAR), 16, 'L')
                  ELSE 'GSID-' || lpad(CAST(o_orderkey % 100000 AS VARCHAR), 16, '7')
             END AS gsid
      FROM orders)
    WHERE regexp_matches(gsid, '^GSID-[0-9A-HJ-NP-TV-Z]{16}$')
    """,
    doc="F2: invalid-GSID row filter (load_batch.py gate; format "
    "contract gsid_generator.py:12) — rows whose GSID fails the "
    "Crockford-alphabet regex are dropped before load. %7==0 plants "
    "lowercase, %7==1 plants the excluded letter L.",
)
def gsid_filter(spark, sf_dir):
    t = tables(spark, sf_dir, "orders")
    body = F.lpad((F.col("o_orderkey") % 100000).cast("string"), 16, "7")
    gsid = (
        F.when(
            F.col("o_orderkey") % 7 == 0, F.concat(F.lit("GSID-"), F.lower(body))
        )
        .when(
            F.col("o_orderkey") % 7 == 1,
            F.concat(
                F.lit("GSID-"),
                F.lpad((F.col("o_orderkey") % 100000).cast("string"), 16, "L"),
            ),
        )
        .otherwise(F.concat(F.lit("GSID-"), body))
    )
    return (
        t["orders"]
        .select(gsid.alias("gsid"), "o_orderkey")
        .filter(F.col("gsid").rlike(GSID_REGEX))
    )


@query(
    "conflict_exclusion",
    """
    SELECT i.local_subject_id, i.center_id
    FROM (SELECT c_name AS local_subject_id, c_nationkey AS center_id,
                 c_custkey FROM customer) i
    WHERE NOT EXISTS (
      SELECT 1 FROM (
        SELECT c_name AS local_subject_id,
               CASE WHEN c_custkey % 3 = 0 THEN 'keep_existing'
                    WHEN c_custkey % 3 = 1 THEN 'use_incoming'
                    ELSE 'pending' END AS resolution_action
        FROM customer WHERE c_custkey % 2 = 0) r
      WHERE r.local_subject_id = i.local_subject_id
        AND r.resolution_action IN ('keep_existing', 'delete_both', 'pending'))
    """,
    doc="F3: conflict-exclusion anti-join (loader.py:279-292) — "
    "incoming rows whose key has a keep_existing/delete_both/pending "
    "resolution are excluded from the load; use_incoming rows pass.",
)
def conflict_exclusion(spark, sf_dir):
    t = tables(spark, sf_dir, "customer")
    incoming = t["customer"].select(
        F.col("c_name").alias("local_subject_id"),
        F.col("c_nationkey").alias("center_id"),
    )
    resolutions = (
        t["customer"]
        .filter(F.col("c_custkey") % 2 == 0)
        .select(
            F.col("c_name").alias("local_subject_id"),
            F.when(F.col("c_custkey") % 3 == 0, F.lit("keep_existing"))
            .when(F.col("c_custkey") % 3 == 1, F.lit("use_incoming"))
            .otherwise(F.lit("pending"))
            .alias("resolution_action"),
        )
    )
    return apply_resolutions(incoming, resolutions, ["local_subject_id"])


@query(
    "pending_resolutions_scan",
    """
    SELECT batch_id, local_subject_id, identifier_type, conflict_type,
           resolution_action, resolved,
           existing_gsid, CAST(existing_center_id AS BIGINT) AS existing_center_id,
           CAST(incoming_center_id AS BIGINT) AS incoming_center_id
    FROM (
      SELECT 'batch_' || CAST(c_custkey % 3 AS VARCHAR) AS batch_id,
             c_name AS local_subject_id, 'name' AS identifier_type,
             CASE WHEN c_custkey % 8 = 0 THEN 'center_mismatch'
                  ELSE 'multi_gsid' END AS conflict_type,
             CASE WHEN c_custkey % 5 = 0 THEN NULL
                  WHEN c_custkey % 5 = 1 THEN 'keep_existing'
                  WHEN c_custkey % 5 = 2 THEN 'use_incoming'
                  ELSE 'delete_both' END AS resolution_action,
             (c_custkey % 4 = 0) AS resolved,
             'G-' || lpad(CAST(c_custkey AS VARCHAR), 9, '0') AS existing_gsid,
             c_nationkey AS existing_center_id,
             c_nationkey + 100 AS incoming_center_id
      FROM customer) r
    WHERE batch_id = 'batch_1'
      AND resolution_action IS NOT NULL
      AND resolved = FALSE
    """,
    doc="F5 batch/status predicates — get_resolved_conflicts "
    "(fragment_resolution.py:302-350): one batch's actioned-but-not-"
    "yet-applied resolutions (resolution_action IS NOT NULL AND "
    "resolved = FALSE), the work-queue scan gating every conflict-"
    "application pass. Fixture: every customer carries a resolution "
    "row; batch cycles on %3, action on %5 (NULL = un-actioned), "
    "resolved on %4.",
)
def pending_resolutions_scan(spark, sf_dir):
    from idhub_spark.operators.conflicts import pending_resolutions

    t = tables(spark, sf_dir, "customer")
    c = t["customer"]
    resolutions = c.select(
        F.concat(F.lit("batch_"), (F.col("c_custkey") % 3).cast("string")).alias(
            "batch_id"
        ),
        F.col("c_name").alias("local_subject_id"),
        F.lit("name").alias("identifier_type"),
        F.when(F.col("c_custkey") % 8 == 0, F.lit("center_mismatch"))
        .otherwise(F.lit("multi_gsid"))
        .alias("conflict_type"),
        F.when(F.col("c_custkey") % 5 == 1, F.lit("keep_existing"))
        .when(F.col("c_custkey") % 5 == 2, F.lit("use_incoming"))
        .when(F.col("c_custkey") % 5 >= 3, F.lit("delete_both"))
        .alias("resolution_action"),
        (F.col("c_custkey") % 4 == 0).alias("resolved"),
        F.concat(
            F.lit("G-"), F.lpad(F.col("c_custkey").cast("string"), 9, "0")
        ).alias("existing_gsid"),
        F.col("c_nationkey").cast("long").alias("existing_center_id"),
        (F.col("c_nationkey") + 100).cast("long").alias("incoming_center_id"),
    )
    return pending_resolutions(resolutions, "batch_1")


@query(
    "subject_enrichment",
    """
    SELECT s.global_subject_id, s.subject_name, n.n_name AS center_name,
           COALESCE(ids.n_ids, 0) AS n_local_ids,
           COALESCE(ids.total_value, 0.0) AS total_value
    FROM (SELECT 'G-' || lpad(CAST(c_custkey AS VARCHAR), 9, '0') AS global_subject_id,
                 c_name AS subject_name, c_nationkey, c_custkey
          FROM customer) s
    JOIN nation n ON n.n_nationkey = s.c_nationkey
    LEFT JOIN (
      SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_ids,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_value
      FROM orders GROUP BY o_custkey) ids ON ids.o_custkey = s.c_custkey
    """,
    doc="J11: subject enrichment joins (api.py get_subject / "
    "routes.py:98-156) — subject x broadcast center dim x aggregated "
    "identifier rollup; the dim join broadcasts, the rollup is "
    "map-side combined before its shuffle.",
)
def subject_enrichment(spark, sf_dir):
    t = tables(spark, sf_dir, "customer", "nation", "orders")
    subjects = t["customer"].select(
        F.concat(F.lit("G-"), F.lpad(F.col("c_custkey").cast("string"), 9, "0")).alias(
            "global_subject_id"
        ),
        F.col("c_name").alias("subject_name"),
        "c_nationkey",
        "c_custkey",
    )
    rollup = (
        t["orders"]
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_ids"),
            (
                F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint")).cast(
                    "double"
                )
                / 100.0
            ).alias("total_value"),
        )
    )
    return (
        subjects.join(
            F.broadcast(t["nation"].select("n_nationkey", "n_name")),
            subjects["c_nationkey"] == F.col("n_nationkey"),
        )
        .join(rollup, subjects["c_custkey"] == F.col("o_custkey"), "left")
        .select(
            "global_subject_id",
            "subject_name",
            F.col("n_name").alias("center_name"),
            F.coalesce("n_ids", F.lit(0)).alias("n_local_ids"),
            F.coalesce("total_value", F.lit(0.0)).alias("total_value"),
        )
    )


@query(
    "family_linkage",
    """
    SELECT family_id, COUNT(*) AS n_members,
           min(global_subject_id) AS proband
    FROM (
      SELECT 'G-' || lpad(CAST(c_custkey AS VARCHAR), 9, '0') AS global_subject_id,
             'FAM-' || CAST(c_nationkey AS VARCHAR) || '-'
                    || CAST(c_custkey % 500 AS VARCHAR) AS family_id
      FROM customer)
    GROUP BY family_id
    HAVING COUNT(*) > 1
    """,
    doc="J12: family linkage (redcap_sync.py family fan-out; family "
    "table 01-schema.sql) — subjects sharing a family key group into "
    "one family row with a deterministic proband pick.",
)
def family_linkage(spark, sf_dir):
    t = tables(spark, sf_dir, "customer")
    return (
        t["customer"]
        .select(
            F.concat(
                F.lit("G-"), F.lpad(F.col("c_custkey").cast("string"), 9, "0")
            ).alias("global_subject_id"),
            F.concat(
                F.lit("FAM-"),
                F.col("c_nationkey").cast("string"),
                F.lit("-"),
                (F.col("c_custkey") % 500).cast("string"),
            ).alias("family_id"),
        )
        .groupBy("family_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.min("global_subject_id").alias("proband"),
        )
        .filter(F.col("n_members") > 1)
    )


@query(
    "load_batch_state",
    """
    WITH frag AS (
      SELECT 'S-' || CAST(c_custkey AS VARCHAR) AS sample_id,
             CASE WHEN c_custkey % 13 = 0 THEN 'nan'
                  ELSE 'G-' || lpad(CAST(c_custkey AS VARCHAR), 9, '0') END
               AS global_subject_id,
             lower(c_mktsegment) AS sample_type,
             c_custkey % 2 = 0 AS sample_available
      FROM customer),
    valid AS (
      SELECT * FROM frag
      WHERE global_subject_id IS NOT NULL
        AND trim(global_subject_id) <> ''
        AND lower(trim(global_subject_id)) <> 'nan'),
    cur AS (
      SELECT 'S-' || CAST(c_custkey AS VARCHAR) AS sample_id,
             'G-' || lpad(CAST(c_custkey AS VARCHAR), 9, '0') AS global_subject_id,
             CASE WHEN c_custkey % 6 = 0 THEN 'zzz'
                  ELSE lower(c_mktsegment) END AS sample_type,
             c_custkey % 2 = 0 AS sample_available
      FROM customer WHERE c_custkey % 3 = 0)
    SELECT COALESCE(v.sample_id, c.sample_id) AS sample_id,
           COALESCE(v.global_subject_id, c.global_subject_id) AS global_subject_id,
           COALESCE(v.sample_type, c.sample_type) AS sample_type,
           COALESCE(v.sample_available, c.sample_available) AS sample_available
    FROM valid v FULL OUTER JOIN cur c ON v.sample_id = c.sample_id
    """,
    doc="End-to-end load_batch pipeline state (§3.3: loader.py:68-254 "
    "-> pipelines/load_batch.py): report-driven + per-table default "
    "column exclusion (P4; center_id dropped via DEFAULT_EXCLUDES, "
    "scratch_note via the report), invalid-GSID row filter (F2; 'nan' "
    "rows dropped), schema-intersection projection, then the universal "
    "upsert. Oracle = upsert algebra directly: incoming wins on "
    "matched keys, current-only rows kept (incoming values coalesce "
    "over current in a full-outer join on the natural key). Fixture "
    "makes every merge branch fire: %13 invalid rows, %3 existing "
    "rows, %6 update rows, the rest inserts/unchanged.",
)
def load_batch_state(spark, sf_dir):
    from idhub_spark.pipelines.load_batch import load_batch

    t = tables(spark, sf_dir, "customer")
    c = t["customer"]
    gsid = F.concat(F.lit("G-"), F.lpad(F.col("c_custkey").cast("string"), 9, "0"))
    frag = c.select(
        F.concat(F.lit("S-"), F.col("c_custkey").cast("string")).alias("sample_id"),
        F.when(F.col("c_custkey") % 13 == 0, F.lit("nan"))
        .otherwise(gsid)
        .alias("global_subject_id"),
        F.lower("c_mktsegment").alias("sample_type"),
        (F.col("c_custkey") % 2 == 0).alias("sample_available"),
        # P4 coverage: DEFAULT_EXCLUDES drops center_id for specimen,
        # the report's exclude_from_load drops scratch_note
        F.col("c_nationkey").alias("center_id"),
        F.lit("tmp").alias("scratch_note"),
    )
    cur = c.filter(F.col("c_custkey") % 3 == 0).select(
        F.concat(F.lit("S-"), F.col("c_custkey").cast("string")).alias("sample_id"),
        gsid.alias("global_subject_id"),
        F.when(F.col("c_custkey") % 6 == 0, F.lit("zzz"))
        .otherwise(F.lower("c_mktsegment"))
        .alias("sample_type"),
        (F.col("c_custkey") % 2 == 0).alias("sample_available"),
    )
    out = load_batch(
        frag,
        cur,
        table_name="specimen",
        batch_id="b-lb",
        report={"exclude_from_load": ["scratch_note"]},
    )
    return out.merge.merged.select(
        "sample_id", "global_subject_id", "sample_type", "sample_available"
    )


@query(
    "labkey_sync_state",
    """
    WITH spec AS (
      SELECT 'S-' || CAST(c_custkey AS VARCHAR) AS sample_id,
             'G-' || lpad(CAST(c_custkey AS VARCHAR), 9, '0') AS global_subject_id,
             lower(c_mktsegment) AS sample_type,
             (c_custkey % 3 <> 0) AS sample_available,
             CAST(2000 + c_custkey % 20 AS INTEGER) AS year_collected
      FROM customer),
    lab AS (
      SELECT 'S-' || CAST(c_custkey AS VARCHAR) AS sample_id,
             CASE WHEN c_custkey % 4 = 0 THEN 'Consumed '
                  WHEN c_custkey % 7 = 0 THEN NULL
                  ELSE 'Available' END AS status,
             CASE WHEN c_custkey % 9 = 0 THEN NULL
                  WHEN c_custkey % 6 = 0
                    THEN CAST(1400000000000 + c_custkey * 86400000 AS VARCHAR)
                  ELSE '20' || lpad(CAST(10 + c_custkey % 15 AS VARCHAR), 2, '0')
                       || '-03-05 10:00:00' END AS collected_date
      FROM customer WHERE c_custkey % 2 = 0
      UNION ALL
      -- untracked LabKey rows: the semi-join must drop them
      SELECT 'X-' || CAST(c_custkey AS VARCHAR), 'Available', '2020-01-01 00:00:00'
      FROM customer WHERE c_custkey % 5 = 0),
    upd AS (
      SELECT l.sample_id,
             lower(trim(l.status)) AS st,
             CAST(year(CASE WHEN l.collected_date ~ '^[0-9]{12,}$'
                            THEN epoch_ms(CAST(l.collected_date AS BIGINT))
                            ELSE try_cast(l.collected_date AS TIMESTAMP) END)
                  AS INTEGER) AS yr
      FROM lab l JOIN spec s ON l.sample_id = s.sample_id)
    SELECT s.sample_id, s.global_subject_id, s.sample_type,
           CASE WHEN u.sample_id IS NOT NULL THEN
                  CASE WHEN u.st = 'consumed' THEN FALSE
                       ELSE s.sample_available END
                ELSE s.sample_available END AS sample_available,
           CASE WHEN u.sample_id IS NOT NULL THEN COALESCE(u.yr, s.year_collected)
                ELSE s.year_collected END AS year_collected
    FROM spec s LEFT JOIN upd u ON s.sample_id = u.sample_id
    """,
    doc="S8+J10 end to end: the LabKey specimen sync "
    "(labkey-sync/services/sync_service.py:19-80, "
    "specimen_updater.py:29-100) — extract rows semi-join the tracked "
    "specimen set (untracked LabKey samples dropped), and each field "
    "updates ONLY when its condition holds, per the reference's "
    "per-field UPDATE list: status 'consumed' sets "
    "sample_available=false (any other status, including NULL, keeps "
    "the current value — never a reset to true), a parseable "
    "collected_date (ISO or epoch-millis, P15) sets year_collected "
    "(a NULL date keeps the current year). Fixture: half the samples "
    "get LabKey rows; %4 consumed, %7 NULL status, %9 NULL date, %6 "
    "epoch-millis dates, %3 start unavailable, %5 untracked extras.",
)
def labkey_sync_state(spark, sf_dir):
    from idhub_spark.pipelines.labkey_sync import labkey_sync

    t = tables(spark, sf_dir, "customer")
    c = t["customer"]
    gsid = F.concat(F.lit("G-"), F.lpad(F.col("c_custkey").cast("string"), 9, "0"))
    specimen = c.select(
        F.concat(F.lit("S-"), F.col("c_custkey").cast("string")).alias("sample_id"),
        gsid.alias("global_subject_id"),
        F.lower("c_mktsegment").alias("sample_type"),
        (F.col("c_custkey") % 3 != 0).alias("sample_available"),
        (F.lit(2000) + F.col("c_custkey") % 20).cast("int").alias("year_collected"),
    )
    tracked = c.filter(F.col("c_custkey") % 2 == 0).select(
        F.concat(F.lit("S-"), F.col("c_custkey").cast("string")).alias("sample_id"),
        F.when(F.col("c_custkey") % 4 == 0, F.lit("Consumed "))
        .when(F.col("c_custkey") % 7 == 0, F.lit(None).cast("string"))
        .otherwise(F.lit("Available"))
        .alias("status"),
        F.when(F.col("c_custkey") % 9 == 0, F.lit(None).cast("string"))
        .when(
            F.col("c_custkey") % 6 == 0,
            (F.lit(1400000000000) + F.col("c_custkey") * 86400000).cast("string"),
        )
        .otherwise(
            F.concat(
                F.lit("20"),
                F.lpad((F.lit(10) + F.col("c_custkey") % 15).cast("string"), 2, "0"),
                F.lit("-03-05 10:00:00"),
            )
        )
        .alias("collected_date"),
    )
    untracked = c.filter(F.col("c_custkey") % 5 == 0).select(
        F.concat(F.lit("X-"), F.col("c_custkey").cast("string")).alias("sample_id"),
        F.lit("Available").alias("status"),
        F.lit("2020-01-01 00:00:00").alias("collected_date"),
    )
    out = labkey_sync(specimen, tracked.unionByName(untracked), batch_id="b-lk")
    return out.merged.select(
        "sample_id",
        "global_subject_id",
        "sample_type",
        "sample_available",
        F.col("year_collected").cast("int").alias("year_collected"),
    )
