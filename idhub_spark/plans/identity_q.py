"""Identity-resolution queries (SURVEY.md §2.5 J1-J4, J7-J8) over the
synthetic star schema.

The registry is modeled from `customer` (local_subject_id = c_name,
GSID = derived key, created_at proxy = c_custkey) and incoming
records from `orders`, constructed so every dispatch branch fires:
~%10==5 rows carry an unseen ID (create_new), ~%10==0 rows carry a
second candidate pointing at a different customer (conflict_resolved
with oldest-wins), everything else links 1:1 (link_existing) with the
candidate case-flipped to exercise case-insensitive matching.

These run the library operators (operators/identity.py,
operators/conflicts.py, operators/centers.py); the oracle re-derives
the same semantics in ANSI SQL. Connected-components is exercised in
unit tests (not here) because transitive closure isn't expressible in
one oracle query.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from idhub_spark.operators.centers import fuzzy_match_names
from idhub_spark.operators.conflicts import detect_conflicts, find_duplicates
from idhub_spark.operators.identity import dispatch_matches, match_registry
from idhub_spark.queries import query, tables

# GSID proxy: deterministic per customer, sortable by custkey so
# "oldest by (created_at, gsid)" = min custkey.
_GSID_SQL = "'G-' || lpad(CAST(c_custkey AS VARCHAR), 9, '0')"


def _registry_df(t):
    c = t["customer"]
    return c.select(
        F.col("c_name").alias("local_subject_id"),
        F.concat(F.lit("G-"), F.lpad(F.col("c_custkey").cast("string"), 9, "0")).alias(
            "global_subject_id"
        ),
        # %19 rows carry a NULL created_at so the nulls-LAST tie-break
        # convention (dispatch_matches' nf flag) is actually exercised:
        # a NULL-dated match must lose to any dated match in its group
        F.when(F.col("c_custkey") % 19 == 0, F.lit(None))
        .otherwise(F.col("c_custkey"))
        .alias("created_at"),
    )


def _incoming_long_df(t, n_customers_expr):
    """Candidate IDs per order: cand1 = owner's name (upper-cased),
    cand2 = conflict/unseen injection by o_orderkey residue."""
    o = t["orders"].join(
        t["customer"].select("c_custkey", "c_name"),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    cand1 = F.upper(F.col("c_name"))
    other_key = (F.col("o_custkey") % n_customers_expr) + 1
    cand2 = (
        F.when(
            F.col("o_orderkey") % 10 == 0,
            F.concat(F.lit("Customer#"), F.lpad(other_key.cast("string"), 9, "0")),
        ).when(
            F.col("o_orderkey") % 10 == 5,
            F.concat(F.lit("UNSEEN-"), F.col("o_orderkey").cast("string")),
        )
    )
    wide = o.select(F.col("o_orderkey").alias("record_key"), cand1.alias("c1"), cand2.alias("c2"))
    entries = F.array(
        F.struct(F.col("c1").alias("local_subject_id"), F.lit("name").alias("identifier_type")),
        F.struct(F.col("c2").alias("local_subject_id"), F.lit("alt").alias("identifier_type")),
    )
    return (
        wide.select("record_key", F.explode(entries).alias("e"))
        .select("record_key", "e.local_subject_id", "e.identifier_type")
        .filter(F.col("local_subject_id").isNotNull())
    )


_INCOMING_SQL = """
  incoming AS (
    SELECT record_key, local_subject_id, identifier_type FROM (
      SELECT o_orderkey AS record_key, upper(c_name) AS local_subject_id, 'name' AS identifier_type
      FROM orders JOIN customer ON o_custkey = c_custkey
      UNION ALL
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 10 = 0
                    THEN 'Customer#' || lpad(CAST((o_custkey % (SELECT COUNT(*) FROM customer)) + 1 AS VARCHAR), 9, '0')
                  WHEN o_orderkey % 10 = 5
                    THEN 'UNSEEN-' || CAST(o_orderkey AS VARCHAR) END,
             'alt'
      FROM orders JOIN customer ON o_custkey = c_custkey)
    WHERE local_subject_id IS NOT NULL
  )
"""


@query(
    "identity_resolution",
    f"""
    WITH {_INCOMING_SQL},
    registry AS (
      SELECT c_name AS local_subject_id, {_GSID_SQL} AS global_subject_id,
             CASE WHEN c_custkey % 19 = 0 THEN NULL ELSE c_custkey END AS created_at
      FROM customer),
    matched AS (
      SELECT i.record_key, r.global_subject_id AS gsid, r.created_at
      FROM incoming i
      LEFT JOIN registry r ON lower(i.local_subject_id) = lower(r.local_subject_id))
    SELECT record_key,
           COUNT(DISTINCT gsid) AS n_matches,
           CASE WHEN COUNT(DISTINCT gsid) = 0 THEN 'create_new'
                WHEN COUNT(DISTINCT gsid) = 1 THEN 'link_existing'
                ELSE 'conflict_resolved' END AS action,
           (min(CASE WHEN gsid IS NOT NULL THEN {{'nf': created_at IS NULL, 'ca': created_at, 'g': gsid}} END)).g AS global_subject_id,
           COUNT(DISTINCT gsid) > 1 AS requires_review
    FROM matched
    GROUP BY record_key
    """,
    doc="J1+J2: case-insensitive registry lookup join + match-"
    "cardinality dispatch with oldest-(created_at,gsid) tie-break "
    "(identity_resolution.py:50-211).",
)
def identity_resolution(spark, sf_dir):
    t = tables(spark, sf_dir, "customer", "orders")
    n_cust = F.lit(t["customer"].count())
    ids_long = _incoming_long_df(t, n_cust)
    matched = match_registry(ids_long, _registry_df(t))
    out = dispatch_matches(matched)
    return out.select(
        "record_key",
        F.size("matched_gsids").alias("n_matches"),
        "action",
        "global_subject_id",
        "requires_review",
    )


@query(
    "identity_link_back",
    f"""
    WITH {_INCOMING_SQL},
    registry AS (
      SELECT c_name AS local_subject_id, {_GSID_SQL} AS global_subject_id,
             CASE WHEN c_custkey % 19 = 0 THEN NULL ELSE c_custkey END AS created_at
      FROM customer),
    matched AS (
      SELECT i.record_key, i.local_subject_id, i.identifier_type,
             r.global_subject_id AS gsid, r.created_at
      FROM incoming i
      LEFT JOIN registry r ON lower(i.local_subject_id) = lower(r.local_subject_id)),
    chosen AS (
      SELECT record_key, (min(CASE WHEN gsid IS NOT NULL THEN {{'nf': created_at IS NULL, 'ca': created_at, 'g': gsid}} END)).g AS global_subject_id
      FROM matched GROUP BY record_key
      HAVING COUNT(DISTINCT gsid) >= 1)
    SELECT DISTINCT m.local_subject_id, m.identifier_type, c.global_subject_id
    FROM matched m JOIN chosen c ON m.record_key = c.record_key
    """,
    doc="J3: link every candidate identifier back to the chosen GSID "
    "(identity_resolution.py:213-268); create_new rows excluded here "
    "so the minted-GSID nondeterminism stays out of the oracle.",
)
def identity_link_back(spark, sf_dir):
    from pyspark.storagelevel import StorageLevel

    t = tables(spark, sf_dir, "customer", "orders")
    n_cust = F.lit(t["customer"].count())
    # ids_long feeds both the registry match and the final link-back
    # join; persist so the orders x customer build runs once
    ids_long = _incoming_long_df(t, n_cust).persist(StorageLevel.MEMORY_AND_DISK)
    matched = match_registry(ids_long, _registry_df(t))
    chosen = dispatch_matches(matched).filter(F.col("global_subject_id").isNotNull())
    return (
        ids_long.join(chosen.select("record_key", "global_subject_id"), "record_key")
        .select("local_subject_id", "identifier_type", "global_subject_id")
        .distinct()
    )


@query(
    "conflict_detection",
    """
    WITH existing AS (
      SELECT c_name AS local_subject_id, 'name' AS identifier_type,
             c_nationkey AS center_id,
             'G-' || lpad(CAST(c_custkey AS VARCHAR), 9, '0') AS global_subject_id
      FROM customer),
    incoming AS (
      SELECT DISTINCT c_name AS local_subject_id, 'name' AS identifier_type,
             CASE WHEN c_custkey % 7 = 0 THEN c_nationkey + 1 ELSE c_nationkey END AS center_id,
             CASE WHEN c_custkey % 11 = 0 THEN 'G-X' || CAST(c_custkey AS VARCHAR)
                  ELSE 'G-' || lpad(CAST(c_custkey AS VARCHAR), 9, '0') END AS global_subject_id
      FROM customer)
    SELECT i.local_subject_id, i.identifier_type,
           CASE WHEN i.center_id <> e.center_id THEN 'center_mismatch'
                ELSE 'multi_gsid' END AS conflict_type,
           i.center_id AS incoming_center_id, e.center_id AS existing_center_id,
           i.global_subject_id AS incoming_gsid, e.global_subject_id AS existing_gsid,
           TRUE AS requires_review
    FROM incoming i
    JOIN existing e
      ON lower(i.local_subject_id) = lower(e.local_subject_id)
     AND i.identifier_type = e.identifier_type
    WHERE i.center_id <> e.center_id OR i.global_subject_id <> e.global_subject_id
    """,
    doc="J7: incoming-vs-existing conflict classification "
    "(conflict_detector.py:20-104) — center perturbed on %7, GSID on %11.",
)
def conflict_detection(spark, sf_dir):
    t = tables(spark, sf_dir, "customer")
    c = t["customer"]
    gsid = F.concat(F.lit("G-"), F.lpad(F.col("c_custkey").cast("string"), 9, "0"))
    existing = c.select(
        F.col("c_name").alias("local_subject_id"),
        F.lit("name").alias("identifier_type"),
        F.col("c_nationkey").alias("center_id"),
        gsid.alias("global_subject_id"),
    )
    incoming = c.select(
        F.col("c_name").alias("local_subject_id"),
        F.lit("name").alias("identifier_type"),
        F.when(F.col("c_custkey") % 7 == 0, F.col("c_nationkey") + 1)
        .otherwise(F.col("c_nationkey"))
        .alias("center_id"),
        F.when(
            F.col("c_custkey") % 11 == 0,
            F.concat(F.lit("G-X"), F.col("c_custkey").cast("string")),
        )
        .otherwise(gsid)
        .alias("global_subject_id"),
    )
    return detect_conflicts(incoming, existing)


@query(
    "conflict_apply_state",
    """
    WITH subjects AS (
      SELECT 'G-' || lpad(CAST(c_custkey AS VARCHAR), 9, '0') AS global_subject_id,
             c_nationkey AS center_id, c_name AS subject_name
      FROM customer),
    local_ids AS (
      SELECT c_nationkey AS center_id, c_name AS local_subject_id,
             'name' AS identifier_type,
             'G-' || lpad(CAST(c_custkey AS VARCHAR), 9, '0') AS global_subject_id
      FROM customer),
    resolutions AS (
      SELECT c_name AS local_subject_id, 'name' AS identifier_type,
             c_nationkey AS existing_center_id,
             c_nationkey + 100 AS incoming_center_id,
             'G-' || lpad(CAST(c_custkey AS VARCHAR), 9, '0') AS existing_gsid,
             CASE WHEN c_custkey % 8 = 0 THEN 'center_mismatch'
                  ELSE 'multi_gsid' END AS conflict_type,
             CASE WHEN c_custkey % 12 = 0 THEN 'keep_existing'
                  WHEN c_custkey % 12 = 4 THEN 'use_incoming'
                  ELSE 'delete_both' END AS resolution_action
      FROM customer WHERE c_custkey % 4 = 0),
    local_after AS (
      SELECT l.* FROM local_ids l
      WHERE NOT EXISTS (
        SELECT 1 FROM resolutions r
        WHERE r.resolution_action IN ('use_incoming', 'delete_both')
          AND r.existing_center_id = l.center_id
          AND lower(r.local_subject_id) = lower(l.local_subject_id)
          AND r.identifier_type = l.identifier_type)),
    upd AS (
      SELECT existing_gsid, existing_center_id,
             min(incoming_center_id) AS new_center
      FROM resolutions
      WHERE conflict_type = 'center_mismatch'
        AND resolution_action = 'use_incoming'
      GROUP BY existing_gsid, existing_center_id)
    SELECT 'subject' AS kind, s.global_subject_id,
           CAST(COALESCE(u.new_center, s.center_id) AS BIGINT) AS center_id,
           s.subject_name AS name
    FROM subjects s
    LEFT JOIN upd u ON u.existing_gsid = s.global_subject_id
                   AND u.existing_center_id = s.center_id
    UNION ALL
    SELECT 'local_id', global_subject_id, CAST(center_id AS BIGINT),
           local_subject_id
    FROM local_after
    """,
    doc="Existing-side conflict-resolution application "
    "(conflict_resolver.py:61-110 + fragment_resolution.py:389-564): "
    "use_incoming/delete_both delete the matching local_subject_ids "
    "row; center_mismatch + use_incoming also rewrites the subject's "
    "center_id. Output = post-application state of both tables, "
    "union-tagged. Fixture: 1-in-4 customers carry a resolution "
    "(action cycles keep_existing/use_incoming/delete_both on %12; "
    "conflict_type center_mismatch on %8).",
)
def conflict_apply_state(spark, sf_dir):
    from idhub_spark.operators.conflicts import (
        apply_center_updates,
        apply_resolutions_existing,
    )

    t = tables(spark, sf_dir, "customer")
    c = t["customer"]
    gsid = F.concat(F.lit("G-"), F.lpad(F.col("c_custkey").cast("string"), 9, "0"))
    subjects = c.select(
        gsid.alias("global_subject_id"),
        F.col("c_nationkey").alias("center_id"),
        F.col("c_name").alias("subject_name"),
    )
    local_ids = c.select(
        F.col("c_nationkey").alias("center_id"),
        F.col("c_name").alias("local_subject_id"),
        F.lit("name").alias("identifier_type"),
        gsid.alias("global_subject_id"),
    )
    resolutions = c.filter(F.col("c_custkey") % 4 == 0).select(
        F.col("c_name").alias("local_subject_id"),
        F.lit("name").alias("identifier_type"),
        F.col("c_nationkey").alias("existing_center_id"),
        (F.col("c_nationkey") + 100).alias("incoming_center_id"),
        gsid.alias("existing_gsid"),
        F.when(F.col("c_custkey") % 8 == 0, F.lit("center_mismatch"))
        .otherwise(F.lit("multi_gsid"))
        .alias("conflict_type"),
        F.when(F.col("c_custkey") % 12 == 0, F.lit("keep_existing"))
        .when(F.col("c_custkey") % 12 == 4, F.lit("use_incoming"))
        .otherwise(F.lit("delete_both"))
        .alias("resolution_action"),
    )
    local1 = apply_resolutions_existing(
        local_ids,
        resolutions.withColumn("center_id", F.col("existing_center_id")),
        ["center_id", "local_subject_id", "identifier_type"],
    )
    subjects2, local2 = apply_center_updates(subjects, local1, resolutions)
    return subjects2.select(
        F.lit("subject").alias("kind"),
        "global_subject_id",
        F.col("center_id").cast("long").alias("center_id"),
        F.col("subject_name").alias("name"),
    ).unionByName(
        local2.select(
            F.lit("local_id").alias("kind"),
            "global_subject_id",
            F.col("center_id").cast("long").alias("center_id"),
            F.col("local_subject_id").alias("name"),
        )
    )


@query(
    "duplicate_id_detection",
    """
    SELECT lower(local_subject_id) AS local_subject_id_norm, identifier_type,
           COUNT(DISTINCT global_subject_id) AS gsid_count,
           array_to_string(list_sort(list(DISTINCT global_subject_id)), ',') AS gsids,
           array_to_string(list_sort(list(DISTINCT center_id)), ',') AS centers
    FROM (
      SELECT 'DUP-' || CAST(c_custkey % 50 AS VARCHAR) AS local_subject_id,
             'name' AS identifier_type, CAST(c_nationkey AS VARCHAR) AS center_id,
             'G-' || lpad(CAST(c_custkey AS VARCHAR), 9, '0') AS global_subject_id
      FROM customer WHERE c_custkey % 13 = 0)
    GROUP BY local_subject_id_norm, identifier_type
    HAVING COUNT(DISTINCT global_subject_id) > 1
    """,
    doc="J8/A3: duplicate (local_id, type) -> multiple GSIDs "
    "(conflict_detector.py:130-182).",
)
def duplicate_id_detection(spark, sf_dir):
    t = tables(spark, sf_dir, "customer")
    existing = (
        t["customer"]
        .filter(F.col("c_custkey") % 13 == 0)
        .select(
            F.concat(F.lit("DUP-"), (F.col("c_custkey") % 50).cast("string")).alias(
                "local_subject_id"
            ),
            F.lit("name").alias("identifier_type"),
            F.col("c_nationkey").cast("string").alias("center_id"),
            F.concat(
                F.lit("G-"), F.lpad(F.col("c_custkey").cast("string"), 9, "0")
            ).alias("global_subject_id"),
        )
    )
    out = find_duplicates(existing)
    return out.select(
        "local_subject_id_norm",
        "identifier_type",
        "gsid_count",
        F.concat_ws(",", "gsids").alias("gsids"),
        F.concat_ws(",", "centers").alias("centers"),
    )


@query(
    "fuzzy_center_match",
    """
    WITH dirty AS (
      SELECT DISTINCT
        CASE WHEN n_nationkey % 3 = 0 THEN lower(replace(n_name, ' ', '_'))
             WHEN n_nationkey % 3 = 1 THEN substr(n_name, 1, length(n_name) - 2) || 'XX'
             ELSE 'ZZZ-' || CAST(n_nationkey AS VARCHAR) END AS name
      FROM nation),
    dim AS (SELECT n_nationkey AS matched_id, n_name AS matched_name,
                   lower(trim(replace(n_name, '_', ' '))) AS dnorm
            FROM nation),
    norm AS (SELECT name, lower(trim(replace(name, '_', ' '))) AS nnorm FROM dirty),
    exact AS (SELECT n.name, min(d.matched_id) AS exact_id
              FROM norm n JOIN dim d ON n.nnorm = d.dnorm GROUP BY n.name),
    fuzzy AS (
      SELECT name, matched_id AS fuzzy_id, score FROM (
        SELECT n.name, d.matched_id,
               CASE WHEN greatest(length(n.nnorm), length(d.dnorm)) = 0 THEN 1.0
                    ELSE 1.0 - CAST(levenshtein(n.nnorm, d.dnorm) AS DOUBLE)
                             / CAST(greatest(length(n.nnorm), length(d.dnorm)) AS DOUBLE) END AS score,
               row_number() OVER (PARTITION BY n.name
                                  ORDER BY CASE WHEN greatest(length(n.nnorm), length(d.dnorm)) = 0 THEN 1.0
                                      ELSE 1.0 - CAST(levenshtein(n.nnorm, d.dnorm) AS DOUBLE)
                                               / CAST(greatest(length(n.nnorm), length(d.dnorm)) AS DOUBLE) END DESC,
                                  d.matched_id ASC) AS rn
        FROM norm n CROSS JOIN dim d
        WHERE n.name NOT IN (SELECT name FROM exact))
      WHERE rn = 1 AND score >= 0.85)
    SELECT n.name,
           COALESCE(e.exact_id, f.fuzzy_id) AS matched_id,
           d.matched_name,
           CASE WHEN e.exact_id IS NOT NULL THEN 1.0 ELSE f.score END AS score,
           CASE WHEN e.exact_id IS NOT NULL THEN 'exact'
                WHEN f.fuzzy_id IS NOT NULL THEN 'fuzzy'
                ELSE 'none' END AS match_strategy
    FROM norm n
    LEFT JOIN exact e ON n.name = e.name
    LEFT JOIN fuzzy f ON n.name = f.name
    LEFT JOIN dim d ON COALESCE(e.exact_id, f.fuzzy_id) = d.matched_id
    """,
    doc="J4+W4: alias/exact/fuzzy name resolution as a broadcast "
    "similarity join with levenshtein ratio @0.85 and top-1 window "
    "(center_resolver.py:44-160; threshold config.py:70-73).",
)
def fuzzy_center_match(spark, sf_dir):
    t = tables(spark, sf_dir, "nation")
    n = t["nation"]
    dirty = n.select(
        F.when(
            F.col("n_nationkey") % 3 == 0,
            F.lower(F.regexp_replace("n_name", " ", "_")),
        )
        .when(
            F.col("n_nationkey") % 3 == 1,
            F.concat(
                F.expr("substr(n_name, 1, length(n_name) - 2)"), F.lit("XX")
            ),
        )
        .otherwise(F.concat(F.lit("ZZZ-"), F.col("n_nationkey").cast("string")))
        .alias("raw")
    ).distinct()
    return fuzzy_match_names(
        dirty,
        n,
        dirty_col="raw",
        dim_name_col="n_name",
        dim_id_col="n_nationkey",
    )


@query(
    "resolution_log",
    f"""
    WITH {_INCOMING_SQL},
    registry AS (
      SELECT c_name AS local_subject_id, {_GSID_SQL} AS global_subject_id,
             CASE WHEN c_custkey % 19 = 0 THEN NULL ELSE c_custkey END AS created_at
      FROM customer),
    matched AS (
      SELECT i.record_key, r.global_subject_id AS gsid, r.created_at
      FROM incoming i
      LEFT JOIN registry r ON lower(i.local_subject_id) = lower(r.local_subject_id)),
    resolved AS (
      SELECT record_key,
             CASE WHEN COUNT(DISTINCT gsid) = 0 THEN 'create_new'
                  WHEN COUNT(DISTINCT gsid) = 1 THEN 'link_existing'
                  ELSE 'conflict_resolved' END AS action,
             (min(CASE WHEN gsid IS NOT NULL THEN {{'nf': created_at IS NULL, 'ca': created_at, 'g': gsid}} END)).g AS global_subject_id,
             COUNT(DISTINCT gsid) > 1 AS requires_review
      FROM matched GROUP BY record_key)
    SELECT CAST(record_key AS VARCHAR) AS record_key, action,
           CASE action WHEN 'link_existing' THEN 'exact_match'
                       WHEN 'create_new' THEN 'create_new'
                       ELSE 'oldest_wins' END AS match_strategy,
           CASE action WHEN 'conflict_resolved' THEN 0.5 ELSE 1.0 END AS confidence,
           global_subject_id, requires_review,
           'b1' AS batch_id
    FROM resolved
    """,
    doc="identity_resolutions decision log (01-schema.sql:58-113): "
    "action, strategy, confidence, chosen GSID per resolution. The "
    "minted-GSID and JSON candidate columns are excluded from the "
    "oracle projection (mint nondeterminism / JSON formatting); both "
    "are unit-tested in test_operators.py.",
)
def resolution_log_q(spark, sf_dir):
    from idhub_spark.operators.identity import resolution_log

    t = tables(spark, sf_dir, "customer", "orders")
    n_cust = F.lit(t["customer"].count())
    ids_long = _incoming_long_df(t, n_cust)
    matched = match_registry(ids_long, _registry_df(t))
    resolved = dispatch_matches(matched)
    return resolution_log(resolved, batch_id="b1").select(
        "record_key",
        "action",
        "match_strategy",
        "confidence",
        "global_subject_id",
        "requires_review",
        "batch_id",
    )


@query(
    "alias_resolution",
    f"""
    WITH incoming AS (
      SELECT o_orderkey AS record_key,
             CASE WHEN o_orderkey % 4 = 0 THEN 'al-' || CAST(o_custkey % 25 AS VARCHAR)
                  WHEN o_orderkey % 4 = 1 THEN upper(c_name)
                  WHEN o_orderkey % 4 = 2 THEN 'AL-' || CAST(o_custkey % 25 AS VARCHAR)
                  ELSE 'NOPE-' || CAST(o_orderkey AS VARCHAR) END AS local_subject_id
      FROM orders JOIN customer ON o_custkey = c_custkey),
    registry AS (
      SELECT c_name AS local_subject_id, {_GSID_SQL} AS global_subject_id,
             CASE WHEN c_custkey % 19 = 0 THEN NULL ELSE c_custkey END AS created_at
      FROM customer),
    aliases AS (
      SELECT 'AL-' || CAST(n_nationkey AS VARCHAR) AS alias,
             'G-A' || lpad(CAST(n_nationkey AS VARCHAR), 8, '0') AS global_subject_id,
             n_nationkey - 1000 AS created_at
      FROM nation
      UNION ALL
      -- multi-match rows: same alias keys as nation 0..4 but a
      -- DIFFERENT gsid that sorts lexically AFTER 'G-A…' yet is
      -- OLDER (except regionkey 0: same created_at, so the lexical
      -- gsid tie-break fires instead) — the oldest-wins pick must
      -- choose by (created_at, gsid), not by gsid alone
      SELECT 'AL-' || CAST(r_regionkey AS VARCHAR),
             'G-Z' || lpad(CAST(r_regionkey AS VARCHAR), 8, '0'),
             CASE WHEN r_regionkey = 0 THEN -1000 ELSE r_regionkey - 2000 END
      FROM region),
    lookup AS (
      SELECT lower(local_subject_id) AS k, global_subject_id AS gsid, created_at
      FROM registry
      UNION ALL
      SELECT lower(alias), global_subject_id, created_at FROM aliases),
    matched AS (
      SELECT i.record_key, l.gsid, l.created_at
      FROM incoming i LEFT JOIN lookup l ON lower(i.local_subject_id) = l.k)
    SELECT record_key,
           COUNT(DISTINCT gsid) AS n_matches,
           CASE WHEN COUNT(DISTINCT gsid) = 0 THEN 'create_new'
                WHEN COUNT(DISTINCT gsid) = 1 THEN 'link_existing'
                ELSE 'conflict_resolved' END AS action,
           (min(CASE WHEN gsid IS NOT NULL THEN {{'nf': created_at IS NULL, 'ca': created_at, 'g': gsid}} END)).g AS global_subject_id,
           COUNT(DISTINCT gsid) > 1 AS requires_review
    FROM matched
    GROUP BY record_key
    """,
    doc="subject_alias path (01-schema.sql:35-39): candidates resolve "
    "through the alias->GSID table exactly like local_subject_ids — "
    "one unioned lookup side, case-insensitive, with the alias rows' "
    "created_at participating in the oldest-wins tie-break. The "
    "region-derived alias block collides with nation keys 0-4 on "
    "purpose: records there match TWO gsids whose created_at and "
    "lexical orders disagree, so the (created_at, gsid) tie-break "
    "(identity_resolution.py:180-183) is actually exercised, not "
    "just fixture-coincidentally green.",
)
def alias_resolution(spark, sf_dir):
    t = tables(spark, sf_dir, "customer", "orders", "nation", "region")
    o = t["orders"].join(
        t["customer"].select("c_custkey", "c_name"),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    cand = (
        F.when(
            F.col("o_orderkey") % 4 == 0,
            F.concat(F.lit("al-"), (F.col("o_custkey") % 25).cast("string")),
        )
        .when(F.col("o_orderkey") % 4 == 1, F.upper(F.col("c_name")))
        .when(
            F.col("o_orderkey") % 4 == 2,
            F.concat(F.lit("AL-"), (F.col("o_custkey") % 25).cast("string")),
        )
        .otherwise(F.concat(F.lit("NOPE-"), F.col("o_orderkey").cast("string")))
    )
    ids_long = o.select(
        F.col("o_orderkey").alias("record_key"),
        cand.alias("local_subject_id"),
        F.lit("any").alias("identifier_type"),
    )
    aliases = t["nation"].select(
        F.concat(F.lit("AL-"), F.col("n_nationkey").cast("string")).alias("alias"),
        F.concat(
            F.lit("G-A"), F.lpad(F.col("n_nationkey").cast("string"), 8, "0")
        ).alias("global_subject_id"),
        (F.col("n_nationkey") - 1000).alias("created_at"),
    ).unionByName(
        # deliberate multi-match collision block — see oracle comment
        t["region"].select(
            F.concat(F.lit("AL-"), F.col("r_regionkey").cast("string")).alias(
                "alias"
            ),
            F.concat(
                F.lit("G-Z"), F.lpad(F.col("r_regionkey").cast("string"), 8, "0")
            ).alias("global_subject_id"),
            F.when(F.col("r_regionkey") == 0, F.lit(-1000))
            .otherwise(F.col("r_regionkey") - 2000)
            .alias("created_at"),
        )
    )
    out = dispatch_matches(match_registry(ids_long, _registry_df(t), aliases))
    return out.select(
        "record_key",
        F.size("matched_gsids").alias("n_matches"),
        "action",
        "global_subject_id",
        "requires_review",
    )


@query(
    "identity_components",
    """
    SELECT component, COUNT(*) AS n_records FROM (
      SELECT min(o_orderkey) OVER (PARTITION BY o_custkey) AS component
      FROM orders WHERE o_orderkey % 5 = 0)
    GROUP BY component
    """,
    doc="Within-batch connected components over the record<->identifier "
    "bipartite graph (operators/identity.py, the sequential-parity "
    "algorithm). General iterative label propagation has no single-SQL "
    "twin, but THIS demo graph gives each record exactly one identifier "
    "(its customer), so its transitive closure is per-customer groups "
    "and the min-label convention is expressible as a window — the "
    "oracle pins the algorithm's output on star graphs; multi-hop "
    "chains are pinned by unit + randomized invariant tests.",
)
def identity_components(spark, sf_dir):
    from idhub_spark.operators.identity import connected_components

    t = tables(spark, sf_dir, "orders")
    # identifier graph: orders sharing a customer link into one
    # component; a 1-in-5 slice keeps the demo's iterative cost out of
    # the bench critical path (the algorithm is identical at any size)
    edges = (
        t["orders"]
        .filter(F.col("o_orderkey") % 5 == 0)
        .select(
            F.col("o_orderkey").alias("record_key"),
            F.concat(F.lit("C"), F.col("o_custkey").cast("string")).alias("_norm_id"),
        )
    )
    comps = connected_components(edges)
    return comps.groupBy("component").agg(F.count(F.lit(1)).alias("n_records"))


@query(
    "blocked_fuzzy_linkage",
    """
    WITH a AS (
      SELECT c_custkey AS a_key, c_name AS name,
             substr(md5('nid' || CAST(c_custkey AS VARCHAR)), 1, 12) AS nid
      FROM customer),
    b AS (
      SELECT c_custkey + 20000000 AS b_key,
             substr(c_name, 1, 9 + (c_custkey % 8)) || 'X' ||
               substr(c_name, 11 + (c_custkey % 8)) AS name,
             CASE WHEN c_custkey % 2 = 0 THEN
               substr(substr(md5('nid' || CAST(c_custkey AS VARCHAR)), 1, 12),
                      1, 7) || 'z' ||
               substr(substr(md5('nid' || CAST(c_custkey AS VARCHAR)), 1, 12), 9)
             ELSE substr(md5('nid' || CAST(c_custkey AS VARCHAR)), 1, 12)
             END AS nid
      FROM customer WHERE c_custkey % 5 = 0)
    SELECT b.b_key, a.a_key,
           CAST(levenshtein(a.name, b.name) AS BIGINT) AS name_dist,
           CAST(levenshtein(a.nid, b.nid) AS BIGINT) AS nid_dist
    FROM b JOIN a ON substr(a.nid, 1, 6) = substr(b.nid, 1, 6)
    WHERE levenshtein(a.name, b.name) <= 2
      AND levenshtein(a.nid, b.nid) <= 1
    """,
    doc="Blocked edit-distance record linkage — the scalable form of "
    "the reference's fuzzy matching (gsid-service "
    "subject_matcher.py:114-166 scores name similarity per candidate "
    "pair): an incoming batch with deterministic typos (one name char "
    "replaced; one identifier char corrupted for even keys) links "
    "back to the registry by BLOCKING on the identifier prefix "
    "(substr 1..6, untouched by the corruption) and verifying both "
    "fields with levenshtein inside the block — edit distance runs "
    "on block-join candidates only, never all-pairs (the same "
    "block->verify shape as the LSH dedup family). The identifier is "
    "a synthetic md5-derived national-ID stand-in (the corpus "
    "customer table carries no second string field), computed "
    "identically in the oracle. Near-key collisions inside a block "
    "(Customer#...1 vs #...2 are distance 1 apart) are part of the "
    "contract — the verify thresholds, not the blocking, define a "
    "match. At 100 TB blocks are prefix-bounded; skewed blocks fall "
    "to the salted-join escape hatch (storage.py).",
)
def blocked_fuzzy_linkage(spark, sf_dir):
    t = tables(spark, sf_dir, "customer")
    cust = t["customer"]
    nid = F.substring(
        F.md5(F.concat(F.lit("nid"), F.col("c_custkey").cast("string"))), 1, 12
    )
    a = cust.select(
        F.col("c_custkey").alias("a_key"),
        F.col("c_name").alias("name"),
        nid.alias("nid"),
    )
    corrupt_name = F.concat(
        F.expr("substring(c_name, 1, 9 + c_custkey % 8)"),
        F.lit("X"),
        F.expr("substring(c_name, 11 + c_custkey % 8)"),
    )
    corrupt_nid = F.concat(
        F.substring(nid, 1, 7), F.lit("z"), F.substring(nid, 9, 4)
    )
    b = cust.filter(F.col("c_custkey") % 5 == 0).select(
        (F.col("c_custkey") + 20000000).alias("b_key"),
        corrupt_name.alias("b_name"),
        F.when(F.col("c_custkey") % 2 == 0, corrupt_nid)
        .otherwise(nid)
        .alias("b_nid"),
    )
    joined = b.join(a, F.substring("nid", 1, 6) == F.substring("b_nid", 1, 6))
    return joined.filter(
        (F.levenshtein("name", "b_name") <= 2)
        & (F.levenshtein("nid", "b_nid") <= 1)
    ).select(
        "b_key",
        "a_key",
        F.levenshtein("name", "b_name").cast("bigint").alias("name_dist"),
        F.levenshtein("nid", "b_nid").cast("bigint").alias("nid_dist"),
    )
