"""Change-detection / upsert-classification queries (SURVEY.md §2.10,
J5-J6, D2-D3).

Current state = orders with o_orderkey % 3 != 0; incoming batch =
orders with o_orderkey % 3 != 1, with o_totalprice bumped 10% on %5
rows and o_orderpriority nulled on %7 rows. So the classifier sees
all four outcomes: new (%3==0 keys), orphan (%3==1 keys), updated
(perturbed overlap), unchanged (clean overlap).

Outputs expose change_type and changed-field NAMES, not float images
— the classification itself compares values engine-side, so the
comparison result is deterministic even where float string
formatting is not.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from idhub_spark.operators.changes import classify_changes
from idhub_spark.operators.merge import merge_upsert
from idhub_spark.queries import query, tables

_CUR_INC_SQL = """
  cur AS (SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
          FROM orders WHERE o_orderkey % 3 <> 0),
  inc AS (SELECT o_orderkey, o_orderstatus,
                 CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 11.0
                      ELSE o_totalprice END AS o_totalprice,
                 CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderpriority END AS o_orderpriority
          FROM orders WHERE o_orderkey % 3 <> 1)
"""


def _cur_inc(t):
    o = t["orders"].select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
    cur = o.filter(F.col("o_orderkey") % 3 != 0)
    inc = o.filter(F.col("o_orderkey") % 3 != 1).select(
        "o_orderkey",
        "o_orderstatus",
        # +11.0 not round(*1.1): double addition is bit-identical
        # across engines; decimal rounding of a double at a .005
        # boundary is not
        F.when(F.col("o_orderkey") % 5 == 0, F.col("o_totalprice") + 11.0)
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        F.when(F.col("o_orderkey") % 7 == 0, F.lit(None).cast("string"))
        .otherwise(F.col("o_orderpriority"))
        .alias("o_orderpriority"),
    )
    return cur, inc


@query(
    "change_classification",
    f"""
    WITH {_CUR_INC_SQL}
    SELECT COALESCE(i.o_orderkey, c.o_orderkey) AS o_orderkey,
           CASE WHEN c.o_orderkey IS NULL THEN 'new'
                WHEN i.o_orderkey IS NULL THEN 'orphan'
                WHEN i.o_totalprice IS DISTINCT FROM c.o_totalprice
                  OR i.o_orderpriority IS DISTINCT FROM c.o_orderpriority
                  OR i.o_orderstatus IS DISTINCT FROM c.o_orderstatus THEN 'updated'
                ELSE 'unchanged' END AS change_type,
           concat_ws(',',
             CASE WHEN c.o_orderkey IS NOT NULL AND i.o_orderkey IS NOT NULL
                   AND i.o_orderpriority IS DISTINCT FROM c.o_orderpriority THEN 'o_orderpriority' END,
             CASE WHEN c.o_orderkey IS NOT NULL AND i.o_orderkey IS NOT NULL
                   AND i.o_orderstatus IS DISTINCT FROM c.o_orderstatus THEN 'o_orderstatus' END,
             CASE WHEN c.o_orderkey IS NOT NULL AND i.o_orderkey IS NOT NULL
                   AND i.o_totalprice IS DISTINCT FROM c.o_totalprice THEN 'o_totalprice' END
           ) AS changed_fields
    FROM inc i FULL OUTER JOIN cur c ON i.o_orderkey = c.o_orderkey
    """,
    doc="J5+J6: full-outer-join upsert classifier — new/updated/"
    "unchanged/orphan with changed-field names "
    "(load_strategies.py:141-182, update_detector.py:114-238).",
)
def change_classification(spark, sf_dir):
    t = tables(spark, sf_dir, "orders")
    cur, inc = _cur_inc(t)
    out = classify_changes(inc, cur, ["o_orderkey"])
    return out.select(
        "o_orderkey",
        "change_type",
        F.concat_ws(",", "changed_fields").alias("changed_fields"),
    )


@query(
    "orphan_detection",
    f"""
    WITH {_CUR_INC_SQL}
    SELECT c.o_orderkey, c.o_orderstatus, c.o_orderpriority
    FROM cur c WHERE NOT EXISTS (SELECT 1 FROM inc i WHERE i.o_orderkey = c.o_orderkey)
    """,
    doc="J6/D3: existing keys missing from incoming — the anti-join "
    "side of the classifier (update_detector.py:184-192).",
)
def orphan_detection(spark, sf_dir):
    t = tables(spark, sf_dir, "orders")
    cur, inc = _cur_inc(t)
    return cur.join(inc, "o_orderkey", "left_anti").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority"
    )


@query(
    "merge_upsert_stats",
    f"""
    WITH {_CUR_INC_SQL}
    SELECT change_type, COUNT(*) AS n FROM (
      SELECT CASE WHEN c.o_orderkey IS NULL THEN 'new'
                  WHEN i.o_orderkey IS NULL THEN 'orphan'
                  WHEN i.o_totalprice IS DISTINCT FROM c.o_totalprice
                    OR i.o_orderpriority IS DISTINCT FROM c.o_orderpriority
                    OR i.o_orderstatus IS DISTINCT FROM c.o_orderstatus THEN 'updated'
                  ELSE 'unchanged' END AS change_type
      FROM inc i FULL OUTER JOIN cur c ON i.o_orderkey = c.o_orderkey)
    GROUP BY change_type
    """,
    doc="A11 + §2.10 dry-run: per-change-type tallies from the merge "
    "classifier without executing the write (loader.py:213-234).",
)
def merge_upsert_stats(spark, sf_dir):
    t = tables(spark, sf_dir, "orders")
    cur, inc = _cur_inc(t)
    return merge_upsert(inc, cur, ["o_orderkey"], table_name="orders", batch_id="b").stats()


@query(
    "merged_state",
    f"""
    WITH {_CUR_INC_SQL}
    SELECT COALESCE(i.o_orderkey, c.o_orderkey) AS o_orderkey,
           CASE WHEN i.o_orderkey IS NOT NULL THEN i.o_orderstatus ELSE c.o_orderstatus END AS o_orderstatus,
           CASE WHEN i.o_orderkey IS NOT NULL THEN i.o_totalprice ELSE c.o_totalprice END AS o_totalprice,
           CASE WHEN i.o_orderkey IS NOT NULL THEN i.o_orderpriority ELSE c.o_orderpriority END AS o_orderpriority
    FROM inc i FULL OUTER JOIN cur c ON i.o_orderkey = c.o_orderkey
    """,
    doc="K4/§2.10: the post-upsert table image (insert new + update "
    "changed + keep orphans) — Delta MERGE INTO semantics as a "
    "DataFrame (load_strategies.py:92-194).",
)
def merged_state(spark, sf_dir):
    t = tables(spark, sf_dir, "orders")
    cur, inc = _cur_inc(t)
    return merge_upsert(inc, cur, ["o_orderkey"], table_name="orders", batch_id="b").merged


@query(
    "audit_trail",
    f"""
    WITH {_CUR_INC_SQL}
    SELECT 'orders' AS table_name, i.o_orderkey AS record_key, f.field,
           'b1' AS batch_id
    FROM inc i JOIN cur c ON i.o_orderkey = c.o_orderkey
    CROSS JOIN (VALUES ('o_orderstatus'), ('o_totalprice'), ('o_orderpriority')) AS f(field)
    WHERE (f.field = 'o_orderstatus' AND i.o_orderstatus IS DISTINCT FROM c.o_orderstatus)
       OR (f.field = 'o_totalprice' AND i.o_totalprice IS DISTINCT FROM c.o_totalprice)
       OR (f.field = 'o_orderpriority' AND i.o_orderpriority IS DISTINCT FROM c.o_orderpriority)
    """,
    doc="K6: one audit row per changed field, keyed by natural key + "
    "batch (load_strategies.py:673-704); values omitted from the "
    "oracle projection (float-image formatting), compared via the "
    "classifier instead.",
)
def audit_trail(spark, sf_dir):
    t = tables(spark, sf_dir, "orders")
    cur, inc = _cur_inc(t)
    res = merge_upsert(inc, cur, ["o_orderkey"], table_name="orders", batch_id="b1")
    return res.audit.select(
        "table_name",
        F.col("record_key")["o_orderkey"].cast("bigint").alias("record_key"),
        "field",
        "batch_id",
    )


@query(
    "first_wins_dedup",
    """
    SELECT user_id, event_type, event_id, value FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts, event_id) AS rn
      FROM events)
    WHERE rn = 1
    """,
    doc="D2: order-stable first-wins dedup on a composite key — "
    "row_number instead of dropDuplicates for deterministic 'first' "
    "(subject_id_resolver.py:150-161).",
)
def first_wins_dedup(spark, sf_dir):
    t = tables(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        t["events"]
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "value")
    )


@query(
    "scd2_history",
    """
    WITH img AS (
      SELECT c_custkey, CAST(round(c_acctbal * 100) AS BIGINT) AS cents,
             0 AS batch_seq
      FROM customer
      UNION ALL
      SELECT c_custkey,
             CAST(round((CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 10.0
                              ELSE c_acctbal END) * 100) AS BIGINT),
             1
      FROM customer
      UNION ALL
      SELECT c_custkey,
             CAST(round((CASE WHEN c_custkey % 3 = 0 THEN c_acctbal + 100.0
                              WHEN c_custkey % 7 = 0 THEN c_acctbal + 10.0
                              ELSE c_acctbal END) * 100) AS BIGINT),
             2
      FROM customer
      UNION ALL
      SELECT c_custkey + 10000000, CAST(round(c_acctbal * 100) AS BIGINT), 2
      FROM customer WHERE c_custkey % 11 = 0),
    marked AS (
      SELECT c_custkey, cents, batch_seq,
             (lag(batch_seq) OVER w IS NULL
              OR cents IS DISTINCT FROM lag(cents) OVER w) AS chg
      FROM img
      WINDOW w AS (PARTITION BY c_custkey ORDER BY batch_seq)),
    starts AS (SELECT c_custkey, cents, batch_seq FROM marked WHERE chg)
    SELECT c_custkey, cents,
           CAST(batch_seq AS INTEGER) AS valid_from,
           CAST(lead(batch_seq) OVER w2 - 1 AS INTEGER) AS valid_to,
           (lead(batch_seq) OVER w2 IS NULL) AS is_current
    FROM starts
    WINDOW w2 AS (PARTITION BY c_custkey ORDER BY batch_seq)
    """,
    doc="SCD Type-2 dimension build (operators/changes.py:"
    "scd2_versions): three deterministic per-batch images of customer "
    "(seed, %7 balance bump, %3 bump + late-arriving %11 keys) "
    "collapse into row versions with inclusive [valid_from, valid_to] "
    "batch intervals and a current flag — unchanged batches produce "
    "NO version row, late keys open at their first batch. Pure "
    "two-window dataflow (lag finds change starts, lead closes "
    "intervals), one shuffle on the key; complements the field-level "
    "audit trail (data_change_audit) with the row-version view "
    "warehouses consume. Oracle: identical window SQL.",
)
def scd2_history(spark, sf_dir):
    from idhub_spark.operators.changes import scd2_versions

    t = tables(spark, sf_dir, "customer")
    cust = t["customer"].select("c_custkey", "c_acctbal")
    cents = lambda col: F.round(col * 100, 0).cast("bigint")  # noqa: E731
    key = F.col("c_custkey")
    img0 = cust.select(key, cents(F.col("c_acctbal")).alias("cents"), F.lit(0).alias("batch_seq"))
    bal1 = F.when(key % 7 == 0, F.col("c_acctbal") + 10.0).otherwise(F.col("c_acctbal"))
    img1 = cust.select(key, cents(bal1).alias("cents"), F.lit(1).alias("batch_seq"))
    bal2 = (
        F.when(key % 3 == 0, F.col("c_acctbal") + 100.0)
        .when(key % 7 == 0, F.col("c_acctbal") + 10.0)
        .otherwise(F.col("c_acctbal"))
    )
    img2 = cust.select(key, cents(bal2).alias("cents"), F.lit(2).alias("batch_seq"))
    late = cust.filter(key % 11 == 0).select(
        (key + 10_000_000).alias("c_custkey"),
        cents(F.col("c_acctbal")).alias("cents"),
        F.lit(2).alias("batch_seq"),
    )
    images = img0.unionByName(img1).unionByName(img2).unionByName(late)
    return scd2_versions(images, ["c_custkey"], ["cents"])
