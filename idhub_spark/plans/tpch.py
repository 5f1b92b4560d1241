"""Headline analytical queries over the synthetic star schema.

These exercise the reference's aggregation/join/sort surface
(SURVEY.md §2.6-§2.8) at TPC-H shape: scan -> filter (pushed to
parquet) -> hash aggregate with map-side partial aggregation -> sort.
Joins against small dims are broadcast (no shuffle of the fact
table); Catalyst/AQE pick the physical strategy.

Scale notes (100 TB): lineitem/orders are the big tables — every plan
here touches them exactly once, prunes columns at the scan, and
shuffles only the grouped/aggregated keys, never raw rows, except the
q3-style join which shuffles on the join key (AQE handles skew).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from idhub_spark.plans._util import savg, sql_savg, sql_ssum, ssum
from idhub_spark.queries import query, tables


@query(
    "pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           {sql_ssum("l_quantity", "sum_qty")},
           {sql_ssum("l_extendedprice", "sum_base_price")},
           {sql_ssum("l_extendedprice * (1 - l_discount)", "sum_disc_price")},
           {sql_ssum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge")},
           {sql_savg("l_quantity", "avg_qty")},
           {sql_savg("l_extendedprice", "avg_price")},
           {sql_savg("l_discount", "avg_disc")},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 shape; maps the reference's resolution-stats agg (A1).",
)
def pricing_summary(spark, sf_dir):
    t = tables(spark, sf_dir, "lineitem")
    li = t["lineitem"]
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            ssum(F.col("l_quantity"), "sum_qty"),
            ssum(F.col("l_extendedprice"), "sum_base_price"),
            ssum(disc, "sum_disc_price"),
            ssum(disc * (1 + F.col("l_tax")), "sum_charge"),
            savg(F.col("l_quantity"), "avg_qty"),
            savg(F.col("l_extendedprice"), "avg_price"),
            savg(F.col("l_discount"), "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "shipping_priority",
    f"""
    SELECT l_orderkey,
           {sql_ssum("l_extendedprice * (1 - l_discount)", "revenue")},
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1996-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shape; 3-way join, broadcast dims, deterministic top-k.",
)
def shipping_priority(spark, sf_dir):
    # Dims-first join order; no broadcast hints — AQE broadcasts the
    # small filtered sides on its own and picks a better plan than a
    # hand-hinted one (measured 2-3x at sf0.1).
    t = tables(spark, sf_dir, "customer", "orders", "lineitem")
    cust = t["customer"].filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    ords = t["orders"].filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = t["lineitem"].filter(
        F.col("l_shipdate") > F.lit("1996-03-15 00:00:00").cast("timestamp")
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        cust.join(ords, cust.c_custkey == ords.o_custkey)
        .join(li, li.l_orderkey == ords.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(ssum(disc, "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "local_supplier_volume",
    f"""
    SELECT n_name, {sql_ssum("l_extendedprice * (1 - l_discount)", "revenue")}
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
    doc="TPC-H Q5 shape; 6-way star join, all dims broadcast.",
)
def local_supplier_volume(spark, sf_dir):
    t = tables(spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region")
    ords = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    nat = t["nation"].join(
        t["region"].filter(F.col("r_name") == "ASIA"),
        F.col("n_regionkey") == F.col("r_regionkey"),
    )
    sup = t["supplier"].join(nat, F.col("s_nationkey") == F.col("n_nationkey"))
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t["customer"]
        .join(ords, F.col("c_custkey") == F.col("o_custkey"))
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            sup,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(ssum(disc, "revenue"))
    )


@query(
    "returned_item_report",
    f"""
    SELECT c_custkey, c_name,
           {sql_ssum("l_extendedprice * (1 - l_discount)", "revenue")},
           c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape; top returned-revenue customers.",
)
def returned_item_report(spark, sf_dir):
    t = tables(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    ords = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    li = t["lineitem"].filter(F.col("l_returnflag") == "R")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t["customer"]
        .join(t["nation"], F.col("c_nationkey") == F.col("n_nationkey"))
        .join(ords, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(ssum(disc, "revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "large_orders",
    """
    SELECT o_orderkey, o_orderdate, o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,10))) AS DOUBLE) AS total_qty
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderkey, o_orderdate, o_totalprice
    HAVING SUM(CAST(l_quantity AS DECIMAL(28,10))) > 150
    """,
    doc="TPC-H Q18 shape; groupBy + HAVING over the join.",
)
def large_orders(spark, sf_dir):
    t = tables(spark, sf_dir, "orders", "lineitem")
    return (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(28,10)")).alias("_q"))
        .filter(F.col("_q") > 150)
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("_q").cast("double").alias("total_qty"),
        )
    )
