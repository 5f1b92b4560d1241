"""Accuracy bounds for the sketch aggregates (rows-only driver check)
and plan-quality regressions for the headline queries: pushdown,
pruning, and broadcast must survive refactors."""

from __future__ import annotations

from pyspark.sql import functions as F

from idhub_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def test_sketch_accuracy_bounds(spark):
    # sketch_profile was retired from the registry in r13 (its
    # hash-green twin sketch_profile_check carries the evidence); the
    # plan builder itself stays under direct test here
    from idhub_spark.plans.stats_q import sketch_profile

    out = sketch_profile(spark, SF)
    exact = spark.read.parquet(f"{SF}/events.parquet")
    exact_users = {
        r.event_type: r.n
        for r in exact.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for r in out.collect():
        # 2% rsd HLL: allow 10% slack at tiny scale
        assert abs(r.approx_users - exact_users[r.event_type]) <= max(
            2, 0.1 * exact_users[r.event_type]
        )
        assert r.p50_approx <= r.p95_approx


def _plan(spark, name):
    df = REGISTRY[name].fn(spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_pricing_summary_pushdown(spark):
    plan = _plan(spark, "pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: only the 6 needed columns reach the scan
    assert "l_comment" not in plan
    assert "ReadSchema" in plan


def test_shipping_priority_broadcasts_dims(spark):
    plan = _plan(spark, "shipping_priority")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
    assert "EqualTo(c_mktsegment,BUILDING)" in plan  # pushed to scan


def test_semi_join_stays_semi(spark):
    plan = _plan(spark, "keyed_lookup_semi")
    assert "LeftSemi" in plan


def test_topk_avoids_global_sort(spark):
    plan = _plan(spark, "recent_changes_topk")
    assert "TakeOrderedAndProject" in plan


def test_conflict_apply_broadcasts_resolutions(spark):
    """Existing-side conflict application must broadcast the tiny
    resolution set (anti-join + center-update join) — the big tables
    never shuffle for it."""
    plan = _plan(spark, "conflict_apply_state")
    assert "BroadcastHashJoin" in plan
    assert "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


def test_global_distinct_flag_no_single_partition_window(spark):
    """The W1/W2 global flag must NOT run through an unpartitioned
    window (single-task funnel); it is a 1-row aggregate broadcast
    back over the distinct set."""
    plan = _plan(spark, "global_distinct_flag")
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_ngram_shingles_projection_only(spark):
    """The shingle build is Generate(explode)-based — no window
    exchange; the only shuffles are the distinct + the index joins."""
    plan = _plan(spark, "ngram_jaccard_pairs")
    assert "Window" not in plan


def test_contamination_broadcasts_eval_index(spark):
    """The benchmark-contamination scan must broadcast the (tiny)
    eval-side n-gram index and the excerpt plant — the training corpus
    never shuffles for either join, and nothing goes cartesian."""
    plan = _plan(spark, "benchmark_contamination")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_resize_check_stays_arrow_batched(spark):
    """image_resize_check's Python stage is exactly one Arrow
    mapInPandas (the resize kernel); the checksum fold is JVM-side."""
    plan = _plan(spark, "image_resize_check")
    assert plan.count("MapInPandas") == 1
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python UDF


# Queries whose CONSTRUCTION spins up external fixtures (HTTP server,
# embedded Derby, file sinks, streaming drains) — plan-audited by their
# dedicated tests/driver rows instead of the sweep.
_SWEEP_SKIP = {
    "rest_paginated_scan",
    "redcap_dictionary_scan",
    "jdbc_partitioned_scan",
    "csv_roundtrip_staging",
    "json_roundtrip_report",
    "labkey_sync_state",
    "streaming_sessionize",
    "streaming_hourly_rollup",
    "incremental_merge_state",
    "stateful_sessionize",
    "incremental_pruned_merge_state",
    "partition_pruned_upsert",
    "partition_pruned_upsert_stats",
}


def test_plan_sweep_no_cartesian_no_row_udfs(spark):
    """Engine-wide physical-plan invariants over EVERY registered
    query: no un-broadcast CartesianProduct (a broadcast-tiny cross
    join compiles to BroadcastNestedLoopJoin, which is allowed) and no
    row-at-a-time Python UDF (BatchEvalPython) anywhere — the two
    regressions that silently kill a plan at 100x scale."""
    bad = []
    for name in sorted(REGISTRY):
        if name in _SWEEP_SKIP:
            continue
        plan = _plan(spark, name)
        if "CartesianProduct" in plan:
            bad.append((name, "CartesianProduct"))
        if "BatchEvalPython" in plan:
            bad.append((name, "BatchEvalPython"))
        spark.catalog.clearCache()
    assert not bad, bad


def test_market_share_broadcasts_all_dims(spark):
    """Q8 shape: every dim side broadcasts (5 broadcast joins), the
    region predicate is pushed to the region scan, and the only
    non-broadcast join is the lineitem-orders fact join."""
    plan = _plan(spark, "nation_market_share")
    assert plan.count("BroadcastHashJoin") >= 4
    assert "EqualTo(r_name,ASIA)" in plan


def test_customer_distribution_keeps_left_outer(spark):
    """Q13 shape: the non-key predicate lives in the JOIN condition —
    it must not collapse the outer join into an inner one (zero-order
    customers survive into the c_count=0 bucket)."""
    plan = _plan(spark, "customer_order_distribution")
    assert "LeftOuter" in plan


def test_exact_heavy_hitters_matches_groupby(spark):
    """The 2-pass Misra-Gries plan must equal the naive full-shuffle
    groupBy answer on a skewed corpus spread over many partitions —
    including keys that are locally light but globally heavy (present
    in every partition just under the local radar), the shape the
    union-of-candidates guarantee exists for."""
    from idhub_spark.operators.sketches import exact_heavy_hitters

    # 40 heavy keys (300 rows each), 5000 light keys (2 rows each):
    # N = 22000, spread over 16 partitions so each heavy key is
    # ~19/partition among ~625 light rows
    heavy = spark.range(40 * 300).select(
        (F.col("id") % 40).alias("k")
    )
    light = spark.range(5000 * 2).select(
        (F.col("id") % 5000 + 1000).alias("k")
    )
    df = heavy.unionByName(light).repartition(16)
    got = {
        r.k: r.n
        for r in exact_heavy_hitters(df, "k", min_count=100, k=512).collect()
    }
    expected = {
        r.k: r.n
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter("n >= 100")
        .collect()
    }
    assert got == expected and len(expected) >= 40


def test_exact_heavy_hitters_rejects_unsound_k(spark):
    """min_count <= N/(k+1) voids the superset guarantee — the
    operator must raise, never silently under-report."""
    import pytest

    from idhub_spark.operators.sketches import exact_heavy_hitters

    df = spark.range(10_000).select((F.col("id") % 100).alias("k"))
    with pytest.raises(ValueError, match="exactness violated"):
        exact_heavy_hitters(df, "k", min_count=5, k=16)


def test_heavy_hitter_candidates_bounded_by_k_at_high_partition_count(spark):
    """The broadcast side of pass 2 must be <= k rows at ANY input
    partition count (the Agarwal-merge bound): 512 partitions x k=64
    per-partition sketches would union to up to 32k candidate rows —
    the merged sketch must reduce that to <= 64 while still containing
    every true heavy hitter."""
    from idhub_spark.operators.sketches import (
        exact_heavy_hitters,
        merged_candidates,
        misra_gries_candidates,
    )

    # 8 heavy keys (4000 rows each) + 2000 light keys (4 rows each):
    # N = 40000, t=1000 > N/(k+1) = 40000/65 ~ 615
    heavy = spark.range(8 * 4000).select((F.col("id") % 8).alias("k"))
    light = spark.range(2000 * 4).select((F.col("id") % 2000 + 100).alias("k"))
    df = heavy.unionByName(light).repartition(512)

    raw = misra_gries_candidates(df, "k", 64).count()
    merged = merged_candidates(df, "k", 64).collect()
    assert len(merged) <= 64, f"merged sketch leaked {len(merged)} > k rows"
    assert raw > len(merged)  # the merge actually reduced something
    assert {r.k for r in merged} >= set(range(8))  # superset guarantee

    got = {
        r.k: r.n
        for r in exact_heavy_hitters(df, "k", min_count=1000, k=64).collect()
    }
    assert got == {i: 4000 for i in range(8)}


def test_heavy_hitters_null_key(spark):
    """A NULL key whose exact count clears the threshold must be
    reported exactly as the naive groupBy would report it (pass 1
    counts nulls via value_counts(dropna=False); pass 2's semi-join
    is null-safe)."""
    from idhub_spark.operators.sketches import exact_heavy_hitters

    df = (
        spark.range(3000)
        .select(
            F.when(F.col("id") % 3 == 0, None)
            .otherwise(F.concat(F.lit("k"), (F.col("id") % 50).cast("string")))
            .alias("k")
        )
        .repartition(16)
    )
    got = {
        r.k: r.n
        for r in exact_heavy_hitters(df, "k", min_count=500, k=256).collect()
    }
    assert got == {None: 1000}


def test_bucket_checksum_order_independent_and_sensitive(spark):
    """The anti-entropy checksum must be identical across row order /
    partitioning (modular SUM is commutative) and must flip for
    exactly the bucket holding a changed or deleted row."""
    from idhub_spark.operators.sampling import hash_bucket
    from idhub_spark.storage import bucket_checksum

    df = spark.range(1, 2001).select(
        F.col("id").alias("k"),
        F.concat(F.lit("name"), F.col("id").cast("string")).alias("name"),
        (F.col("id") * 7).alias("cents"),
    )
    cols = ["k", "name", "cents"]
    a = {r.bucket: (r.n_rows, r.checksum) for r in bucket_checksum(df, "k", cols).collect()}
    # same rows, different order and partitioning
    shuffled = df.orderBy(F.md5(F.col("k").cast("string"))).repartition(7)
    b = {
        r.bucket: (r.n_rows, r.checksum)
        for r in bucket_checksum(shuffled, "k", cols).collect()
    }
    assert a == b

    # one changed row flips exactly its own bucket's checksum (same count)
    changed = df.withColumn(
        "cents", F.when(F.col("k") == 1234, F.col("cents") + 1).otherwise(F.col("cents"))
    )
    c = {
        r.bucket: (r.n_rows, r.checksum)
        for r in bucket_checksum(changed, "k", cols).collect()
    }
    tgt = spark.range(1).select(
        hash_bucket(F.lit(1234).cast("bigint"), 64, "ck").alias("b")
    ).collect()[0].b
    diff = {bk for bk in a if a[bk] != c[bk]}
    assert diff == {tgt}
    assert a[tgt][0] == c[tgt][0]  # count unchanged, checksum moved


def test_bucket_checksum_null_position_sensitive(spark):
    """Replicas differing only in WHICH column is null must diverge:
    concat_ws skips nulls, so without the chr(0)NULL sentinel
    ('a', NULL, 'b') and ('a', 'b', NULL) hash to the same string and
    the anti-entropy primitive masks the divergence."""
    from idhub_spark.storage import bucket_checksum

    schema = "k bigint, x string, y string"
    a = spark.createDataFrame([(1, None, "b")], schema)
    b = spark.createDataFrame([(1, "b", None)], schema)
    cols = ["k", "x", "y"]
    ca = bucket_checksum(a, "k", cols).collect()[0]
    cb = bucket_checksum(b, "k", cols).collect()[0]
    assert ca.bucket == cb.bucket and ca.n_rows == cb.n_rows
    assert ca.checksum != cb.checksum


def test_kmv_sketch_partitioning_invariant_and_exact(spark):
    """The k smallest distinct hashes of a set do not depend on how
    the set is partitioned — sketches built at different partition
    counts must be row-identical. A segment with fewer than k
    distinct keys retains every hash, so its estimate is EXACT."""
    from idhub_spark.operators.sketches import (
        kmv_distinct_estimate,
        kmv_sketch,
    )

    df = spark.range(30_000).select(
        (F.col("id") % 2 == 0).cast("string").alias("seg"),
        (F.col("id") % 700).cast("string").alias("k"),
    )
    a = kmv_sketch(df.repartition(3), "k", 1024, seg_cols=["seg"])
    b = kmv_sketch(df.repartition(29), "k", 1024, seg_cols=["seg"])
    rows_a = sorted((r.seg, r._h) for r in a.collect())
    rows_b = sorted((r.seg, r._h) for r in b.collect())
    assert rows_a == rows_b and len(rows_a) == 700  # 350 distinct/segment

    est = {
        r.seg: r.n_distinct_est
        for r in kmv_distinct_estimate(a, 1024, seg_cols=["seg"]).collect()
    }
    assert est == {"true": 350.0, "false": 350.0}


def test_kmv_estimate_accuracy_when_full(spark):
    """A full sketch (n >> k) estimates (k-1)/theta with relative
    error ~1/sqrt(k-2) (~3% at k=1024); assert a 4-sigma band.
    Deterministic: xxhash64 is seeded, so this is a fixed number."""
    from idhub_spark.operators.sketches import (
        kmv_distinct_estimate,
        kmv_sketch,
    )

    n = 100_000
    df = spark.range(n).select(F.col("id").cast("string").alias("k"))
    sk = kmv_sketch(df.repartition(16), "k", 1024)
    est = kmv_distinct_estimate(sk, 1024).collect()[0].n_distinct_est
    assert abs(est - n) / n < 0.13, est


def test_kmv_set_algebra(spark):
    """Theta-style union/intersection/Jaccard across two sketched
    segments: A = [0, 20k), B = [10k, 30k) -> union 30k,
    intersection 10k, Jaccard 1/3, each within the sketch error
    band. The merged sketch must equal the sketch of the union."""
    from idhub_spark.operators.sketches import (
        kmv_distinct_estimate,
        kmv_merge,
        kmv_set_estimates,
        kmv_sketch,
    )

    k = 2048
    a_df = spark.range(0, 20_000).select(F.col("id").cast("string").alias("k"))
    b_df = spark.range(10_000, 30_000).select(F.col("id").cast("string").alias("k"))
    sa = kmv_sketch(a_df.repartition(8), "k", k)
    sb = kmv_sketch(b_df.repartition(8), "k", k)

    # merged sketch == sketch of the concatenated input (mergeability)
    merged = kmv_merge(sa, sb, k)
    direct = kmv_sketch(a_df.unionByName(b_df).repartition(8), "k", k)
    assert sorted(r._h for r in merged.collect()) == sorted(
        r._h for r in direct.collect()
    )

    est = kmv_set_estimates(sa, sb, k).collect()[0]
    assert abs(est.union_est - 30_000) / 30_000 < 0.12, est
    assert abs(est.intersection_est - 10_000) / 10_000 < 0.15, est
    assert abs(est.jaccard_est - 1 / 3) < 0.06, est

    # exact path: both sketches below k -> all three answers exact
    small_a = kmv_sketch(
        spark.range(0, 300).select(F.col("id").cast("string").alias("k")), "k", k
    )
    small_b = kmv_sketch(
        spark.range(200, 500).select(F.col("id").cast("string").alias("k")), "k", k
    )
    ex = kmv_set_estimates(small_a, small_b, k).collect()[0]
    assert (ex.union_est, ex.intersection_est) == (500.0, 100.0)
    assert abs(ex.jaccard_est - 100 / 500) < 1e-12


def test_runtime_bloom_filter_fires_on_shuffle_join(spark, tmp_path):
    """Pin the conditions under which Spark 4's InjectRuntimeFilter
    adds bloom pruning (might_contain over a bloom_filter_agg
    subquery) to the FACT scan of a join — the optimizer-owned
    version of semi-join reduction this engine relies on at scale
    instead of hand-building bloom filters.

    Conditions (all three required, pinned here empirically):
      1. shuffle join — a broadcastable dim suppresses the filter
         (broadcast hash join prunes during the probe anyway);
      2. a selective filter directly over the creation-side scan;
      3. application-side scan size above
         spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold
         (default 10GB — i.e. the filter turns ON in exactly the
         100 TB regime this engine targets; lowered here to probe).
    """
    fact = spark.range(200_000).select(
        F.col("id").alias("k"), (F.col("id") % 997).alias("v")
    )
    dim = spark.range(5_000).select(
        (F.col("id") * 40).alias("k"), F.lit("x").alias("tag")
    )
    fact.write.parquet(str(tmp_path / "fact"))
    dim.write.parquet(str(tmp_path / "dim"))

    def optimized(app_thresh, bcast):
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter"
            ".applicationSideScanSizeThreshold", app_thresh
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
        j = (
            spark.read.parquet(str(tmp_path / "fact"))
            .join(
                spark.read.parquet(str(tmp_path / "dim")).filter(
                    F.col("tag") == "x"
                ),
                "k",
            )
            .groupBy()
            .agg(F.sum("v").alias("s"))
        )
        return j._jdf.queryExecution().optimizedPlan().toString()

    try:
        # shuffle join + tiny application threshold -> bloom injected
        plan = optimized("1KB", "-1")
        assert "might_contain" in plan and "bloom_filter_agg" in plan
        # broadcastable dim -> no bloom (BHJ probe prunes already)
        assert "might_contain" not in optimized("1KB", "10MB")
        # default 10GB threshold -> off at harness scale, on at 100 TB
        assert "might_contain" not in optimized("10GB", "-1")
    finally:
        spark.conf.unset(
            "spark.sql.optimizer.runtime.bloomFilter"
            ".applicationSideScanSizeThreshold"
        )
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_kmv_rolling_distinct_from_daily_sketches(spark):
    """The operational payoff of KMV mergeability: persist ONE
    sketch per day, answer any rolling-window distinct-count later
    by merging sketch rows only — no re-scan of raw events. A
    3-day rolling window over daily sketches is: fan each day's
    sketch out to the windows it belongs to (explode over offsets),
    re-truncate per window, estimate. Exact here because every
    window holds < k distinct users; the same plan degrades to
    ~1/sqrt(k) error when windows overflow, never to a re-scan."""
    from idhub_spark.operators.sketches import (
        kmv_distinct_estimate,
        kmv_sketch,
    )

    k = 4096
    # 10 days; day d has users [100*d, 100*d + 400) -> 300-user
    # overlap between adjacent days
    ev = (
        spark.range(4_000)
        .select(
            (F.col("id") / 400).cast("int").alias("day"),
            ((F.col("id") / 400).cast("int") * 100 + F.col("id") % 400)
            .cast("string")
            .alias("user"),
        )
    )
    daily = kmv_sketch(ev.repartition(8), "user", k, seg_cols=["day"])

    windowed = (
        daily.select(
            F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("off"),
            (F.col("day") + F.col("off")).alias("win_end"),
            F.col("_h"),
        )
        .filter(F.col("win_end") <= 9)
        .drop("off")
        .dropDuplicates(["win_end", "_h"])
    )
    est = {
        r.day: r.n_distinct_est
        for r in kmv_distinct_estimate(
            windowed.withColumnRenamed("win_end", "day"), k, seg_cols=["day"]
        ).collect()
    }

    exact = {
        r.win_end: r.n
        for r in ev.select(
            F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("off"),
            (F.col("day") + F.col("off")).alias("win_end"),
            F.col("user"),
        )
        .filter(F.col("win_end") <= 9)
        .groupBy("win_end")
        .agg(F.count_distinct("user").alias("n"))
        .collect()
    }
    assert est == {w: float(n) for w, n in exact.items()}
    # interior 3-day windows: 400 + 2*100 new per extra day = 600
    assert est[5] == 600.0
