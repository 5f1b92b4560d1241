"""Unit tests for the as-of and interval join operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from idhub_spark.operators.temporal import asof_join, interval_join


def _ts(df, *cols):
    for c in cols:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def test_asof_basic_and_nulls(spark):
    left = _ts(
        spark.createDataFrame(
            [(1, "2024-01-01 10:00:00", "L1"), (1, "2024-01-01 09:00:00", "L0"),
             (2, "2024-01-01 10:00:00", "L2")],
            ["k", "ts", "lbl"],
        ),
        "ts",
    )
    right = _ts(
        spark.createDataFrame(
            [(1, "2024-01-01 09:30:00", 7.0), (1, "2024-01-01 09:59:00", 9.0)],
            ["k", "ts", "v"],
        ),
        "ts",
    )
    out = {r.lbl: r for r in asof_join(left, right, on="k", right_values=["v"]).collect()}
    assert out["L1"].v_asof == 9.0  # latest at-or-before 10:00
    assert out["L0"].v_asof is None  # no right row before 09:00
    assert out["L2"].v_asof is None  # key 2 has no right rows


def test_asof_same_timestamp_inclusive(spark):
    left = _ts(spark.createDataFrame([(1, "2024-01-01 10:00:00")], ["k", "ts"]), "ts")
    right = _ts(
        spark.createDataFrame([(1, "2024-01-01 10:00:00", 5.0)], ["k", "ts", "v"]), "ts"
    )
    row = asof_join(left, right, on="k", right_values=["v"]).collect()[0]
    assert row.v_asof == 5.0


def test_asof_tolerance(spark):
    left = _ts(spark.createDataFrame([(1, "2024-01-01 10:00:00")], ["k", "ts"]), "ts")
    right = _ts(
        spark.createDataFrame([(1, "2024-01-01 08:00:00", 5.0)], ["k", "ts", "v"]), "ts"
    )
    row = asof_join(
        left, right, on="k", right_values=["v"], tolerance_seconds=3600
    ).collect()[0]
    assert row.v_asof is None  # 2h gap > 1h tolerance


def test_interval_join_bounds(spark):
    left = _ts(
        spark.createDataFrame(
            [(1, "2024-01-01 10:00:00", "c1"), (2, "2024-01-01 10:00:00", "c2")],
            ["k", "ts", "click"],
        ),
        "ts",
    )
    right = _ts(
        spark.createDataFrame(
            [
                (1, "2024-01-01 10:10:00", "in-window"),
                (1, "2024-01-01 11:30:00", "too-late"),
                (1, "2024-01-01 09:59:00", "before"),
                (2, "2024-01-01 10:59:59", "edge-in"),
            ],
            ["k", "p_ts", "what"],
        ),
        "p_ts",
    )
    out = interval_join(
        left, right, on="k", left_ts="ts", right_ts="p_ts",
        max_before_seconds=0, max_after_seconds=3600,
    )
    got = {(r.click, r.what) for r in out.collect()}
    assert got == {("c1", "in-window"), ("c2", "edge-in")}


def test_subsecond_boundary_precision(spark):
    """Window/tolerance predicates compare at microsecond precision:
    a gap of 60.4s must NOT pass a 60s window (cast-to-seconds
    truncation would let it through)."""
    from idhub_spark.operators.temporal import asof_join, interval_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 00:01:00.500"), (2, "2024-01-01 00:02:00.100")],
        ["lid", "ts"],
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [(10, "2024-01-01 00:00:00.100"), (20, "2024-01-01 00:01:00.200")],
        ["rid", "ts"],
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    lk = left.withColumn("k", F.lit("u"))
    rk = right.withColumn("k", F.lit("u"))

    # interval: rid=10 is 60.4s before lid=1 -> excluded by a 60s
    # max_before window; rid=20 is 0.3s before -> included
    out = interval_join(
        lk, rk.withColumnRenamed("ts", "rts"), on="k",
        left_ts="ts", right_ts="rts", max_before_seconds=60, max_after_seconds=0,
    )
    pairs = {(r.lid, r.rid) for r in out.collect()}
    assert (1, 20) in pairs and (1, 10) not in pairs
    # lid=2 vs rid=20: 59.9s -> included
    assert (2, 20) in pairs

    # as-of tolerance: carried row 60.3s back fails a 60s tolerance
    one_l = lk.filter(F.col("lid") == 1)
    one_r = rk.filter(F.col("rid") == 10)  # 60.4s earlier
    got = asof_join(
        one_l, one_r, on="k", right_values=["rid"], tolerance_seconds=60
    ).collect()[0]
    assert got.rid_asof is None
    got2 = asof_join(
        one_l, one_r, on="k", right_values=["rid"], tolerance_seconds=61
    ).collect()[0]
    assert got2.rid_asof == 10
