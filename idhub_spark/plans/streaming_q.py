"""Structured Streaming driver queries (SURVEY.md §2.12).

The batch/stream parity suite (tests/test_streaming.py) already
asserts that one plan function produces identical results on a batch
DataFrame and a readStream DataFrame; this module gives the streaming
EXECUTION path itself a driver-hash row: a real FileStreamSource ->
session-window aggregation -> Trigger.AvailableNow drain into a
memory sink, oracle-checked against the gap-island SQL twin.

Sink choice: the memory sink collects the AGGREGATED sessions (not
the event stream) on the driver — bounded by session count here. At
production scale the same plan writes append-mode to a file/Delta
sink with a real watermark; complete-mode-to-memory is the harness
shape that lets the driver hash the full result (append mode
withholds each user's final session, whose window end is always
beyond the last watermark).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from idhub_spark.queries import query, tables

_QSEQ = {"n": 0}

# rows per state partition at which store setup stops dominating —
# measured on the sf0.1 corpus (docs/scale_audit_r10.md: the r9
# 32->8 interval-join finding generalized into one knob)
_STATE_ROWS_PER_PARTITION = 12_500
# per-source-path row counts observed by _event_stream, feeding the
# auto state-partition derivation (footer-only count, cached)
_STREAM_ROWS: dict[str, int] = {}


def _events_path(sf_dir: str) -> str:
    return os.path.join(sf_dir, "events.parquet")


def _auto_state_partitions(spark, source_path: str | None = None) -> int:
    """Default state-store partition count DERIVED FROM STREAM VOLUME
    (the shared default behind every drain; override per session with
    spark.idhub.streaming.statePartitions).

    One state-store instance materializes per shuffle partition (the
    stream-stream join spawns four per partition per side), and the
    r9 measurements showed setup dominating data at harness volume
    (interval join 32 -> 8 partitions: 6.3 -> 2.4 s, identical
    results). Rule: one partition per ~12.5k rows/trigger, rounded to
    a power of two, clamped to [2, 32] — reproduces the measured
    sweet spot (100k rows -> 8) and keeps tiny test streams from
    paying 32 stores. Results are partition-count-invariant (pinned
    by the driver hashes), so this is purely a throughput knob.
    """
    conf = spark.conf.get("spark.idhub.streaming.statePartitions", None)
    if conf:
        return int(conf)
    # key by the DRAINED stream's own source path: sizing from the
    # session-wide max would make a small stream drained after a big
    # one inherit the big corpus's store count (pure overhead)
    rows = _STREAM_ROWS.get(source_path or "", None)
    if rows is None:
        rows = max(_STREAM_ROWS.values(), default=100_000)
    target = max(1, rows // _STATE_ROWS_PER_PARTITION)
    return max(2, min(32, 1 << (target - 1).bit_length()))


def _event_stream(spark, sf_dir):
    """readStream over events.parquet with the same two-encoding ts
    normalization as session.py:load_tables (the raw stream bypasses
    load_tables)."""
    path = _events_path(sf_dir)
    raw_schema = spark.read.parquet(path).schema
    if path not in _STREAM_ROWS:
        # footer-metadata count: feeds the auto state-partition sizing
        _STREAM_ROWS[path] = spark.read.parquet(path).count()
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    dtype = dict(stream.dtypes).get("ts")
    if dtype == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dtype == "timestamp_ntz":
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def _drain_to_memory(
    plan_df,
    prefix: str,
    *,
    mode: str = "complete",
    state_partitions: int | None = None,
    source_path: str | None = None,
):
    """Trigger.AvailableNow -> memory sink; returns the sink table
    (see module docstring for why aggregations use complete mode;
    applyInPandasWithState drains in append mode — each closed
    session is emitted exactly once).

    state_partitions: stateful operators materialize one state-store
    instance PER shuffle partition (the stream-stream join spawns
    FOUR per partition per side — keyToNumValues + keyWithIndexToValue
    x2), and the count is frozen into the checkpoint at first start.
    Defaults to the SHARED volume-derived sizing
    (_auto_state_partitions — one knob for the whole streaming
    family, conf-overridable); pass an int only for a measured
    per-query exception. The session-level conf is restored after the
    drain; these checkpoints are fresh per run so the frozen count
    never conflicts.
    """
    _QSEQ["n"] += 1
    qname = f"{prefix}_{os.getpid()}_{_QSEQ['n']}"
    spark = plan_df.sparkSession
    old = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions is None:
        state_partitions = _auto_state_partitions(spark, source_path)
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            plan_df.writeStream.format("memory")
            .queryName(qname)
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if state_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", old)
    return qname


@query(
    "streaming_sessionize",
    """
    WITH gaps AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 30 MINUTE OR
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    sess AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
      FROM gaps)
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events
    FROM sess GROUP BY user_id, session_no
    """,
    doc="§2.12 streaming execution, driver-checked end to end: events "
    "flow through a REAL FileStreamSource (pathGlobFilter on the sf "
    "dir) into F.session_window('30 minutes') "
    "(streaming/incremental.py:session_agg_plan), drained with "
    "Trigger.AvailableNow into a memory sink. Oracle = the batch "
    "gap-island sessionizer; Spark's session merge is inclusive at "
    "exactly-gap (empirically pinned), matching the oracle's "
    "'> INTERVAL 30 MINUTE starts a session', and window end = last "
    "event + gap. A hash match proves the streaming runtime (source "
    "listing, micro-batch execution, session-state merge) computes "
    "exactly what the batch twin does.",
)
def streaming_sessionize(spark, sf_dir):
    from idhub_spark.streaming.incremental import session_agg_plan

    # registers the events view (and applies the session confs) for the
    # oracle harness; the streaming scan below re-reads the file itself
    tables(spark, sf_dir, "events")
    sess = session_agg_plan(_event_stream(spark, sf_dir), gap="30 minutes")
    return spark.table(
        _drain_to_memory(sess, "stream_sessions", source_path=_events_path(sf_dir))
    )


@query(
    "streaming_hourly_rollup",
    """
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type,
           COUNT(*) AS n,
           CAST(CAST(SUM(CAST(round(value * 1000000.0) AS BIGINT)) AS BIGINT) AS DOUBLE) / 1000000.0 AS total_value
    FROM events GROUP BY hour, event_type
    """,
    doc="§2.12 tumbling-window streaming execution, driver-checked: "
    "events through a FileStreamSource into window(ts, '1 hour') "
    "(streaming/incremental.py:hourly_rollup_plan, watermark '2 "
    "hours'), drained with Trigger.AvailableNow. Same scaled-int64 "
    "sum discipline as the batch hourly_rollup, so the oracle is the "
    "identical SQL — a hash match proves the streaming micro-batch "
    "aggregation state machine converges to the batch answer.",
)
def streaming_hourly_rollup(spark, sf_dir):
    from idhub_spark.streaming.incremental import hourly_rollup_plan

    tables(spark, sf_dir, "events")
    roll = hourly_rollup_plan(_event_stream(spark, sf_dir), watermark="2 hours")
    out = spark.table(
        _drain_to_memory(roll, "stream_rollup", source_path=_events_path(sf_dir))
    )
    return out.select(
        F.col("hour").cast("timestamp").alias("hour"),
        "event_type",
        "n",
        "total_value",
    )


@query(
    "stateful_sessionize",
    """
    WITH gaps AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                       OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                          > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    sess AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
      FROM gaps),
    agg AS (
      SELECT user_id, session_no,
             CAST(epoch_us(min(ts)) AS BIGINT) AS session_start,
             CAST(epoch_us(max(ts)) AS BIGINT) AS session_end,
             COUNT(*) AS n_events
      FROM sess GROUP BY user_id, session_no),
    lim AS (
      SELECT a.*,
             max(session_no) OVER (PARTITION BY user_id) AS last_no,
             (SELECT CAST(epoch_us(max(ts)) AS BIGINT) FROM events) AS max_us
      FROM agg a)
    SELECT user_id, session_start, session_end, n_events
    FROM lim
    WHERE session_no < last_no
       OR max_us // 1000 > (session_end + 1800000000) // 1000 + 1
    """,
    doc="§2.12 CUSTOM stateful streaming operator, driver-checked end "
    "to end: events through a FileStreamSource with a 0-second "
    "watermark into applyInPandasWithState "
    "(operators/grouped.py:sessionize_stateful, "
    "GroupStateTimeout.EventTimeTimeout), drained append-mode with "
    "Trigger.AvailableNow. Sessions close on a successor event past "
    "the 30-min gap (emitted in-batch) or on event-time timeout in "
    "the trailing no-data micro-batch (watermark = max event time). "
    "The oracle is the gap-island twin restricted to the emission "
    "contract: every non-final session per user, plus final sessions "
    "whose timeout (end+gap, ms-floored, +1ms, STRICTLY below the "
    "watermark — boundary empirically pinned) fired. A hash match "
    "proves the custom state machine (per-key state carry, in-batch "
    "multi-session close, timeout eviction) against SQL semantics.",
)
def stateful_sessionize(spark, sf_dir):
    from idhub_spark.operators.grouped import sessionize_stateful

    tables(spark, sf_dir, "events")
    stream = (
        _event_stream(spark, sf_dir)
        .select("user_id", "ts")
        .withWatermark("ts", "0 seconds")
    )
    sess = sessionize_stateful(stream, gap_seconds=1800)
    return spark.table(
        _drain_to_memory(
            sess,
            "stateful_sessions",
            mode="append",
            source_path=_events_path(sf_dir),
        )
    )


@query(
    "incremental_pruned_merge_state",
    """
    SELECT c_custkey,
           CASE WHEN c_custkey % 3 = 0 THEN c_acctbal + 20.0
                WHEN c_custkey % 2 = 0 THEN c_acctbal + 10.0
                ELSE c_acctbal END AS final_acctbal,
           CAST(CASE WHEN c_custkey % 3 = 0 THEN 2
                     WHEN c_custkey % 2 = 0 THEN 1
                     ELSE 0 END AS BIGINT) AS ver,
           CAST(c_custkey % 32 AS BIGINT) AS bucket
    FROM customer
    """,
    doc="§2.12 incremental ingest INTO the bucket-partitioned layout, "
    "driver-checked end to end: the same staged-fragment stream as "
    "incremental_merge_state, but each foreachBatch applies "
    "partition_pruned_upsert (streaming/incremental.py "
    "layout='bucketed') — per-trigger write I/O bounded by the "
    "batch's touched buckets instead of a full snapshot rewrite, the "
    "shape that makes continuous ingest into a 100 TB registry "
    "feasible. The oracle states the final table image incl. each "
    "key's bucket; a hash match proves dedup-within-trigger, "
    "classification, bucket routing, and the dynamic partition "
    "overwrite composed correctly under the streaming runtime.",
)
def incremental_pruned_merge_state(spark, sf_dir):
    from idhub_spark.operators.merge_into import seed_bucketed_table
    from idhub_spark.streaming.incremental import incremental_file_merge

    t = tables(spark, sf_dir, "customer")
    c = t["customer"].select(
        "c_custkey", "c_name", "c_acctbal", F.lit(0).cast("long").alias("ver")
    )
    root = os.path.join(
        tempfile.gettempdir(),
        f"idhub_incr_pruned_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    shutil.rmtree(root, ignore_errors=True)
    staging = os.path.join(root, "staging")
    table_dir = os.path.join(root, "table")
    ckpt = os.path.join(root, "ckpt")
    os.makedirs(staging, exist_ok=True)
    bucket_of = lambda df: F.pmod(F.col("c_custkey"), F.lit(32)).cast("int")  # noqa: E731
    seed_bucketed_table(c, table_dir, ["c_custkey"], n_buckets=32, bucket_of=bucket_of)
    frag1 = (
        c.filter(F.col("c_custkey") % 2 == 0)
        .withColumn("c_acctbal", F.col("c_acctbal") + F.lit(10.0))
        .withColumn("ver", F.lit(1).cast("long"))
    )
    frag2 = (
        c.filter(F.col("c_custkey") % 3 == 0)
        .withColumn("c_acctbal", F.col("c_acctbal") + F.lit(20.0))
        .withColumn("ver", F.lit(2).cast("long"))
    )
    frag1.coalesce(1).write.mode("append").parquet(staging)
    frag2.coalesce(1).write.mode("append").parquet(staging)
    incremental_file_merge(
        spark,
        staging_dir=staging,
        table_dir=table_dir,
        checkpoint_dir=ckpt,
        schema="c_custkey bigint, c_name string, c_acctbal double, ver bigint",
        natural_key=["c_custkey"],
        order_col="ver",
        layout="bucketed",
        n_buckets=32,
        bucket_of=bucket_of,
    )
    final = spark.read.parquet(table_dir)
    return final.select(
        "c_custkey",
        F.col("c_acctbal").alias("final_acctbal"),
        F.col("ver").cast("long").alias("ver"),
        F.col("_bucket").cast("long").alias("bucket"),
    )


@query(
    "incremental_merge_state",
    """
    SELECT c_custkey,
           CASE WHEN c_custkey % 3 = 0 THEN c_acctbal + 20.0
                WHEN c_custkey % 2 = 0 THEN c_acctbal + 10.0
                ELSE c_acctbal END AS final_acctbal,
           CAST(CASE WHEN c_custkey % 3 = 0 THEN 2
                     WHEN c_custkey % 2 = 0 THEN 1
                     ELSE 0 END AS BIGINT) AS ver
    FROM customer
    """,
    doc="§2.12 incremental batch path END TO END, driver-checked: a "
    "base snapshot of customer plus two staged fragment files (ver 1 "
    "patches even keys +10, ver 2 patches %3 keys +20) drain through "
    "the REAL file-source stream -> foreachBatch(merge_upsert) -> "
    "snapshot-swap pipeline (streaming/incremental.py:"
    "incremental_file_merge, Trigger.AvailableNow, checkpointed). "
    "Both fragments land in ONE trigger, so the within-batch "
    "order_col dedup decides overlapping keys (%6: ver 2 wins). The "
    "oracle states the resulting table image directly; a hash match "
    "proves source listing, dedup, upsert classification, and the "
    "atomic snapshot swap end to end. Fixture dirs are per-sf under "
    "tempdir, wiped at query start (fresh checkpoint each run).",
)
def incremental_merge_state(spark, sf_dir):
    from idhub_spark.streaming.incremental import incremental_file_merge

    t = tables(spark, sf_dir, "customer")
    c = t["customer"].select("c_custkey", "c_name", "c_acctbal")
    root = os.path.join(
        tempfile.gettempdir(),
        f"idhub_incr_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    shutil.rmtree(root, ignore_errors=True)
    staging = os.path.join(root, "staging")
    table_dir = os.path.join(root, "table")
    ckpt = os.path.join(root, "ckpt")
    os.makedirs(staging, exist_ok=True)
    # base snapshot (no ver column — the fragments introduce it)
    c.write.mode("overwrite").parquet(table_dir)
    frag1 = (
        c.filter(F.col("c_custkey") % 2 == 0)
        .withColumn("c_acctbal", F.col("c_acctbal") + F.lit(10.0))
        .withColumn("ver", F.lit(1).cast("long"))
    )
    frag2 = (
        c.filter(F.col("c_custkey") % 3 == 0)
        .withColumn("c_acctbal", F.col("c_acctbal") + F.lit(20.0))
        .withColumn("ver", F.lit(2).cast("long"))
    )
    frag1.coalesce(1).write.mode("append").parquet(staging)
    frag2.coalesce(1).write.mode("append").parquet(staging)
    incremental_file_merge(
        spark,
        staging_dir=staging,
        table_dir=table_dir,
        checkpoint_dir=ckpt,
        schema="c_custkey bigint, c_name string, c_acctbal double, ver bigint",
        natural_key=["c_custkey"],
        order_col="ver",
    )
    final = spark.read.parquet(table_dir)
    return final.select(
        "c_custkey",
        F.col("c_acctbal").alias("final_acctbal"),
        F.coalesce(F.col("ver"), F.lit(0)).cast("long").alias("ver"),
    )


@query(
    "streaming_interval_join",
    """
    WITH c AS (
      SELECT user_id, ts AS cts, event_id AS click_id
      FROM events WHERE event_type = 'click'),
    p AS (
      SELECT user_id, ts AS pts, value
      FROM events WHERE event_type = 'purchase')
    SELECT c.user_id,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(min(c.click_id) AS BIGINT) AS first_click,
           CAST(CAST(SUM(CAST(round(p.value * 1000000.0) AS BIGINT)) AS BIGINT)
                AS DOUBLE) / 1000000.0 AS total_value
    FROM c JOIN p
      ON p.user_id = c.user_id
     AND p.pts >= c.cts
     AND p.pts <= c.cts + INTERVAL 30 MINUTE
    GROUP BY c.user_id
    """,
    doc="§2.12 STREAM-STREAM interval join, driver-checked — the one "
    "canonical streaming operator the suite hadn't executed: clicks "
    "and purchases as two watermarked streams over the same "
    "FileStreamSource, inner-joined on user with a "
    "[click, click+30min] event-time range "
    "(StreamingSymmetricHashJoin with watermark-bounded state — at "
    "production scale state holds only the 30-minute horizon per "
    "side), drained append-mode with Trigger.AvailableNow; the "
    "joined pairs land in the memory sink and a BATCH aggregation "
    "shrinks them per user. The single-micro-batch drain makes the "
    "append-mode join complete (no row can be withheld by a "
    "watermark that only advances after the batch), so the batch SQL "
    "twin is the exact oracle. Join bounds are inclusive on both "
    "ends in both engines; sums use the scaled-int64 recipe.",
)
def streaming_interval_join(spark, sf_dir):
    tables(spark, sf_dir, "events")
    stream = _event_stream(spark, sf_dir)
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select("user_id", F.col("ts").alias("cts"), F.col("event_id").alias("click_id"))
        .withWatermark("cts", "1 hour")
    )
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("pts"),
            "value",
        )
        .withWatermark("pts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        (F.col("p_user_id") == F.col("user_id"))
        & (F.col("pts") >= F.col("cts"))
        & (F.col("pts") <= F.col("cts") + F.expr("INTERVAL 30 MINUTES")),
        "inner",
    )
    sink = _drain_to_memory(
        joined, "stream_ijoin", mode="append", source_path=_events_path(sf_dir)
    )
    pairs = spark.table(sink)
    cents = F.round(F.col("value") * 1000000.0).cast("bigint")
    return pairs.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.min("click_id").cast("bigint").alias("first_click"),
        (F.sum(cents).cast("bigint").cast("double") / 1000000.0).alias("total_value"),
    )


@query(
    "streaming_dedup",
    """
    WITH uniq AS (
      SELECT DISTINCT event_id, event_type, value FROM events)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_unique,
           CAST(SUM(CAST(round(value * 1000000.0) AS BIGINT)) AS BIGINT)
             AS value_micros
    FROM uniq GROUP BY event_type
    """,
    doc="§2.12 streaming DEDUPLICATION — the one stateful streaming "
    "operator class the suite hadn't executed (state = seen-key set, "
    "watermark-expired): every event is duplicated in-stream (explode "
    "x2, the at-least-once-delivery shape), then "
    "dropDuplicatesWithinWatermark(event_id) collapses replays whose "
    "event time falls inside the 1-hour watermark horizon — at "
    "production scale state holds one key per event in the horizon, "
    "nothing older. AvailableNow drain to the memory sink, then a "
    "batch rollup per event_type; the oracle is the batch DISTINCT "
    "the stream must reproduce exactly (duplicates injected by the "
    "harness, removed by the operator). Sums use the scaled-int64 "
    "recipe; state partitions sized to stream volume "
    "(_drain_to_memory note).",
)
def streaming_dedup(spark, sf_dir):
    tables(spark, sf_dir, "events")
    stream = _event_stream(spark, sf_dir)
    duplicated = stream.select(
        "event_id",
        "ts",
        "event_type",
        "value",
        F.explode(F.array(F.lit(1), F.lit(2))).alias("replay"),
    ).drop("replay")
    deduped = duplicated.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    sink = _drain_to_memory(
        deduped, "stream_dedup", mode="append", source_path=_events_path(sf_dir)
    )
    uniq = spark.table(sink)
    return uniq.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_unique"),
        F.sum(F.round(F.col("value") * 1000000.0).cast("bigint"))
        .cast("bigint")
        .alias("value_micros"),
    )
