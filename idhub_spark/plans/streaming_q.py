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

from pyspark.sql import functions as F

from idhub_spark.queries import query, tables

_QSEQ = {"n": 0}


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
    t = tables(spark, sf_dir, "events")
    raw_schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    # same two-encoding ts normalization as session.py:load_tables
    # (the raw stream bypasses load_tables)
    dtype = dict(stream.dtypes).get("ts")
    if dtype == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dtype == "timestamp_ntz":
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    sess = session_agg_plan(stream, gap="30 minutes")
    _QSEQ["n"] += 1
    qname = f"stream_sessions_{os.getpid()}_{_QSEQ['n']}"
    q = (
        sess.writeStream.format("memory")
        .queryName(qname)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(qname)
