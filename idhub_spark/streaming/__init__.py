"""Streaming / incremental execution (reference SURVEY.md §2.12).

The reference has no true streaming — incrementality is
scheduler-driven batch with offset checkpoints. The faithful Spark
mapping is incremental batch (Trigger.AvailableNow over new fragment
files) with idempotent natural-key merges; true Structured Streaming
(watermarked windowed aggregation, gap sessions) is layered on the
same transformation functions so batch and stream share one logical
plan definition.
"""

from idhub_spark.streaming.incremental import (
    hourly_rollup_plan,
    incremental_file_merge,
    session_agg_plan,
    streaming_exact_dedup,
)

__all__ = ["hourly_rollup_plan", "incremental_file_merge", "session_agg_plan", "streaming_exact_dedup"]
