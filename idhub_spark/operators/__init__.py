"""Dataflow operators (reference SURVEY.md §2) as DataFrame -> DataFrame
functions. Each module documents the reference semantics it preserves
and the Spark-first physical strategy (broadcast, partial agg, anti-join)
it uses instead of the reference's row-at-a-time implementation."""
