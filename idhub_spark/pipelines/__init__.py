"""End-to-end pipelines (reference §3 entry points), each one Spark
job replacing the reference's per-record service loops."""
