"""idhub_spark — a PySpark-native analytics/ETL engine.

A from-scratch rebuild of the data-processing capabilities of the
reference system (ibdgc/idhub, an identity-reconciliation ETL platform;
see SURVEY.md), re-expressed Spark-first:

- declarative DataFrame/SQL plans (Catalyst optimizes; we never
  hand-schedule),
- set-based batch joins replacing the reference's per-record HTTP /
  row-at-a-time psycopg2 loops,
- parquet-backed tables with natural-key MERGE emulation (no Delta
  jar in this environment),
- plus large-scale training-data pipeline operators (dedup families,
  similarity search, text analysis, multimodal column plumbing) that
  the reference does not have but a 100 TB pipeline needs.

Package layout (SURVEY.md §7.1):
    session.py       SparkSession factory tuned for local[32] testing
    schema.py        StructTypes for the reference's catalog + GSID spec
    config.py        mapping-config compiler (both JSON dialects)
    expressions.py   scalar transforms P5-P13 as Column expressions
    operators/       identity, centers, changes, conflicts, merge,
                     dedup, similarity, text, multimodal, validate
    sources/         file/REST source adapters
    streaming/       incremental + structured-streaming pipelines
    queries.py       driver-facing query catalog + DuckDB oracle SQL
"""

__version__ = "0.1.0"
