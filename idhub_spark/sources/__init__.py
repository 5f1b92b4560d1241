"""Source adapters (reference §2.1 S1-S9).

The reference's scans split into two classes:
- bulk files (CSV/JSON/parquet on object storage): native Spark
  readers with pushdown — csv_scan/json_scan/parquet_scan.
- paginated REST APIs (REDCap, LabKey, NocoDB): driver-side fetch
  with retry/backoff into a DataFrame — rest adapters. The per-page
  HTTP loop stays on the driver (it's I/O-bound and tiny); all
  processing after `to_dataframe` is distributed.
"""

from idhub_spark.sources.files import csv_scan, json_scan, parquet_scan
from idhub_spark.sources.rest import RestSource, fetch_with_retry

__all__ = ["csv_scan", "json_scan", "parquet_scan", "RestSource", "fetch_with_retry"]
