"""Dump .explain('formatted') for named registry queries to files.

Usage:
    python tools/dump_plans.py <suffix> query_a query_b ...
writes plans/$IDHUB_PLANS_ROUND/<query>_<suffix>.txt (default r20)
for each query (suffix is
'before' or 'after'). The composite state queries execute their
operator side effects while BUILDING the returned frame; the dumped
plan is the final verdict frame's plan, which is what the returned
results hash over. Measurement-only tooling.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    suffix = sys.argv[1]
    names = sys.argv[2:]
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("IDHUB_PLANS_ROUND", "r20"),
    )
    os.makedirs(out_dir, exist_ok=True)

    from idhub_spark.queries import REGISTRY
    from idhub_spark.session import get_spark

    spark = get_spark("idhub_dump_plans")
    for qname in names:
        df = REGISTRY[qname].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{qname}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
