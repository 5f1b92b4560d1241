"""One-line plan-shape audit of every registry query: counts of
Exchange / ReusedExchange / BroadcastExchange, join strategies,
Python-boundary nodes (BatchEvalPython/ArrowEvalPython — should stay
zero outside mapInPandas operators), CartesianProduct, and
partition-less Window sorts. Composite state queries execute their
operator side effects while building the frame; the audited plan is
the returned frame's. Measurement-only tooling.

Usage: python tools/plan_audit.py [out.tsv]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/plan_audit.tsv"

    from idhub_spark.queries import REGISTRY
    from idhub_spark.session import get_spark

    spark = get_spark("idhub_plan_audit")
    rows = []
    for name in sorted(REGISTRY):
        try:
            df = REGISTRY[name].fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:
            rows.append((name, f"ERROR {type(e).__name__}"))
            continue
        finally:
            spark.catalog.clearCache()
        counts = {
            "exch": len(re.findall(r"\bExchange\b", plan))
            - len(re.findall(r"ReusedExchange|BroadcastExchange", plan)),
            "bexch": len(re.findall(r"BroadcastExchange", plan)),
            "reuse": len(re.findall(r"ReusedExchange", plan)),
            "smj": len(re.findall(r"SortMergeJoin", plan)),
            "bhj": len(re.findall(r"BroadcastHashJoin", plan)),
            "shj": len(re.findall(r"ShuffledHashJoin", plan)),
            "cart": len(re.findall(r"CartesianProduct", plan)),
            "pyeval": len(re.findall(r"BatchEvalPython", plan)),
            "arrow": len(
                re.findall(r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas", plan)
            ),
            "gsort": len(re.findall(r"^\s*\+?- Sort ", plan, re.M)),
            "nopart_win": len(
                re.findall(r"Window \[[^\]]*\](?!, \[)", plan)
            ),
        }
        rows.append(
            (
                name,
                "\t".join(f"{k}={v}" for k, v in counts.items() if v),
            )
        )
    with open(out_path, "w") as f:
        for name, info in rows:
            f.write(f"{name}\t{info}\n")
    print(f"wrote {out_path} ({len(rows)} queries)")


if __name__ == "__main__":
    main()
