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


def _nopart_windows(plan: str) -> int:
    """Count Window operators with an EMPTY partition spec by parsing
    each `(n) Window` detail section's Arguments line into top-level
    [...] groups (2 groups = [funcs], [order] — no partition; 3 =
    partitioned). Replaces the old tree-line regex, which missed
    ':- '-prefixed nodes entirely (ADVICE r19)."""
    n = 0
    for sec in re.split(r"\n\n+", plan):
        if not re.match(r"^\(\d+\) Window\b", sec):
            continue
        m = re.search(r"(?m)^Arguments: (.*)$", sec)
        if not m:
            continue
        depth, groups = 0, 0
        for ch in m.group(1):
            if ch == "[":
                if depth == 0:
                    groups += 1
                depth += 1
            elif ch == "]":
                depth -= 1
        if groups == 2:
            n += 1
    return n


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
            # ADVICE r19: \bExchange\b can never match inside
            # ReusedExchange/BroadcastExchange (the preceding char is a
            # word char, so there is no boundary) — the old subtraction
            # systematically UNDERCOUNTED plain shuffle exchanges and
            # could go negative. A negative lookbehind counts exactly
            # the plain `Exchange ...` nodes.
            "exch": len(re.findall(r"(?<![A-Za-z])Exchange\b", plan)),
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
            # formatted-mode operator ids ("Sort (7)") instead of tree
            # prefixes: the old ^\s*\+?- form missed ':- '-branch nodes
            # (ADVICE r19). The space before '(' excludes
            # SortAggregate/SortMergeJoin.
            "gsort": len(re.findall(r"(?<![A-Za-z])Sort \(\d+\)", plan)),
            "nopart_win": _nopart_windows(plan),
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
