"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line with per-query wall seconds.

Each query is forced to full execution with a count-collapsing action
(write to noop would also work; count() executes the whole plan since
every query here aggregates/limits)."""

from __future__ import annotations

import json
import os
import sys
import time

HEADLINE = [
    "pricing_summary",
    "shipping_priority",
    "local_supplier_volume",
    "returned_item_report",
    # large_orders was retired r18 (tests/test_retired.py) and removed
    # from this list.
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from idhub_spark.queries import REGISTRY
    from idhub_spark.session import get_spark

    spark = get_spark("idhub_spark_bench")
    # warm the JVM + parquet footers once, outside timing
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    names = [n for n in HEADLINE if n in REGISTRY]
    # include everything registered but not in HEADLINE too
    names += [n for n in sorted(REGISTRY) if n not in names]

    # Two back-to-back passes, min-of-2 per query: r5 showed single-run
    # wall times on this box carry ±2-8s one-off spikes that migrate
    # between unrelated queries (GC/JIT/page-cache), so a single run
    # cannot detect a real 20% regression. The min is the stable
    # statistic for "how fast can this plan go on this box".
    runs: list[dict[str, float]] = [{}, {}]
    failed: list[set[str]] = [set(), set()]
    for pass_i in range(2):
        for name in names:
            fn = REGISTRY[name].fn
            t0 = time.perf_counter()
            # One failing query must not kill the whole run (r4 lost
            # ALL bench data to a single AnalysisException): record it
            # and keep going. Errors go in the JSON as names-only.
            try:
                df = fn(spark, sf_dir)
                n = df.count()
                dt = time.perf_counter() - t0
                runs[pass_i][name] = round(dt, 4)
                print(f"# p{pass_i} {name}: {dt:.3f}s ({n} rows)", file=sys.stderr)
            except Exception as e:
                failed[pass_i].add(name)
                print(f"# p{pass_i} {name}: ERROR {type(e).__name__}", file=sys.stderr)
            finally:
                # drop persisted intermediates between queries — even on
                # error — so one query's leftovers (or a failed query's
                # persisted subtrees) never tax the next query's timing
                spark.catalog.clearCache()

    # a query is an ERROR only if BOTH passes failed; one success keeps
    # its measurement (and the flake is recorded in the sidecar), so
    # `timings` and `errors` are disjoint by construction
    timings = {
        name: min(t for t in (runs[0].get(name), runs[1].get(name)) if t is not None)
        for name in names
        if name in runs[0] or name in runs[1]
    }
    errors = [n for n in names if n in failed[0] and n in failed[1]]
    flaky = sorted((failed[0] ^ failed[1]) - set(errors))
    total = sum(timings.values())

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    sf_val = float(sf) if sf else None

    # Full per-query detail goes to a sidecar file; the stdout line is
    # kept under ~1900 bytes because the driver records only the LAST
    # 2000 bytes of stdout — a longer line gets its head cut off and
    # becomes unparseable (r1's BENCH tail proved this). The stdout
    # queries dict carries the headline five plus the slowest entries
    # that fit; everything is always in the sidecar.
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "bench_queries_full.json"), "w") as f:
        json.dump(
            {
                "queries": timings,  # min-of-2 per query
                "run1": runs[0],
                "run2": runs[1],
                "errors": errors,
                "flaky": flaky,  # failed one pass, succeeded the other
                "sf": sf_val,
                "total": round(total, 4),
                # Per-query wall times on this box carry ±2-8s one-off
                # spikes that migrate between unrelated queries
                # run-to-run (GC/JIT/page-cache) — hence min-of-2.
                # The driver regenerated testdata after r3 (events
                # 500k -> 100k rows at sf0.1; documents corpus more
                # self-similar), so cross-round per-query deltas
                # before/after r3 are not like-for-like.
                "note": "min-of-2 per query; testdata regenerated post-r3",
                # r7 VERDICT ask #5, measured r8 via Compilation/GC
                # MXBeans: the recurring run-1 spikes (audit_trail
                # 6.2s->1.2s, pricing_summary 1.8s->0.3s between
                # passes) are HotSpot JIT + whole-stage-codegen
                # compilation of each plan's first execution —
                # audit_trail run-1 carries ~11s of compiler-THREAD
                # time vs ~3s on run-2, while GC is 0.01-0.04s/run and
                # page cache is pre-warmed. Not engine-attributable;
                # min-of-2 is the correct steady-state statistic.
                "spike_diagnosis": "run-1 spikes = JIT/codegen compile "
                "(MXBean-measured); GC negligible",
            },
            f,
        )

    ordered = [n for n in HEADLINE if n in timings] + [
        n for n, _ in sorted(timings.items(), key=lambda kv: -kv[1])
        if n not in HEADLINE
    ]
    out = {
        "metric": "total_query_wall_seconds",
        "value": round(total, 4),
        "unit": "sec",
        "queries": {},
        "stat": "min_of_2",
        # the OBSERVED parallelism (VERDICT r19 ask #2): the driver's
        # scaling check cannot otherwise distinguish 'env honored but
        # fixed-overhead-bound at this SF' from 'env ignored' —
        # defaultParallelism is what local[$SPARK_GRAFT_CPUS] actually
        # gave this run.
        "cpus": spark.sparkContext.defaultParallelism,
        "n_queries": len(timings),
        "errors": errors[:10],
        "n_errors": len(errors),
        "detail_file": "bench_queries_full.json",
        "sf": sf_val,
    }
    for name in ordered:
        out["queries"][name] = timings[name]
        if len(json.dumps(out, separators=(",", ":"))) > 1800:
            del out["queries"][name]
            break
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
