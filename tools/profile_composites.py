"""Per-operator-call wall-time profile of the composite state queries.

Wraps the dedup_index / ann maintenance entry points with timing
shims (the queries `from`-import them at call time, so patching the
module attribute is enough), runs the named queries once at
$SPARK_GRAFT_SF_DIR, and prints one line per operator invocation plus
the query total. Measurement-only tooling — never imported by the
engine.

Usage: python tools/profile_composites.py query_a query_b ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


_JOBS = {"tracker": None}


def _job_count() -> int:
    """Total Spark jobs submitted so far (AppStatusStore row count) —
    the action-count signal the r20 optimization targets: every
    collect/count/checkpoint/write is >= 1 job, and the composite
    state queries are job-count-bound at ~0.25 s/job (r19 profiler)."""
    store = _JOBS["tracker"]
    return store.jobsList(None).size() if store is not None else 0


def _wrap(mod, name, log):
    fn = getattr(mod, name)

    def shim(*a, **kw):
        t0 = time.perf_counter()
        j0 = _job_count()
        try:
            return fn(*a, **kw)
        finally:
            log.append((name, time.perf_counter() - t0, _job_count() - j0))

    shim.__name__ = fn.__name__
    setattr(mod, name, shim)
    return fn


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:]
    if not names:
        print("usage: profile_composites.py <query> [query...]", file=sys.stderr)
        sys.exit(2)

    from idhub_spark.operators import ann, dedup_index
    from idhub_spark.queries import REGISTRY
    from idhub_spark.session import get_spark

    log: list[tuple[str, float]] = []
    for name in (
        "minhash_index_write",
        "minhash_index_append",
        "minhash_index_delete",
        "minhash_index_fold_delta",
        "minhash_index_probe",
        "minhash_index_compact",
        "minhash_index_stats",
        "_doc_state",
        "_load_params",
    ):
        _wrap(dedup_index, name, log)
    for name in (
        "kmeans_fit",
        "ivf_sq8_index_write",
        "ivf_sq8_search_index",
        "ivf_sq8_index_append",
        "ivf_pq_index_write",
        "ivf_pq_search_index",
        "ivf_index_stats",
        "ivf_index_compact",
        "ivf_index_split_cluster",
        "split_hot_clusters",
        "ivf_index_delete",
        "ivf_index_merge_cold_clusters",
        "ivf_index_adopt_unrouted",
        "ivf_index_load_fits",
        "ivf_index_save_fits",
    ):
        _wrap(ann, name, log)

    spark = get_spark("idhub_profile")
    _JOBS["tracker"] = spark.sparkContext._jsc.sc().statusStore()
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    for qname in names:
        log.clear()
        spark.sparkContext.setJobDescription(f"profile:{qname}")
        t0 = time.perf_counter()
        j0 = _job_count()
        df = REGISTRY[qname].fn(spark, sf_dir)
        n = df.count()
        total = time.perf_counter() - t0
        total_jobs = _job_count() - j0
        spark.catalog.clearCache()
        print(f"== {qname}: {total:.3f}s total, {total_jobs} Spark jobs ({n} rows)")
        acc = total
        for op, dt, jobs in log:
            # nested calls double-count (e.g. _doc_state inside append);
            # indent the inner ones visually by name only
            print(f"   {dt:7.3f}s {jobs:3d}j  {op}")
        covered = sum(
            dt for op, dt, _j in log if not op.startswith("_")
        )
        cov_jobs = sum(_j for op, dt, _j in log if not op.startswith("_"))
        print(
            f"   {acc - covered:7.3f}s {total_jobs - cov_jobs:3d}j  "
            "(outside top-level ops)"
        )


if __name__ == "__main__":
    main()
