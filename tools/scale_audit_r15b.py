"""Round-15 addendum: what the staged IVF append costs vs the old
direct write.

The r15 exactly-once port moved ivf_sq8_index_append from a bare
enc.write.mode('append') to stage-commit-promote (write the batch's
partition tree under _append_staging, two marker creates, one rename
per staged file, staging delete). The write itself is unchanged — the
batch is written ONCE either way — so the expected overhead is the
promotion's per-file rename term (~3 ms/file local, network RTT on
object stores where the 16-worker pool in _move_tree applies) plus a
constant handful of driver fs calls. This audit measures both routes
at the same batch shapes to put a number on it.

Method: build a k=64 IVF-SQ8 index over 200k synthetic 64-dim
vectors; for batch sizes 1k / 10k / 50k append one fresh batch via
(a) the STAGED API and (b) the old direct write reconstructed inline
(same encode + repartition + write.mode('append'), no staging) —
fresh id region per cell, reps=1 (appends mutate state), file counts
from the cluster dirs. The staged route touches ≤ k files per append
(files_per_cluster=1), so the rename term is bounded by k at any
batch size.

Usage: python tools/scale_audit_r15b.py  (rows to stdout; table goes
into docs/scale_audit_r15.md §4). Audit tooling only.
"""

from __future__ import annotations

import glob
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_audit import ROOT, timed  # noqa: E402

DIM = 64
K = 64
N_BASE = 200_000
BATCHES = [1_000, 10_000, 50_000]


def synth_vectors(spark, n, offset=0):
    from pyspark.sql import functions as F

    return spark.range(n).select(
        (F.col("id") + offset).alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(DIM)),
            lambda d: (
                F.pmod(F.xxhash64(F.col("id") + offset, d), F.lit(1000))
                / F.lit(500.0)
                - F.lit(1.0)
            ),
        ).alias("embedding"),
    )


def n_files(path):
    return len(glob.glob(f"{path}/cluster=*/*.parquet"))


def main() -> None:
    from pyspark.sql import functions as F

    from idhub_spark.operators.ann import (
        _assign,
        ivf_sq8_index_append,
        ivf_sq8_index_write,
        kmeans_fit,
        sq8_encode,
        sq8_fit,
    )
    from idhub_spark.session import get_spark

    spark = get_spark()
    audit_root = os.path.join(ROOT, "r15b")
    shutil.rmtree(audit_root, ignore_errors=True)
    os.makedirs(audit_root, exist_ok=True)

    base = synth_vectors(spark, N_BASE)
    centroids = kmeans_fit(base.limit(1_000), k=K, max_iter=2)
    bounds = sq8_fit(base.limit(1_000))

    def direct_append(batch, path):
        """The OLD route, reconstructed: same encode + repartition +
        bare write.mode('append') — no staging, no promotion."""
        vec_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
        b = batch.select(
            F.col("vec_id").alias("_id"),
            F.col("embedding").alias("_orig"),
            vec_d.alias("_v"),
        )
        enc = sq8_encode(_assign(b, centroids), bounds, vec_col="_v").select(
            F.col("_id").alias("vec_id"),
            F.col("_orig").alias("embedding"),
            "code",
            "cluster",
        ).repartition(F.col("cluster"))
        enc.write.mode("append").partitionBy("cluster").parquet(path)

    for size in BATCHES:
        for route in ("staged", "direct"):
            idx = os.path.join(audit_root, f"idx_{route}_{size}")
            w_build, _ = timed(
                lambda: ivf_sq8_index_write(base, centroids, bounds, idx),
                reps=1,
            )
            f0 = n_files(idx)
            batch = synth_vectors(spark, size, offset=10_000_000 + size)
            if route == "staged":
                w, r = timed(
                    lambda: ivf_sq8_index_append(
                        batch, centroids, bounds, idx, batch_id=f"b{size}"
                    ),
                    reps=1,
                )
            else:
                w, r = timed(lambda: direct_append(batch, idx), reps=1)
            created = n_files(idx) - f0
            n_rows = spark.read.parquet(idx).count()
            print(
                f"append size={size} route={route}: wall={w:.2f}s "
                f"(+{created} files) rows={n_rows} "
                f"(build {w_build:.1f}s)",
                flush=True,
            )
            shutil.rmtree(idx, ignore_errors=True)

    shutil.rmtree(audit_root, ignore_errors=True)


if __name__ == "__main__":
    main()
