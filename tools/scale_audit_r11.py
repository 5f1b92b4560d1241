"""Round-11 scale audit: the round-10 operators at 10x (r10 VERDICT
ask #6), same methodology as tools/scale_audit_r10.py.

Measured paths:

  ivf_index_io       on-disk IVF-SQ8 AND IVF-PQ indexes at S=20k vs
                     XL=200k vectors: files a probe reads vs total
                     (expect ~nprobe/k at BOTH scales — I/O tracks the
                     probe set, not the corpus), PartitionFilters in
                     the executed plan, append-only growth (no
                     existing file rewritten, new-file count tracks
                     the batch's clusters), search wall
  zorder_skipping    Z-order layout at 16 vs 160 files (10x rows):
                     files read for a 1/16-selectivity predicate on
                     EACH of the two z-columns — the per-dim fraction
                     should hold (~n^(1/2) per dim), not degrade to
                     full scans as the file count grows
  kmv_10x            KMV sketches at 20k vs 200k distinct keys
                     (k=512): sketch row count pinned at k at both
                     scales (size invariance — the whole point), the
                     estimate's relative error within the ~4.4% sigma
                     band at both, and partitioning invariance
                     (32 vs 256 input partitions -> identical sketch)

Usage: python tools/scale_audit_r11.py  (rows to stdout; table goes
into docs/scale_audit_r11.md). Walls are min-of-2 in one session.
Audit tooling only — no engine code paths change.
"""

from __future__ import annotations

import glob
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_audit import ROOT, timed  # noqa: E402

DIMS = 16


def synth_vectors(spark, n: int):
    """Deterministic synthetic embeddings: DIMS dims in [-1, 1),
    derived by per-(id, dim) hashing — no data files needed."""
    from pyspark.sql import functions as F

    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(DIMS)),
            lambda d: (
                F.pmod(F.xxhash64(F.col("id"), d), F.lit(2000)).cast("double")
                / 1000.0
                - 1.0
            ),
        ).alias("embedding"),
    )


def main() -> None:
    from pyspark.sql import functions as F

    from idhub_spark.operators.ann import (
        ivf_pq_index_write,
        ivf_pq_search_index,
        ivf_sq8_index_append,
        ivf_sq8_index_write,
        ivf_sq8_search_index,
        kmeans_fit,
        pq_fit,
        sq8_fit,
    )
    from idhub_spark.operators.sketches import (
        kmv_distinct_estimate,
        kmv_sketch,
    )
    from idhub_spark.session import get_spark
    from idhub_spark.storage import file_skipping_stats, zorder_layout

    spark = get_spark()
    audit_root = os.path.join(ROOT, "r11")
    shutil.rmtree(audit_root, ignore_errors=True)
    os.makedirs(audit_root, exist_ok=True)

    # --- 1. on-disk IVF index I/O proportionality ------------------------
    # train once on an envelope-sized hash-sample (the documented 100 TB
    # recipe), reuse the fits for both scales so the CLUSTER GEOMETRY is
    # held constant and only the corpus size varies.
    K_CLUSTERS, NPROBE = 16, 2
    sample = synth_vectors(spark, 4_000)
    centroids = kmeans_fit(sample, k=K_CLUSTERS, max_iter=3)
    bounds = sq8_fit(sample)
    codebook = pq_fit(sample, m=8, k=16, max_iter=2)
    # 2 queries: the measured read fraction is the probe-set UNION, so
    # the query batch must stay small relative to k for the per-query
    # nprobe/k bound to be visible (8 queries x nprobe 2 saturated the
    # 16-cluster union in the first pass of this audit)
    queries = synth_vectors(spark, 2)

    for tag, n in {"S": 20_000, "XL": 200_000}.items():
        vecs = synth_vectors(spark, n)
        for codec, write, search in (
            (
                "sq8",
                lambda v, p: ivf_sq8_index_write(v, centroids, bounds, p),
                lambda p, q: ivf_sq8_search_index(
                    spark, p, q, centroids, bounds, k=5, nprobe=NPROBE
                ),
            ),
            (
                "pq",
                lambda v, p: ivf_pq_index_write(v, centroids, codebook, p),
                lambda p, q: ivf_pq_search_index(
                    spark, p, q, centroids, codebook, k=5, nprobe=NPROBE
                ),
            ),
        ):
            path = os.path.join(audit_root, f"ivf_{codec}_{tag}")
            write(vecs, path)
            all_files = glob.glob(f"{path}/cluster=*/*.parquet")
            res = search(path, queries)
            w_s, n_rows = timed(lambda: len(res.collect()))
            plan = res._jdf.queryExecution().executedPlan().toString()
            import re

            m = re.search(
                r"PartitionFilters: \[[^\]]*cluster[^\]]*?"
                r"(?:IN \(([^)]+)\)|INSET ([\d,\s]+))",
                plan,
            )
            if not m:
                raise AssertionError(
                    "audit regex found no cluster IN/INSET in "
                    f"PartitionFilters — plan format changed?\n{plan[:2000]}"
                )
            probed = sorted(
                {int(x) for x in re.findall(r"-?\d+", m.group(1) or m.group(2))}
            )
            probed_files = sum(
                len(glob.glob(f"{path}/cluster={c}/*.parquet")) for c in probed
            )
            print(
                f"{tag} ivf_index_io[{codec}]: corpus={n} files={len(all_files)} "
                f"probed_clusters={probed} probed_files={probed_files} "
                f"read_fraction={probed_files / len(all_files):.3f} "
                f"(clusters {K_CLUSTERS}, nprobe {NPROBE} -> ideal "
                f"{NPROBE / K_CLUSTERS:.3f}) wall={w_s:.2f}s",
                flush=True,
            )

        # append-only growth (SQ8 path; PQ shares _ivf_index_materialize)
        path = os.path.join(audit_root, f"ivf_sq8_{tag}")
        before = {
            f: os.path.getmtime(f)
            for f in glob.glob(f"{path}/cluster=*/*.parquet")
        }
        batch = synth_vectors(spark, n + n // 10).filter(F.col("vec_id") >= n)
        # reps=1: timed's default min-of-2 would APPEND TWICE
        w_a, _ = timed(
            lambda: ivf_sq8_index_append(batch, centroids, bounds, path), reps=1
        )
        after = {
            f: os.path.getmtime(f)
            for f in glob.glob(f"{path}/cluster=*/*.parquet")
        }
        rewritten = [f for f in before if after.get(f) != before[f]]
        print(
            f"{tag} ivf_index_append: batch={n // 10} new_files="
            f"{len(after) - len(before)} rewritten={len(rewritten)} "
            f"wall={w_a:.2f}s",
            flush=True,
        )

    # --- 2. Z-order skipping at 10x files --------------------------------
    for tag, (rows, files) in {"S": (40_000, 16), "XL": (400_000, 160)}.items():
        df = spark.range(rows).select(
            F.col("id").alias("k"),
            F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(10_000)).alias("x"),
            F.pmod(F.xxhash64(F.col("id"), F.lit(2)), F.lit(10_000)).alias("y"),
        )
        zed = os.path.join(audit_root, f"zed_{tag}")
        w_z, _ = timed(lambda: zorder_layout(df, ["x", "y"], zed, n_files=files))
        lo, hi = 0, 624  # ~1/16 of either domain
        n_x, r_x = file_skipping_stats(spark, zed, "x", lo, hi)
        n_y, r_y = file_skipping_stats(spark, zed, "y", lo, hi)
        print(
            f"{tag} zorder_skipping: files={n_x} read_x={r_x} "
            f"({r_x / n_x:.3f}) read_y={r_y} ({r_y / n_y:.3f}) "
            f"layout_wall={w_z:.2f}s",
            flush=True,
        )

    # --- 2b. hot-cluster split I/O ∝ split cluster ------------------------
    # split the biggest cluster of each index scale: wall must track the
    # SPLIT CLUSTER's rows (≈ corpus/k here), untouched dirs mtime-stable
    from idhub_spark.operators.ann import (
        ivf_index_split_cluster,
        ivf_index_stats,
    )

    for tag, n in {"S": 20_000, "XL": 200_000}.items():
        path = os.path.join(audit_root, f"ivf_sq8_{tag}")
        st = {r.cluster: r.n_rows for r in ivf_index_stats(spark, path).collect()}
        hot = max((c for c in st if c >= 0), key=lambda c: st[c])
        others_before = {
            f: os.path.getmtime(f)
            for f in glob.glob(f"{path}/cluster=*/*.parquet")
            if f"cluster={hot}/" not in f
        }
        w_sp, _ = timed(
            lambda: ivf_index_split_cluster(spark, path, hot, k2=2), reps=1
        )
        others_after = {
            f: os.path.getmtime(f)
            for f in glob.glob(f"{path}/cluster=*/*.parquet")
            if f"cluster={hot}/" not in f
        }
        stable = all(others_after.get(f) == t for f, t in others_before.items())
        s2 = {r.cluster: r.n_rows for r in ivf_index_stats(spark, path).collect()}
        print(
            f"{tag} ivf_index_split: hot={hot} rows={st[hot]} "
            f"untouched_dirs_stable={'YES' if stable else 'NO'} "
            f"rows_preserved={'YES' if s2[-1] == st[-1] else 'NO'} "
            f"wall={w_sp:.2f}s",
            flush=True,
        )

    # --- 3. KMV at 10x distinct keys -------------------------------------
    KSK = 512
    for tag, n_distinct in {"S": 20_000, "XL": 200_000}.items():
        # every key appears ~3x so the sketch sees duplicates too
        keys = spark.range(n_distinct * 3).select(
            (F.col("id") % n_distinct).alias("key")
        )
        for parts in (32, 256):
            sk = kmv_sketch(keys.repartition(parts), "key", KSK)
            n_rows = sk.count()
            est = kmv_distinct_estimate(sk, KSK).collect()[0].n_distinct_est
            err = abs(est - n_distinct) / n_distinct
            print(
                f"{tag} kmv_10x parts={parts}: distinct={n_distinct} "
                f"sketch_rows={n_rows} (k={KSK}) est={est:.0f} "
                f"rel_err={err:.4f} (sigma ~{1 / (KSK - 2) ** 0.5:.4f})",
                flush=True,
            )

    # --- 4. incremental dedup probe cost ∝ batch, not history -------------
    # history 10x (20k -> 200k docs), batch FIXED (500 docs incl. 250
    # planted exact copies): probe wall must track the batch, recall of
    # planted copies must stay 100% (exact copies match every band).
    from idhub_spark.operators.dedup_index import (
        minhash_index_probe,
        minhash_index_write,
    )

    def synth_docs(n, offset=0):
        # ~20-word deterministic texts over a 500-word vocab; text is a
        # function of the OFFSET id so offset>0 yields genuinely new docs
        return spark.range(n).select(
            (F.col("id") + offset).alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(1), F.lit(20)),
                    lambda w: F.concat(
                        F.lit("w"),
                        F.pmod(
                            F.xxhash64(F.col("id") + offset, w), F.lit(500)
                        ).cast("string"),
                    ),
                ),
            ).alias("text"),
        )

    for tag, n_hist in {"S": 20_000, "XL": 200_000}.items():
        hist = synth_docs(n_hist)
        path = os.path.join(audit_root, f"mh_{tag}")
        w_build, _ = timed(
            lambda: minhash_index_write(hist, path, n_hashes=16, bands=4),
            reps=1,
        )
        batch = synth_docs(250, offset=10_000_000).unionByName(
            # 250 exact copies of history docs, new ids
            synth_docs(250).select(
                (F.col("doc_id") + 20_000_000).alias("doc_id"), "text"
            )
        )
        w_probe, found = timed(
            lambda: minhash_index_probe(
                spark, path, batch, include_batch_pairs=False
            )
            .filter(F.col("est_jaccard") == 1.0)
            .filter(F.col("dup_id") == F.col("new_id") - 20_000_000)
            .count()
        )
        print(
            f"{tag} dedup_index: history={n_hist} build_wall={w_build:.2f}s "
            f"probe_wall={w_probe:.2f}s planted_found={found}/250",
            flush=True,
        )

    shutil.rmtree(audit_root, ignore_errors=True)


if __name__ == "__main__":
    main()
