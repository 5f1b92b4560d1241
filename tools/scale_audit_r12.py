"""Round-12 scale audit (r11 VERDICT ask #5), same methodology as
tools/scale_audit_r{9,10,11}.py.

Measured paths:

  dedup_probe_layouts  the r12 bucketed MinHash index vs the flat
                       (r11, stream-all) layout at history 20k / 200k
                       / 2M docs (10x and 100x) with a FIXED 100-doc
                       batch: probe wall per layout per scale, planted
                       exact copies found 50/50 at every cell, band
                       partitions/files actually read vs total (the
                       linear band-scan term the bucketing removes),
                       and result identity flat-vs-bucketed at S.
  split_policy_skewed  split_hot_clusters on a GENUINELY skewed index
                       (one blob cluster holding 70% of the corpus —
                       the r11 audit's split rows used uniform
                       batches) at 20k and 200k vectors: wall, post
                       max share <= threshold, rows preserved,
                       untouched sibling files mtime-stable.
  ivf_pq_append_10x    on-disk IVF-PQ append at 20k vs 200k corpus
                       (the r11 table's SQ8-append twin): new files
                       track the batch's touched clusters, zero
                       existing files rewritten, wall ∝ batch.

Usage: python tools/scale_audit_r12.py  (rows to stdout; table goes
into docs/scale_audit_r12.md). Walls are min-of-2 in one session
unless the operation mutates state (reps=1). Audit tooling only — no
engine code paths change.
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


def synth_docs(spark, n, offset=0):
    """~20-word deterministic texts over a 500-word vocab (the r11
    generator); text is a function of the OFFSET id so offset>0 yields
    genuinely new docs."""
    from pyspark.sql import functions as F

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


def main() -> None:
    from pyspark.sql import functions as F

    from idhub_spark.session import get_spark

    sections = set(sys.argv[1:]) or {"dedup", "split", "pq", "retract"}
    spark = get_spark()
    audit_root = os.path.join(ROOT, "r12")
    shutil.rmtree(audit_root, ignore_errors=True)
    os.makedirs(audit_root, exist_ok=True)

    # --- 1. dedup probe: bucketed vs flat at 10x and 100x history --------
    from idhub_spark.operators.dedup_index import (
        minhash_index_probe,
        minhash_index_write,
    )

    PB, DB = 4096, 1024
    # fixed batch: 50 new docs + 50 exact copies of history docs
    batch = synth_docs(spark, 50, offset=10_000_000).unionByName(
        synth_docs(spark, 50).select(
            (F.col("doc_id") + 20_000_000).alias("doc_id"), "text"
        )
    )

    def probe_found(path):
        return (
            minhash_index_probe(spark, path, batch, include_batch_pairs=False)
            .filter(F.col("est_jaccard") == 1.0)
            .filter(F.col("dup_id") == F.col("new_id") - 20_000_000)
            .count()
        )

    ref_rows = None
    for tag, n_hist in (
        {"S": 20_000, "XL": 200_000, "XXL": 2_000_000} if "dedup" in sections else {}
    ).items():
        hist = synth_docs(spark, n_hist)
        row = {}
        for layout, pb, db in (("flat", 0, 0), ("bucketed", PB, DB)):
            path = os.path.join(audit_root, f"mh_{layout}_{tag}")
            w_build, _ = timed(
                lambda: minhash_index_write(
                    hist, path, n_hashes=16, bands=4, pb_buckets=pb, db_buckets=db
                ),
                reps=1,
            )
            w_probe, found = timed(lambda: probe_found(path))
            row[layout] = (w_build, w_probe, found)
        # band files actually read by the bucketed candidate join: the
        # probe prunes to the batch's pb set; measure via the same read
        bpath = os.path.join(audit_root, f"mh_bucketed_{tag}")
        from idhub_spark.operators.dedup_index import (
            _bands_from_state,
            _doc_state,
        )

        b_bands = _bands_from_state(
            _doc_state(batch, n_hashes=16, id_col="doc_id", text_col="text"),
            n_hashes=16,
            bands=4,
        )
        pbs = [
            r.pb
            for r in b_bands.select(
                F.pmod(F.col("bkey"), F.lit(PB)).alias("pb")
            )
            .distinct()
            .collect()
        ]
        total_files = len(
            glob.glob(f"{bpath}/bands/**/*.parquet", recursive=True)
        )
        read_files = (
            spark.read.parquet(f"{bpath}/bands")
            .filter(F.col("pb").isin(pbs))
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )
        fw, fp, ff = row["flat"]
        bw, bp, bf = row["bucketed"]
        print(
            f"{tag} dedup_probe_layouts: history={n_hist} "
            f"flat(build={fw:.1f}s probe={fp:.2f}s found={ff}/50) "
            f"bucketed(build={bw:.1f}s probe={bp:.2f}s found={bf}/50) "
            f"band_files_read={read_files}/{total_files} "
            f"({read_files / max(total_files, 1):.3f}; batch touches "
            f"{len(pbs)}/{PB} pb partitions)",
            flush=True,
        )
        if tag == "S":
            # result identity flat vs bucketed (full pair relation)
            a = sorted(
                map(
                    tuple,
                    minhash_index_probe(
                        spark,
                        os.path.join(audit_root, "mh_flat_S"),
                        batch,
                        threshold_est=0.35,
                    ).collect(),
                )
            )
            b = sorted(
                map(
                    tuple,
                    minhash_index_probe(
                        spark, bpath, batch, threshold_est=0.35
                    ).collect(),
                )
            )
            ref_rows = len(a)
            print(
                f"S dedup_probe_identity: flat==bucketed "
                f"{'YES' if a == b else 'NO'} ({ref_rows} pairs)",
                flush=True,
            )

    # --- 2. split policy on a genuinely skewed index ----------------------
    from idhub_spark.operators.ann import (
        ivf_index_stats,
        ivf_sq8_index_write,
        kmeans_fit,
        split_hot_clusters,
        sq8_fit,
    )

    reps = spark.createDataFrame(
        [(0, [10.0] * DIMS), (1, [-0.5] * DIMS), (2, [0.5] * DIMS)],
        "vec_id long, embedding array<double>",
    )
    centroids3 = kmeans_fit(reps, k=3, max_iter=0)
    for tag, n in ({"S": 20_000, "XL": 200_000} if "split" in sections else {}).items():
        base = synth_vectors(spark, n)
        blob = base.filter(F.col("vec_id") % 10 < 7).select(
            "vec_id",
            F.transform("embedding", lambda x: x * 0.1 + 10.0).alias(
                "embedding"
            ),
        )
        vecs = blob.unionByName(base.filter(F.col("vec_id") % 10 >= 7))
        path = os.path.join(audit_root, f"skew_{tag}")
        ivf_sq8_index_write(vecs, centroids3, sq8_fit(vecs), path)
        st = {
            r.cluster: r.n_rows for r in ivf_index_stats(spark, path).collect()
        }
        hot_share = max(v for c, v in st.items() if c >= 0) / st[-1]
        others_before = {
            f: os.path.getmtime(f)
            for f in glob.glob(f"{path}/cluster=*/*.parquet")
        }
        # sample_n=1000: blob values sit at ~10.0, so |quantized x| is
        # ~10100 at the 1e-3 assignment grid and the default 4000-row
        # sample exceeds the exact-arithmetic kmeans envelope
        # (dims*(2*n*S*|x|max)^2 < 2^53); 1000 rows stay inside it
        w_sp, (_, report) = timed(
            lambda: split_hot_clusters(
                spark, path, max_share=0.45, k2=2, sample_n=1000
            ),
            reps=1,
        )
        s2 = {
            r.cluster: r.n_rows for r in ivf_index_stats(spark, path).collect()
        }
        post_share = max(v for c, v in s2.items() if c >= 0) / s2[-1]
        survivors = {
            f
            for f in others_before
            if os.path.exists(f)
        }
        stable = all(
            os.path.getmtime(f) == others_before[f] for f in survivors
        )
        print(
            f"{tag} split_policy_skewed: n={n} pre_max_share={hot_share:.2f} "
            f"splits={len(report)} post_max_share={post_share:.2f} "
            f"rows_preserved={'YES' if s2[-1] == st[-1] else 'NO'} "
            f"survivor_files_stable={'YES' if stable else 'NO'} "
            f"wall={w_sp:.2f}s",
            flush=True,
        )

    # --- 3. IVF-PQ on-disk append at 10x ----------------------------------
    from idhub_spark.operators.ann import (
        ivf_pq_index_append,
        ivf_pq_index_write,
        pq_fit,
    )

    sample = synth_vectors(spark, 4_000)
    centroids16 = kmeans_fit(sample, k=16, max_iter=3)
    codebook = pq_fit(sample, m=8, k=16, max_iter=2)
    for tag, n in ({"S": 20_000, "XL": 200_000} if "pq" in sections else {}).items():
        vecs = synth_vectors(spark, n)
        path = os.path.join(audit_root, f"pq_{tag}")
        ivf_pq_index_write(vecs, centroids16, codebook, path)
        before = {
            f: os.path.getmtime(f)
            for f in glob.glob(f"{path}/cluster=*/*.parquet")
        }
        app = synth_vectors(spark, n + n // 10).filter(F.col("vec_id") >= n)
        w_a, _ = timed(
            lambda: ivf_pq_index_append(app, centroids16, codebook, path),
            reps=1,
        )
        after = {
            f: os.path.getmtime(f)
            for f in glob.glob(f"{path}/cluster=*/*.parquet")
        }
        rewritten = [f for f in before if after.get(f) != before[f]]
        print(
            f"{tag} ivf_pq_append: corpus={n} batch={n // 10} "
            f"new_files={len(after) - len(before)} "
            f"rewritten={len(rewritten)} wall={w_a:.2f}s",
            flush=True,
        )

    # --- 4. retraction & cold-merge at 10x --------------------------------
    # fixed-size victim sets against growing state: dedup delete wall
    # must track the TOUCHED partitions (bounded by victims), ivf
    # delete = one metadata-weight (id, cluster) scan + rewrite of the
    # victims' clusters, cold-merge = I/O ∝ the cold rows.
    if "retract" in sections:
        from idhub_spark.operators.ann import (
            ivf_index_delete,
            ivf_index_merge_cold_clusters,
            ivf_index_stats,
            ivf_sq8_index_write,
            sq8_fit,
        )
        from idhub_spark.operators.dedup_index import (
            minhash_index_delete,
            minhash_index_write,
        )

        for tag, n_hist in {"S": 20_000, "XL": 200_000}.items():
            hist = synth_docs(spark, n_hist)
            mpath = os.path.join(audit_root, f"mh_del_{tag}")
            minhash_index_write(
                hist, mpath, n_hashes=16, bands=4,
                pb_buckets=4096, db_buckets=1024,
            )
            victims = list(range(100, 120))  # fixed 20 docs
            w_d, rep = timed(
                lambda: minhash_index_delete(spark, mpath, victims), reps=1
            )
            print(
                f"{tag} dedup_delete: history={n_hist} victims=20 "
                f"rows_deleted={rep['rows_deleted']} "
                f"docs_parts={rep['docs_partitions_rewritten']} "
                f"bands_parts={rep['bands_partitions_rewritten']} "
                f"wall={w_d:.2f}s",
                flush=True,
            )

        sample = synth_vectors(spark, 4_000)
        cents = kmeans_fit(sample, k=16, max_iter=3)
        bnds = sq8_fit(sample)
        for tag, n in {"S": 20_000, "XL": 200_000}.items():
            vecs = synth_vectors(spark, n)
            vpath = os.path.join(audit_root, f"sq8_del_{tag}")
            ivf_sq8_index_write(vecs, cents, bnds, vpath)
            w_v, vrep = timed(
                lambda: ivf_index_delete(spark, vpath, list(range(50))),
                reps=1,
            )
            # cold-merge: shrink two clusters to sub-scale by deleting
            # most of their members, then fold them away
            st = {
                r.cluster: r.n_rows
                for r in ivf_index_stats(spark, vpath).collect()
                if r.cluster >= 0
            }
            two = sorted(st, key=st.get)[:2]
            idx = spark.read.parquet(vpath)
            doomed = [
                int(r.vec_id)
                for c in two
                for r in idx.filter(F.col("cluster") == c)
                .select("vec_id")
                .collect()[: st[c] - 20]
            ]
            ivf_index_delete(spark, vpath, doomed)
            w_m, (_, mrep) = timed(
                lambda: ivf_index_merge_cold_clusters(
                    spark, vpath, min_rows=100, centroids=cents
                ),
                reps=1,
            )
            print(
                f"{tag} ivf_retract: corpus={n} "
                f"delete(rows={vrep['rows_deleted']} "
                f"clusters={vrep['clusters_rewritten']} wall={w_v:.2f}s) "
                f"merge_cold(merged={mrep['merged_clusters']} "
                f"rows_moved={mrep['rows_moved']} wall={w_m:.2f}s)",
                flush=True,
            )

    shutil.rmtree(audit_root, ignore_errors=True)


if __name__ == "__main__":
    main()
