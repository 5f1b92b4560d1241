"""Round-14 scale audit (VERDICT r13 ask #3): the dedup index's LSM
DELTA BUFFER vs the direct append path — the fix for r13 audit §2's
finding that a direct append creates ~min(batch_band_rows, pb) +
min(batch_docs, db) files (~4,500 staged creations + renames at
pb=4096/db=1024) REGARDLESS of batch bytes, ~47-84 s per append on
the audit host.

Measured here, at 2M and 20M history docs (same decade as r13):

  build the FULL history once into the bucketed (pb=4096/db=1024)
  index, then for batch sizes 100 / 1k / 10k / 100k docs append one
  fresh batch per ROUTE (direct, then delta) and record wall + files
  created (live Hive trees for direct, <root>/delta for delta). The
  delta claim is file ops O(1): exactly 2 files per append at EVERY
  batch size, wall ∝ batch bytes. Then
    - probe the delta'd tree (fixed 100-doc batch: planted exact
      copies of 50 history + 25 direct-appended + 25 delta-appended
      docs) — wall (min-of-2) + found count,
    - minhash_index_compact to a sibling (the LSM FOLD: delta +
      append debris -> 1 file/partition, no delta dir) — wall,
      file counts, probe parity on the folded copy,
    - delete 20 victims (10 history + 10 delta-resident) on the
      delta'd tree — wall + the delta_rows_deleted split.

Usage: python tools/scale_audit_r14.py [tiny|small|big]  (rows to
stdout; table goes into docs/scale_audit_r14.md). Walls min-of-2 in
one session unless the operation mutates state (reps=1). Audit
tooling only — no engine code paths change.
"""

from __future__ import annotations

import glob
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_audit import ROOT, timed  # noqa: E402
from tools.scale_audit_r12 import synth_docs  # noqa: E402

PB, DB = 4096, 1024
BATCH_SIZES = [100, 1_000, 10_000, 100_000]
DIRECT_BASE = 100_000_000  # id regions: fresh per (route, size)
DELTA_BASE = 200_000_000
COPY_BASE = 900_000_000


def live_files(path):
    return len(glob.glob(f"{path}/docs/**/*.parquet", recursive=True)) + len(
        glob.glob(f"{path}/bands/**/*.parquet", recursive=True)
    )


def delta_files(path):
    return len(glob.glob(f"{path}/delta/*/*.parquet"))


def main() -> None:
    from pyspark.sql import functions as F

    from idhub_spark.operators.dedup_index import (
        minhash_index_append,
        minhash_index_compact,
        minhash_index_delete,
        minhash_index_probe,
        minhash_index_write,
    )
    from idhub_spark.session import get_spark

    scales = {
        "tiny": [("S", 20_000)],  # smoke-test of the harness itself
        "small": [("XXL", 2_000_000)],
        "big": [("XXXL", 20_000_000)],
    }
    picked = sys.argv[1:] or ["small", "big"]
    spark = get_spark()
    audit_root = os.path.join(ROOT, "r14")
    shutil.rmtree(audit_root, ignore_errors=True)
    os.makedirs(audit_root, exist_ok=True)

    def region(base, size):
        """Fresh ids for one (route, size) cell — text is a function
        of the id, so every region is genuinely new documents."""
        return synth_docs(spark, size, offset=base + size * 3)

    def copies(src_docs, n):
        return src_docs.limit(n).select(
            (F.col("doc_id") + COPY_BASE).alias("doc_id"), "text"
        )

    for sc in picked:
        for tag, n_hist in scales[sc]:
            idx = os.path.join(audit_root, f"mh_lsm_{tag}")
            folded = os.path.join(audit_root, f"mh_fold_{tag}")

            w_build, _ = timed(
                lambda: minhash_index_write(
                    synth_docs(spark, n_hist),
                    idx,
                    n_hashes=16,
                    bands=4,
                    pb_buckets=PB,
                    db_buckets=DB,
                ),
                reps=1,
            )
            print(f"{tag} build: history={n_hist} wall={w_build:.1f}s", flush=True)

            # append cost vs route, per batch size
            for size in BATCH_SIZES:
                f0 = live_files(idx)
                w_dir, _ = timed(
                    lambda: minhash_index_append(
                        region(DIRECT_BASE, size), idx, mode="direct"
                    ),
                    reps=1,
                )
                dir_created = live_files(idx) - f0
                d0, f1 = delta_files(idx), live_files(idx)
                w_del, _ = timed(
                    lambda: minhash_index_append(
                        region(DELTA_BASE, size), idx, mode="delta"
                    ),
                    reps=1,
                )
                delta_created = delta_files(idx) - d0
                assert live_files(idx) == f1  # delta never touches live
                print(
                    f"{tag} append size={size}: direct {w_dir:.1f}s "
                    f"(+{dir_created} files) vs delta {w_del:.1f}s "
                    f"(+{delta_created} files)",
                    flush=True,
                )

            # probe parity + walls, delta'd tree vs folded copy
            probe_batch = (
                copies(synth_docs(spark, n_hist), 50)
                .unionByName(copies(region(DIRECT_BASE, 1_000), 25))
                .unionByName(copies(region(DELTA_BASE, 1_000), 25))
            )

            def found(path):
                return (
                    minhash_index_probe(
                        spark, path, probe_batch, include_batch_pairs=False
                    )
                    .filter(F.col("est_jaccard") == 1.0)
                    .filter(F.col("dup_id") == F.col("new_id") - COPY_BASE)
                    .count()
                )

            w_probe, n_found = timed(lambda: found(idx))
            w_comp, (src_f, out_f) = timed(
                lambda: minhash_index_compact(spark, idx, folded), reps=1
            )
            assert not os.path.isdir(f"{folded}/delta")  # the fold
            w_probe_f, n_found_f = timed(lambda: found(folded))

            # delete across layers: 10 history + 10 delta-resident
            victims = list(range(100, 110)) + [
                r.doc_id
                for r in region(DELTA_BASE, 1_000)
                .limit(10)
                .select("doc_id")
                .collect()
            ]
            w_del2, rep = timed(
                lambda: minhash_index_delete(spark, idx, victims), reps=1
            )
            print(
                f"{tag} lifecycle: probe(delta'd={w_probe:.2f}s "
                f"folded={w_probe_f:.2f}s found={n_found}/{n_found_f} of 100) "
                f"compact(wall={w_comp:.1f}s {src_f}->{out_f} files) "
                f"delete(wall={w_del2:.2f}s rows={rep['rows_deleted']} "
                f"delta_rows={rep['delta_rows_deleted']})",
                flush=True,
            )
            shutil.rmtree(idx, ignore_errors=True)
            shutil.rmtree(folded, ignore_errors=True)

    shutil.rmtree(audit_root, ignore_errors=True)


if __name__ == "__main__":
    main()
