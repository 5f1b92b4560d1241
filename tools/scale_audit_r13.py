"""Round-13 scale audit (r12 VERDICT ask #4): dedup-index COMPACTION
and its effect on the probe/delete fixed costs.

The r12 audit established that the bucketed layout's probe cost is
file-count-dominated — a ~9 s fixed floor (4096+1024 partition dirs
to list, ~5 bounded jobs) that history size barely moves, with the
flat/bucketed crossover measured at ~20M docs. Compaction is the
lever that moves that crossover: every append lands one file per
touched partition, so a year of batch cadence is 10^4-10^5 small
files per table, and minhash_index_compact bin-packs each partition
directory (zero shuffle) while carrying _params.

Measured here, at 2M and 20M history docs (the crossover decade):

  build 50% of history, then append the rest in 8 batches — the
  APPEND-DEBRIS index (~9 files per touched partition);
  minhash_index_compact it to a sibling — the COMPACTED index; then
  on BOTH trees measure
    - probe wall (min-of-2, fixed 100-doc batch: 50 new + 50 planted
      exact copies) + found-count identity,
    - delete wall (fixed 20 victims, reps=1, runs last — it mutates),
  plus the compaction wall itself and the file counts before/after.

Usage: python tools/scale_audit_r13.py [small|big]  (rows to stdout;
table goes into docs/scale_audit_r13.md). Walls are min-of-2 in one
session unless the operation mutates state (reps=1). Audit tooling
only — no engine code paths change.
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
N_APPENDS = 8


def n_files(path):
    return (
        len(glob.glob(f"{path}/docs/**/*.parquet", recursive=True)),
        len(glob.glob(f"{path}/bands/**/*.parquet", recursive=True)),
    )


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
    audit_root = os.path.join(ROOT, "r13")
    shutil.rmtree(audit_root, ignore_errors=True)
    os.makedirs(audit_root, exist_ok=True)

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

    for sc in picked:
        for tag, n_hist in scales[sc]:
            debris = os.path.join(audit_root, f"mh_debris_{tag}")
            compacted = os.path.join(audit_root, f"mh_compacted_{tag}")

            # build half, append the rest in 8 batches -> ~9 files per
            # touched partition (one write + 8 promoted appends)
            half = n_hist // 2
            step = (n_hist - half) // N_APPENDS
            w_build, _ = timed(
                lambda: minhash_index_write(
                    synth_docs(spark, half),
                    debris,
                    n_hashes=16,
                    bands=4,
                    pb_buckets=PB,
                    db_buckets=DB,
                ),
                reps=1,
            )
            w_appends = 0.0
            for i in range(N_APPENDS):
                lo = half + i * step
                hi = n_hist if i == N_APPENDS - 1 else lo + step
                app = synth_docs(spark, hi).filter(F.col("doc_id") >= lo)
                w, _ = timed(
                    lambda: minhash_index_append(app, debris), reps=1
                )
                w_appends += w
            d_files = n_files(debris)

            w_comp, (src_f, out_f) = timed(
                lambda: minhash_index_compact(spark, debris, compacted),
                reps=1,
            )
            c_files = n_files(compacted)

            w_p_d, found_d = timed(lambda: probe_found(debris))
            w_p_c, found_c = timed(lambda: probe_found(compacted))

            victims = list(range(100, 120))
            w_del_d, rep_d = timed(
                lambda: minhash_index_delete(spark, debris, victims), reps=1
            )
            w_del_c, rep_c = timed(
                lambda: minhash_index_delete(spark, compacted, victims),
                reps=1,
            )
            print(
                f"{tag} dedup_compaction: history={n_hist} "
                f"build={w_build:.1f}s appends8={w_appends:.1f}s "
                f"debris_files(docs={d_files[0]} bands={d_files[1]}) "
                f"compact(wall={w_comp:.1f}s {src_f}->{out_f} files; "
                f"docs={c_files[0]} bands={c_files[1]}) "
                f"probe(debris={w_p_d:.2f}s compacted={w_p_c:.2f}s "
                f"found={found_d}/{found_c} of 50) "
                f"delete(debris={w_del_d:.2f}s compacted={w_del_c:.2f}s "
                f"rows={rep_d['rows_deleted']}/{rep_c['rows_deleted']} "
                f"parts={rep_d['docs_partitions_rewritten']}+"
                f"{rep_d['bands_partitions_rewritten']})",
                flush=True,
            )
            # reclaim disk between scales (20M history is ~10 GB)
            shutil.rmtree(debris, ignore_errors=True)
            shutil.rmtree(compacted, ignore_errors=True)

    shutil.rmtree(audit_root, ignore_errors=True)


if __name__ == "__main__":
    main()
