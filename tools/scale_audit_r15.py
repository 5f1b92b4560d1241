"""Round-15 scale audit (VERDICT r14 ask #3): the delta buffer's
PROBE TAX, measured to derive a numbers-backed FOLD CADENCE.

The delta side of every probe is a full read of N-files-for-N-buffered
-appends (row filter only, no partition pruning —
operators/dedup_index.py:_read_state_table): each buffered append adds
one file per state table, and the probe's two delta reads pay a
per-file listing + task term that grows linearly with N while the
pruned LIVE read stays flat at any history size. This audit measures
probe wall vs number of buffered appends at 2M (and optionally 20M)
history docs, splits out the delta term against the N=0 baseline,
finds where it crosses ~10 % of probe wall, and turns
docs/operations.md's "fold on the daily cadence" guidance into an
explicit threshold (fold when delta_files exceeds K — the counter
minhash_index_stats now exposes per table as delta_files/delta_rows).

Method per history size:
  build the bucketed (pb=4096/db=1024) index once; fix a 100-doc probe
  batch (copies of history docs, so probe work is constant across
  cells); measure the N=0 probe wall (min-of-3 — the tiny smoke run
  showed min-of-2 leaves +/-2 s noise that swamps a sub-second delta
  term); then grow the buffer through checkpoints N = 1, 8, 32, 128
  (plus 512 at the 2M scale, where the end-to-end tax first clears
  the noise floor) small (100-doc) delta appends, at each checkpoint
  recording probe wall (min-of-3), a DIRECT timing of the probe's two
  delta-side reads (spark.read.parquet over delta/docs + delta/bands,
  count — the isolated per-file term, clean of probe noise), delta
  file count and bytes (via minhash_index_stats — also exercising the
  new columns), and the probe's found-count (parity guard: planted
  copies stay at est exactly 1.0 regardless of buffer depth). Finally
  fold the deepest buffer (minhash_index_fold_delta) and re-probe:
  the fold must return the probe to ~the N=0 baseline.

Usage: python tools/scale_audit_r15.py [tiny|small|big]
(rows to stdout; table goes into docs/scale_audit_r15.md). Walls
min-of-2 in one session unless the operation mutates state (reps=1).
Audit tooling only — no engine code paths change.
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
# cumulative buffered appends per scale; 512 only at 2M (the deep-
# buffer end-to-end confirmation — the slope itself is measured from
# the isolated delta scans, which are history-invariant)
CHECKPOINTS = {"S": [1, 8, 32, 128], "XXL": [1, 8, 32, 128, 512],
               "XXXL": [1, 8, 32, 128]}
APPEND_DOCS = 100
DELTA_BASE = 200_000_000
COPY_BASE = 900_000_000


def delta_bytes(path):
    return sum(
        os.path.getsize(f) for f in glob.glob(f"{path}/delta/*/*.parquet")
    )


def main() -> None:
    from pyspark.sql import functions as F

    from idhub_spark.operators.dedup_index import (
        minhash_index_append,
        minhash_index_fold_delta,
        minhash_index_probe,
        minhash_index_stats,
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
    audit_root = os.path.join(ROOT, "r15")
    shutil.rmtree(audit_root, ignore_errors=True)
    os.makedirs(audit_root, exist_ok=True)

    for sc in picked:
        for tag, n_hist in scales[sc]:
            idx = os.path.join(audit_root, f"mh_tax_{tag}")
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
            print(
                f"{tag} build: history={n_hist} wall={w_build:.1f}s",
                flush=True,
            )

            probe_batch = synth_docs(spark, n_hist).limit(100).select(
                (F.col("doc_id") + COPY_BASE).alias("doc_id"), "text"
            )

            def probe_found():
                return (
                    minhash_index_probe(
                        spark, idx, probe_batch, include_batch_pairs=False
                    )
                    .filter(F.col("est_jaccard") == 1.0)
                    .filter(F.col("dup_id") == F.col("new_id") - COPY_BASE)
                    .count()
                )

            def delta_scan():
                """The probe's delta-side term in isolation: one full
                read of each buffered table (same shape as
                _read_state_table's delta union — a row filter prunes
                bytes, not files, so count() is the honest proxy)."""
                n = 0
                for t in ("docs", "bands"):
                    p = f"{idx}/delta/{t}"
                    if os.path.isdir(p):
                        n += spark.read.parquet(p).count()
                return n

            w0, found0 = timed(probe_found, reps=3)
            print(
                f"{tag} probe N=0: wall={w0:.2f}s found={found0}/100",
                flush=True,
            )

            n_appended = 0
            for ckpt in CHECKPOINTS[tag]:
                while n_appended < ckpt:
                    batch = synth_docs(
                        spark,
                        APPEND_DOCS,
                        offset=DELTA_BASE + n_appended * APPEND_DOCS,
                    )
                    route = minhash_index_append(batch, idx, mode="delta")
                    assert route == "delta"
                    n_appended += 1
                st = {
                    r.tbl: r
                    for r in minhash_index_stats(spark, idx).collect()
                }
                dfiles = st["docs"].delta_files + st["bands"].delta_files
                drows = st["docs"].delta_rows + st["bands"].delta_rows
                dbytes = delta_bytes(idx)
                w, found = timed(probe_found, reps=3)
                w_scan, _ = timed(delta_scan, reps=3)
                tax = w - w0
                print(
                    f"{tag} probe N={ckpt}: wall={w:.2f}s "
                    f"tax={tax:+.2f}s ({100 * tax / w:.0f}% of wall) "
                    f"delta_scan={w_scan:.2f}s "
                    f"delta_files={dfiles} delta_rows={drows} "
                    f"delta_bytes={dbytes / 1024:.0f}KiB found={found}/100",
                    flush=True,
                )

            w_fold, rep = timed(
                lambda: minhash_index_fold_delta(spark, idx), reps=1
            )
            w_post, found_post = timed(probe_found)
            print(
                f"{tag} fold: wall={w_fold:.1f}s rows={rep['folded_rows']} "
                f"files={rep['files_written']}; post-fold probe "
                f"wall={w_post:.2f}s (baseline {w0:.2f}s) "
                f"found={found_post}/100",
                flush=True,
            )
            shutil.rmtree(idx, ignore_errors=True)

    shutil.rmtree(audit_root, ignore_errors=True)


if __name__ == "__main__":
    main()
