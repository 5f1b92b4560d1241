"""Round-9 scale audit: confirm the claimed linearity of the five
curve-bearing paths one order of magnitude above the bench scale.

The driver only ships sf0.001/0.01/0.1, so this generates a
self-similar corpus at TWO scales with the SAME seeded generator —
S (sf0.1-shaped: 5k docs / 15k customers) and XL (sf1-shaped: 50k
docs / 150k customers) — and measures each path at both. Linearity is
judged within the generator (same near-dup rate, same vocab, same
length distribution at both scales), which removes the
corpus-composition confound a raw driver-sf0.1-vs-synthetic-sf1
comparison would carry. The generator mirrors the driver corpus's
measured shape: 31-word vocabulary, 10-100 words/doc uniform, ~25%
of docs are near-dup copies of an earlier doc with ~5% of words
resampled.

Paths audited (r8 VERDICT ask #4):
  minhash_lsh_dedup        candidates + verified pairs + wall
  dedup_cluster_canonical  clusters + max size + wall
  simhash_hamming_pairs    pairs + wall
  leakage_safe_split       split sizes + straddle invariant + wall
  partition_pruned_upsert  buckets touched/rewritten + wall

Usage: python tools/scale_audit.py  (writes rows to stdout; transfer
the table into docs/scale_audit_r9.md). Wall figures are min-of-2 in
one session (JIT warmup absorbed by run 1, same policy as bench.py).
Everything here is audit tooling — no engine code paths change.
"""

from __future__ import annotations

import os
import random
import shutil
import sys
import time

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "en", "en", "zh", "fr", "es", "de"]  # en-heavy like the driver
ROOT = "/tmp/idhub_scale_audit"


def gen_documents(n_docs: int, seed: int, path: str) -> None:
    rng = random.Random(seed)
    texts: list[str] = []
    rows_lang, rows_src = [], []
    for i in range(n_docs):
        if i > 0 and rng.random() < 0.25:
            # near-dup of a random earlier doc: resample ~5% of words
            base = texts[rng.randrange(len(texts))].split(" ")
            words = [w if rng.random() >= 0.05 else rng.choice(VOCAB) for w in base]
        else:
            words = [rng.choice(VOCAB) for _ in range(rng.randint(10, 100))]
        texts.append(" ".join(words))
        rows_lang.append(rng.choice(LANGS))
        rows_src.append(f"src{i % 20}")
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(rows_lang),
            "source": pa.array(rows_src),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, path)


def gen_customer(n: int, seed: int, path: str) -> None:
    rng = random.Random(seed)
    tbl = pa.table(
        {
            "c_custkey": pa.array(range(1, n + 1), pa.int64()),
            "c_name": pa.array([f"Customer#{k:09d}" for k in range(1, n + 1)]),
            "c_nationkey": pa.array([rng.randrange(25) for _ in range(n)], pa.int32()),
            "c_acctbal": pa.array(
                [round(rng.uniform(-999.99, 9999.99), 2) for _ in range(n)]
            ),
            "c_mktsegment": pa.array(
                [rng.choice(["BUILDING", "AUTOMOBILE", "MACHINERY"]) for _ in range(n)]
            ),
        }
    )
    pq.write_table(tbl, path)


def timed(fn, reps: int = 2):
    best, out = None, None
    for _ in range(reps):
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best, out


def main() -> None:
    scales = {"S": 5_000, "XL": 50_000}
    shutil.rmtree(ROOT, ignore_errors=True)
    for tag, n in scales.items():
        d = os.path.join(ROOT, tag)
        os.makedirs(d, exist_ok=True)
        gen_documents(n, seed=42, path=os.path.join(d, "documents.parquet"))
        gen_customer(n * 3, seed=43, path=os.path.join(d, "customer.parquet"))
        print(f"generated {tag}: {n} docs, {n * 3} customers -> {d}", flush=True)

    import idhub_spark.queries  # noqa: F401  (registry first: avoids the plans circular import)
    from idhub_spark.session import get_spark, load_tables
    from idhub_spark.plans import dedup_q
    from idhub_spark.plans.merge_into_q import _run_upsert

    spark = get_spark()
    for tag in scales:
        d = os.path.join(ROOT, tag)
        t = load_tables(spark, d, "documents")
        corpus = dedup_q._corpus(t)

        # --- minhash: candidate vs verified counts + wall -----------
        sh = dedup_q._shingles(corpus)
        n_cand = dedup_q._lsh_candidates(
            sh, n_hashes=dedup_q._N_HASHES, bands=2
        ).count()
        w_mh, pairs = timed(
            lambda: dedup_q.minhash_lsh_pairs(corpus).count()
        )
        print(f"{tag} minhash_lsh: candidates={n_cand} verified={pairs} "
              f"wall={w_mh:.2f}s", flush=True)

        # --- cluster canonicalization -------------------------------
        def _cc():
            df = dedup_q.dedup_cluster_canonical(spark, d)
            row = df.agg(
                {"n_docs": "max", "keeper": "count"}
            ).collect()[0]
            return row["count(keeper)"], row["max(n_docs)"]

        w_cc, (n_clusters, max_cluster) = timed(_cc)
        print(f"{tag} dedup_cluster_canonical: clusters={n_clusters} "
              f"max_cluster={max_cluster} wall={w_cc:.2f}s", flush=True)

        # --- simhash hamming pairs ----------------------------------
        w_sh, n_sh = timed(
            lambda: dedup_q.simhash_hamming_pairs(spark, d).count()
        )
        print(f"{tag} simhash_hamming_pairs: pairs={n_sh} wall={w_sh:.2f}s",
              flush=True)

        # --- leakage-safe split + straddle invariant ----------------
        def _split():
            split = dedup_q.leakage_safe_split(spark, d)
            prs = dedup_q.minhash_lsh_pairs(corpus).select("doc_a", "doc_b")
            sides = split.select("doc_id", "split")
            straddle = (
                prs.join(
                    sides.withColumnRenamed("doc_id", "doc_a")
                    .withColumnRenamed("split", "sa"), "doc_a")
                .join(
                    sides.withColumnRenamed("doc_id", "doc_b")
                    .withColumnRenamed("split", "sb"), "doc_b")
                .filter("sa <> sb")
                .count()
            )
            counts = {
                r[0]: r[1] for r in split.groupBy("split").count().collect()
            }
            return straddle, counts

        w_sp, (straddle, counts) = timed(_split)
        print(f"{tag} leakage_safe_split: straddling_pairs={straddle} "
              f"sizes={counts} wall={w_sp:.2f}s", flush=True)

        # --- pruned upsert ------------------------------------------
        def _ups():
            _, stats = _run_upsert(spark, d, force=True)
            return stats

        w_up, stats = timed(_ups)
        print(f"{tag} partition_pruned_upsert: total={stats.n_buckets_total} "
              f"touched={stats.n_buckets_touched} "
              f"rewritten={stats.n_buckets_rewritten} "
              f"rows_rewritten={stats.rows_rewritten} wall={w_up:.2f}s",
              flush=True)


if __name__ == "__main__":
    main()
