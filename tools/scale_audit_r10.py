"""Round-10 scale audit: extend the 10x methodology (see
tools/scale_audit.py, docs/scale_audit_r9.md) to the round-9/10
operators, plus the two standing skew probes.

Measured paths (r9 VERDICT ask #6 + stretch #8):

  heavy_hitters_zipf     exact heavy hitters on a Zipf-ish power-law
                         key distribution (the realistic shape — r9
                         measured uniform keys only), S=500k vs
                         XL=5M rows, AND the new sketch-merge bound:
                         pre-merge candidate rows vs merged (<= k)
                         at 32 and 256 partitions
  blocked_fuzzy_linkage  block-size distribution growth (the
                         quadratic hazard lives INSIDE a block):
                         max/p99 block size and verify-pair count,
                         S vs XL customer tables
  tfidf_keywords         wall S vs XL on the audit corpus — the
                         window-rewrite (no persist) payoff curve
  replica_divergence     wall S vs XL — one aggregation scan per
                         replica, expected ~linear
  pointer_join_skew      the CC pointer-doubling join keyed on comp
                         VALUES (skewed toward a giant component),
                         run standalone at 2M labels / 95% one
                         component with AQE skew-join thresholds
                         lowered to harness bytes; reports whether
                         AQEShuffleRead split the hot partition

Usage: python tools/scale_audit_r10.py   (rows to stdout; table goes
into docs/scale_audit_r10.md). Walls are min-of-2 in one session.
Audit tooling only — no engine code paths change.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_audit import ROOT, gen_customer, gen_documents, timed  # noqa: E402


def main() -> None:
    from pyspark.sql import functions as F

    import idhub_spark.queries  # noqa: F401
    from idhub_spark.operators.sketches import (
        exact_heavy_hitters,
        merged_candidates,
        misra_gries_candidates,
    )
    from idhub_spark.plans.identity_q import blocked_fuzzy_linkage
    from idhub_spark.plans.io_q import replica_divergence
    from idhub_spark.plans.text_q import tfidf_keywords
    from idhub_spark.session import get_spark

    scales = {"S": 5_000, "XL": 50_000}
    shutil.rmtree(ROOT, ignore_errors=True)
    for tag, n in scales.items():
        d = os.path.join(ROOT, tag)
        os.makedirs(d, exist_ok=True)
        gen_documents(n, seed=42, path=os.path.join(d, "documents.parquet"))
        gen_customer(n * 3, seed=43, path=os.path.join(d, "customer.parquet"))
        print(f"generated {tag}: {n} docs, {n * 3} customers -> {d}", flush=True)

    spark = get_spark()

    # --- 1. heavy hitters under Zipf ------------------------------------
    # power-law keys via inverse-transform: key = floor(u^-1.2), capped.
    # ~58% of rows land on key 1, a long tail of rare keys — the hot-user/
    # hot-URL shape. t chosen > N/(k+1) at both scales (k=2048).
    for tag, n_rows in {"S": 500_000, "XL": 5_000_000}.items():
        df = (
            spark.range(n_rows)
            .select(
                F.least(
                    F.floor(F.pow(F.rand(seed=11), -1.2)), F.lit(10_000_000)
                ).alias("k")
            )
            .repartition(32)
            .persist()
        )
        df.count()
        t = max(2_500, n_rows // 100)  # >= N/(k+1); keeps ~dozens of hitters
        w_hh, got = timed(
            lambda: {
                r.k: r.n
                for r in exact_heavy_hitters(
                    df, "k", min_count=t, k=2048, total=n_rows
                ).collect()
            }
        )
        w_naive, exp = timed(
            lambda: {
                r.k: r.n
                for r in df.groupBy("k")
                .agg(F.count(F.lit(1)).alias("n"))
                .filter(F.col("n") >= t)
                .collect()
            }
        )
        assert got == exp, "heavy hitters diverged from naive groupBy"
        for parts in (32, 256):
            dfp = df.repartition(parts)
            pre = misra_gries_candidates(dfp, "k", 2048).count()
            merged = merged_candidates(dfp, "k", 2048).count()
            print(
                f"{tag} heavy_hitters_zipf parts={parts}: pre_merge={pre} "
                f"merged={merged} (bound k=2048)",
                flush=True,
            )
        print(
            f"{tag} heavy_hitters_zipf: rows={n_rows} t={t} hitters={len(got)} "
            f"== naive ✓ wall={w_hh:.2f}s naive={w_naive:.2f}s",
            flush=True,
        )
        df.unpersist()

    # --- 2/3/4. blocked linkage blocks, tfidf, replica checksums --------
    for tag in scales:
        d = os.path.join(ROOT, tag)
        # block-size distribution of the a-side blocking key
        cust = spark.read.parquet(os.path.join(d, "customer.parquet"))
        nid6 = F.substring(
            F.md5(F.concat(F.lit("nid"), F.col("c_custkey").cast("string"))), 1, 6
        )
        bs = cust.select(nid6.alias("b")).groupBy("b").count()
        row = bs.agg(
            F.count(F.lit(1)).alias("n_blocks"),
            F.max("count").alias("mx"),
            F.expr("percentile(count, 0.99)").alias("p99"),
            F.avg("count").alias("avg"),
        ).collect()[0]
        w_bl, n_pairs = timed(lambda: blocked_fuzzy_linkage(spark, d).count())
        print(
            f"{tag} blocked_fuzzy_linkage: blocks={row.n_blocks} "
            f"max_block={row.mx} p99={row.p99:.1f} avg={row.avg:.2f} "
            f"links={n_pairs} wall={w_bl:.2f}s",
            flush=True,
        )
        w_tf, n_tf = timed(lambda: tfidf_keywords(spark, d).count())
        print(f"{tag} tfidf_keywords: rows={n_tf} wall={w_tf:.2f}s", flush=True)
        w_rd, n_div = timed(
            lambda: replica_divergence(spark, d)
            .filter(F.col("diverged"))
            .count()
        )
        print(
            f"{tag} replica_divergence: diverged_buckets={n_div} "
            f"wall={w_rd:.2f}s",
            flush=True,
        )

    # --- 5. pointer-join skew probe (stretch #8) ------------------------
    # iteration-2 state of a giant component: labels (r, comp) for 2M
    # records, 95% in component 0; prop mirrors it. The pointer join
    # probes labels on the comp VALUE — maximally hot on the probe side.
    # Three observations, in order:
    #   natural  — with runtime stats, Catalyst broadcasts the labels
    #              side (64MB session threshold): BroadcastHashJoin has
    #              NO shuffle on comp, so the skew is moot whenever
    #              labels fit the broadcast budget.
    #   default  — broadcast disabled (the big-labels case), default
    #              256MB skew threshold: the ~30MB hot partition is
    #              below the bar, ONE task absorbs the giant component.
    #   lowered  — threshold at harness bytes (1MB): AQE splits it —
    #              SortMergeJoin(skew=true) / 'AQEShuffleRead coalesced
    #              and skewed' appear in the final plan. At production
    #              bytes a giant component clears 256MB on its own.
    # Plan inspection needs the SAME DataFrame object to be collected
    # (each action builds a fresh QueryExecution; the join must also be
    # stage-top — a partial aggregate above it masked the split).
    n = 2_000_000
    labels = spark.range(n).select(
        F.col("id").alias("_c"),
        F.when(F.rand(seed=5) < 0.95, F.lit(0))
        .otherwise(F.col("id"))
        .alias("_ccomp"),
    )
    prop = spark.range(n).select(
        F.col("id").alias("r"),
        F.when(F.rand(seed=6) < 0.95, F.lit(0)).otherwise(F.col("id")).alias("comp"),
    )

    def pointer_join():
        return (
            prop.join(labels, prop["comp"] == F.col("_c"), "left")
            .select(
                "r", F.least(F.col("comp"), F.coalesce("_ccomp", "comp")).alias("c2")
            )
            .filter("c2 < 0")  # empty result: executes the join, collects nothing
        )

    import re

    for tag2 in ("natural", "default", "lowered"):
        if tag2 != "natural":
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        if tag2 == "lowered":
            spark.conf.set(
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1MB"
            )
            spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1MB")
        q = pointer_join()
        w_pj, _ = timed(lambda: q.collect())
        plan = q._jdf.queryExecution().executedPlan().toString()
        join = re.search(r"(BroadcastHashJoin|SortMergeJoin)(\(skew=true\))?", plan)
        print(
            f"pointer_join_skew {tag2}: wall={w_pj:.2f}s "
            f"join={join.group(0) if join else '?'} "
            f"aqe_skew_split={'YES' if 'skewed' in plan else 'no'}",
            flush=True,
        )
    for c in (
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.autoBroadcastJoinThreshold",
    ):
        spark.conf.unset(c)


if __name__ == "__main__":
    main()
