"""Incremental MinHash dedup index: a new batch dedupes against
persisted corpus history without recomputing it (operators/
dedup_index.py). Exact copies are ALWAYS found (identical signature
=> every band matches, est_jaccard == 1.0 deterministically);
near-dups clear the banding S-curve recall; appends are append-only;
probe parameters come from the index itself."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from idhub_spark.operators.dedup_index import (
    minhash_index_append,
    minhash_index_probe,
    minhash_index_write,
)

SF = os.environ.get("IDHUB_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.read.parquet(os.path.join(SF, "documents.parquet"))
        .select("doc_id", "text")
        .filter(F.instr("text", " ") > 0)
    )


def _exact_copies(docs, mod, offset):
    return docs.filter(F.col("doc_id") % mod == 0).select(
        (F.col("doc_id") + offset).alias("doc_id"), "text"
    )


def _trimmed_copies(docs, mod, offset):
    """Near-dups: drop the first word — Jaccard ~ (n_sh-3)/n_sh."""
    return docs.filter(F.col("doc_id") % mod == 0).select(
        (F.col("doc_id") + offset).alias("doc_id"),
        F.expr("substr(text, instr(text, ' ') + 1)").alias("text"),
    )


def test_probe_finds_history_and_batch_dups(spark, docs, tmp_path):
    path = str(tmp_path / "mh_idx")
    minhash_index_write(docs, path, n_hashes=16, bands=4)

    exact = _exact_copies(docs, 7, 100_000)
    near = _trimmed_copies(docs, 5, 200_000)
    # two in-batch exact copies of one history doc: a batch pair too
    twin = _exact_copies(docs.filter(F.col("doc_id") == 7), 1, 300_000)
    batch = exact.unionByName(near).unionByName(twin)

    got = minhash_index_probe(spark, path, batch, threshold_est=0.5)
    rows = got.collect()
    hist = {(r.new_id, r.dup_id) for r in rows if r.dup_source == "history"}
    bat = {(r.new_id, r.dup_id) for r in rows if r.dup_source == "batch"}

    # every exact copy matches its source with est_jaccard == 1.0
    exact_ids = [r.doc_id for r in exact.select("doc_id").collect()]
    for nid in exact_ids:
        assert (nid, nid - 100_000) in hist
    ones = {
        (r.new_id, r.dup_id)
        for r in rows
        if r.dup_source == "history" and r.est_jaccard == 1.0
    }
    assert all((nid, nid - 100_000) in ones for nid in exact_ids)

    # near-dups: banding recall over the planted prefix-trimmed copies
    near_ids = [r.doc_id for r in near.select("doc_id").collect()]
    found = sum((nid, nid - 200_000) in hist for nid in near_ids)
    assert found / len(near_ids) >= 0.8, f"near-dup recall {found}/{len(near_ids)}"

    # the in-batch twin of doc 7 pairs with BOTH history doc 7 and the
    # batch exact copy 7+100000 (batch pairs ordered new_id < dup_id)
    assert (300_007, 7) in hist
    assert (100_007, 300_007) in bat or (300_007, 100_007) in bat

    # no history-history pairs ever (old ids only appear as dup_id)
    new_ids = {r.doc_id for r in batch.select("doc_id").collect()}
    assert all(p[0] in new_ids for p in hist | bat)


def test_append_only_and_param_discipline(spark, docs, tmp_path):
    path = str(tmp_path / "mh_idx2")
    half_a = docs.filter(F.col("doc_id") % 2 == 0)
    half_b = docs.filter(F.col("doc_id") % 2 == 1)
    minhash_index_write(half_a, path, n_hashes=8, bands=2)
    before = {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{path}/docs/*.parquet")
        + glob.glob(f"{path}/bands/*.parquet")
    }
    minhash_index_append(half_b, path)
    after = {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{path}/docs/*.parquet")
        + glob.glob(f"{path}/bands/*.parquet")
    }
    assert set(before) < set(after)  # new files appeared...
    assert all(after[f] == before[f] for f in before)  # ...none rewritten
    assert (
        spark.read.parquet(f"{path}/docs").count() == docs.count()
    )

    # a probe against the appended history finds an appended doc's copy
    # (parameters read from _params — the caller never restates them)
    odd_id = half_b.select(F.min("doc_id")).first()[0]
    probe = _exact_copies(docs.filter(F.col("doc_id") == odd_id), 1, 900_000)
    got = minhash_index_probe(spark, path, probe, include_batch_pairs=False)
    pairs = {(r.new_id, r.dup_id, r.est_jaccard) for r in got.collect()}
    assert (odd_id + 900_000, odd_id, 1.0) in pairs

    # _params rides inside the index, invisible to data reads
    assert spark.read.parquet(f"{path}/_params").collect()[0].n_hashes == 8
    assert "n_hashes" not in spark.read.parquet(f"{path}/docs").columns
