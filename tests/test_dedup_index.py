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


def _state_files(path):
    return glob.glob(f"{path}/docs/**/*.parquet", recursive=True) + glob.glob(
        f"{path}/bands/**/*.parquet", recursive=True
    )


def test_append_only_and_param_discipline(spark, docs, tmp_path):
    path = str(tmp_path / "mh_idx2")
    half_a = docs.filter(F.col("doc_id") % 2 == 0)
    half_b = docs.filter(F.col("doc_id") % 2 == 1)
    minhash_index_write(half_a, path, n_hashes=8, bands=2)
    before = {f: os.path.getmtime(f) for f in _state_files(path)}
    # direct route pinned: this test asserts the partition-rename
    # mechanics (the auto router would buffer a batch this small into
    # the delta — covered by the delta tests below)
    assert minhash_index_append(half_b, path, mode="direct") == "direct"
    after = {f: os.path.getmtime(f) for f in _state_files(path)}
    assert set(before) < set(after)  # new files appeared...
    assert all(after[f] == before[f] for f in before)  # ...none rewritten
    assert not os.path.isdir(f"{path}/_append_staging")  # staging cleaned
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


def test_bucketed_probe_matches_flat_and_prunes(spark, docs, tmp_path):
    """The partitioned (pb/db) layout is a pure LAYOUT change: probe
    results must be byte-identical to the flat index (pruning only
    removes partitions that cannot join), and the executed plans of
    both history reads must show file-level PartitionFilters — the
    scan ∝ batch-buckets contract."""
    flat = str(tmp_path / "mh_flat")
    buck = str(tmp_path / "mh_buck")
    minhash_index_write(
        docs, flat, n_hashes=16, bands=4, pb_buckets=0, db_buckets=0
    )
    minhash_index_write(
        docs, buck, n_hashes=16, bands=4, pb_buckets=32, db_buckets=32
    )

    batch = _exact_copies(docs, 11, 100_000).unionByName(
        _trimmed_copies(docs, 13, 200_000)
    )
    got_flat = minhash_index_probe(spark, flat, batch, threshold_est=0.5)
    got_buck = minhash_index_probe(spark, buck, batch, threshold_est=0.5)
    rows_flat = sorted(map(tuple, got_flat.collect()))
    rows_buck = sorted(map(tuple, got_buck.collect()))
    assert rows_flat == rows_buck and rows_buck

    # the docs-side db pruning is visible in the probe's own executed
    # plan; the bands-side pb pruning runs inside the candidate
    # checkpoint job (test_probe_reads_only_batch_band_partitions pins
    # it on a pb-only index where the scan stays in the main plan)
    plan = got_buck._jdf.queryExecution().executedPlan().toString()
    import re

    pf = re.findall(r"PartitionFilters: \[([^\]]+)\]", plan)
    assert any("db" in f for f in pf), plan[:3000]
    # the flat plan must NOT carry partition filters (nothing to prune)
    plan_flat = got_flat._jdf.queryExecution().executedPlan().toString()
    assert not re.findall(r"PartitionFilters: \[[^\]]*(?:pb|db)[^\]]*\]", plan_flat)


def test_probe_reads_only_batch_band_partitions(spark, docs, tmp_path):
    """File-level pruning measured from the scan itself: a one-band-key
    probe batch must read at most its touched pb partitions of the
    band table, not all of them (the linear band-scan term the
    bucketed layout exists to remove)."""
    path = str(tmp_path / "mh_pr")
    # db_buckets=0 keeps the bands scan in the probe's main plan (with
    # doc pruning on, the candidate stage runs inside a checkpoint job
    # whose plan isn't attached to the returned frame)
    minhash_index_write(
        docs, path, n_hashes=16, bands=4, pb_buckets=32, db_buckets=0
    )
    n_part_total = len(glob.glob(f"{path}/bands/pb=*"))
    assert n_part_total > 8  # corpus populates most partitions

    one = _exact_copies(docs.filter(F.col("doc_id") == 7), 1, 500_000)
    got = minhash_index_probe(
        spark, path, one, threshold_est=0.5, include_batch_pairs=False
    )
    assert got.count() >= 1  # the planted copy is found
    plan = got._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"pb#\d+ (?:IN|INSET) \(?([0-9, ]+)\)?", plan)
    assert m, plan[:3000]
    n_probed = len(m.group(1).split(","))
    # one doc has at most `bands` distinct band keys -> <= 4 partitions
    assert n_probed <= 4 < n_part_total


def test_append_crash_protocol(spark, docs, tmp_path):
    """Uncommitted staging (crash before the marker) is discarded; a
    committed staging (crash during the rename-in) is promoted by the
    NEXT append — rows restored, never duplicated."""
    import pathlib

    from idhub_spark.operators.dedup_index import (
        _COMMITTED,
        _STAGING,
        _doc_state,
        _load_params,
        _tables,
        _write_table,
    )

    path = str(tmp_path / "mh_crash")
    base = docs.filter(F.col("doc_id") % 3 == 0)
    b1 = docs.filter(F.col("doc_id") % 3 == 1)
    b2 = docs.filter(F.col("doc_id") % 3 == 2)
    minhash_index_write(base, path, n_hashes=8, bands=2)

    # (a) crash BEFORE the marker: junk staging without _COMMITTED
    junk = pathlib.Path(path) / _STAGING / "docs" / "db=0"
    junk.mkdir(parents=True)
    (junk / "junk.parquet").write_bytes(b"xx")
    minhash_index_append(b1, path, mode="direct")
    assert not os.path.isdir(f"{path}/{_STAGING}")
    n_after_b1 = spark.read.parquet(f"{path}/docs").count()
    assert n_after_b1 == base.count() + b1.count()  # junk discarded

    # (b) crash AFTER the marker, before promotion: fabricate b2's
    # staging exactly as the real append would, with the marker, but
    # never promote — the next (empty-batch) append must resume it
    n_hashes, bands, pb_b, db_b = _load_params(spark, path)
    staging = f"{path}/{_STAGING}"
    state = _doc_state(b2, n_hashes=n_hashes, id_col="doc_id", text_col="text")
    docs_df, bands_df = _tables(
        state, n_hashes=n_hashes, bands=bands, pb_buckets=pb_b, db_buckets=db_b
    )
    _write_table(docs_df, f"{staging}/docs", "db" if db_b else None)
    _write_table(bands_df, f"{staging}/bands", "pb" if pb_b else None)
    pathlib.Path(staging, _COMMITTED).touch()

    empty = b2.limit(0)
    minhash_index_append(empty, path)  # resumes b2's staged batch
    assert not os.path.isdir(staging)
    assert (
        spark.read.parquet(f"{path}/docs").count()
        == base.count() + b1.count() + b2.count()
    )
    # no duplicates: every doc_id appears exactly once
    dup = (
        spark.read.parquet(f"{path}/docs")
        .groupBy("doc_id")
        .count()
        .filter("count > 1")
        .count()
    )
    assert dup == 0
    # and the resumed rows are probe-visible (an exact copy of a b2 doc)
    b2_id = b2.select(F.min("doc_id")).first()[0]
    probe = _exact_copies(docs.filter(F.col("doc_id") == b2_id), 1, 700_000)
    got = minhash_index_probe(spark, path, probe, include_batch_pairs=False)
    assert (b2_id + 700_000, b2_id, 1.0, "history") in {
        tuple(r) for r in got.collect()
    }


def test_minhash_index_stats(spark, docs, tmp_path):
    """The dedup index's health report: per-table rows/files/partition
    counts and the hot-band-bucket size (the candidate-join straggler
    signal). Planted: 5 exact copies of one doc collapse onto the same
    band keys, so the hottest (band, bkey) bucket must hold >= 6 docs."""
    from idhub_spark.operators.dedup_index import (
        minhash_index_stats,
        minhash_index_write,
    )

    path = str(tmp_path / "mh_stats")
    one = docs.filter(F.col("doc_id") == docs.select(F.min("doc_id")).first()[0])
    copies = [
        one.select((F.col("doc_id") + 1000 + i).alias("doc_id"), "text")
        for i in range(5)
    ]
    corpus = docs
    for c in copies:
        corpus = corpus.unionByName(c)
    minhash_index_write(corpus, path, n_hashes=16, bands=4, pb_buckets=16)

    st = {r.tbl: r for r in minhash_index_stats(spark, path).collect()}
    n = corpus.count()
    assert st["docs"].n_rows == n
    assert st["bands"].n_rows == 4 * n
    assert st["bands"].n_partitions <= 16 and st["bands"].n_partitions > 1
    assert st["docs"].n_partitions > 1  # db layout present (default 64)
    assert st["bands"].hot_bucket_rows >= 6  # the planted hot bucket
    assert st["docs"].hot_bucket_rows is None
    assert st["docs"].n_files >= st["docs"].n_partitions

    # flat layout: no partitions, stats still well-formed
    flat = str(tmp_path / "mh_stats_flat")
    minhash_index_write(
        corpus, flat, n_hashes=8, bands=2, pb_buckets=0, db_buckets=0
    )
    st2 = {r.tbl: r for r in minhash_index_stats(spark, flat).collect()}
    assert st2["docs"].n_partitions == 0 and st2["bands"].n_partitions == 0
    assert st2["bands"].n_rows == 2 * n


def test_minhash_index_delete(spark, docs, tmp_path):
    """Retraction: deleted docs vanish from BOTH state tables, their
    exact copies stop probing as duplicates, untouched partitions'
    files are never rewritten, and the flat layout deletes correctly
    too (whole-table rewrite)."""
    from idhub_spark.operators.dedup_index import minhash_index_delete

    path = str(tmp_path / "mh_del")
    minhash_index_write(docs, path, n_hashes=16, bands=4, pb_buckets=16,
                        db_buckets=16)
    n0 = docs.count()
    victims = [r.doc_id for r in docs.limit(3).collect()]
    survivors_probe = docs.filter(~F.col("doc_id").isin(victims))
    keep_id = survivors_probe.select(F.min("doc_id")).first()[0]

    before = {f: os.path.getmtime(f) for f in _state_files(path)}
    rep = minhash_index_delete(spark, path, victims)
    assert rep["rows_deleted"] == 3
    assert 0 < rep["docs_partitions_rewritten"] <= 16
    assert 0 < rep["bands_partitions_rewritten"] <= 16
    assert not os.path.isdir(f"{path}/_delete_staging")

    post_docs = spark.read.parquet(f"{path}/docs")
    post_bands = spark.read.parquet(f"{path}/bands")
    assert post_docs.count() == n0 - 3
    assert post_docs.filter(F.col("doc_id").isin(victims)).count() == 0
    assert post_bands.filter(F.col("doc_id").isin(victims)).count() == 0

    # only touched partitions rewritten: every file in an untouched
    # partition dir keeps its mtime
    after = {f: os.path.getmtime(f) for f in _state_files(path)}
    untouched = [
        f for f in before
        if f in after and after[f] == before[f]
    ]
    assert untouched  # some partitions were provably left alone

    # probe semantics: no pair may point at a deleted doc (the corpus
    # plants duplicate texts, so a ghost copy can legitimately still
    # match a SURVIVING doc with the same text — only pairs to the
    # victims themselves must vanish)
    ghost = _exact_copies(docs.filter(F.col("doc_id") == victims[0]), 1, 800_000)
    got_ghost = minhash_index_probe(
        spark, path, ghost, include_batch_pairs=False
    ).collect()
    assert not any(r.dup_id in victims for r in got_ghost)
    alive = _exact_copies(docs.filter(F.col("doc_id") == keep_id), 1, 800_000)
    got = minhash_index_probe(spark, path, alive, include_batch_pairs=False)
    assert (keep_id + 800_000, keep_id, 1.0, "history") in {
        tuple(r) for r in got.collect()
    }

    # flat layout: same semantics, whole-table rewrite
    flat = str(tmp_path / "mh_del_flat")
    minhash_index_write(docs, flat, n_hashes=8, bands=2, pb_buckets=0,
                        db_buckets=0)
    rep2 = minhash_index_delete(spark, flat, victims)
    assert rep2["rows_deleted"] == 3
    assert rep2["docs_partitions_rewritten"] == 0  # 0 = whole table
    assert spark.read.parquet(f"{flat}/docs").count() == n0 - 3
    assert (
        spark.read.parquet(f"{flat}/bands")
        .filter(F.col("doc_id").isin(victims)).count() == 0
    )


def test_minhash_index_compact(spark, docs, tmp_path):
    """Append debris bin-packs per partition directory and the
    compacted copy stays a COMPLETE index: _params carried (the
    generic compactor drops '_'-dirs), probe results byte-identical
    before/after."""
    from idhub_spark.operators.dedup_index import minhash_index_compact

    src = str(tmp_path / "mh_src")
    dst = str(tmp_path / "mh_dst")
    parts = [docs.filter(F.col("doc_id") % 3 == i) for i in range(3)]
    minhash_index_write(parts[0], src, n_hashes=8, bands=2, pb_buckets=8,
                        db_buckets=8)
    # one direct append (partition debris) + one delta append (buffered)
    # so the compaction exercises BOTH the bin-pack and the LSM fold
    assert minhash_index_append(parts[1], src, mode="direct") == "direct"
    assert minhash_index_append(parts[2], src) == "delta"  # auto routes small
    n_files_src = len(_state_files(src))

    batch = _exact_copies(docs, 9, 600_000)
    before = sorted(map(tuple, minhash_index_probe(
        spark, src, batch, include_batch_pairs=False).collect()))

    n_src, n_out = minhash_index_compact(
        spark, src, dst, target_bytes=64 * 1024 * 1024
    )
    assert n_src >= n_files_src and n_out < n_src  # debris glued
    after = sorted(map(tuple, minhash_index_probe(
        spark, dst, batch, include_batch_pairs=False).collect()))
    assert before == after and before
    # Hive layout survived (partition dirs present in the copy)
    assert glob.glob(f"{dst}/bands/pb=*") and glob.glob(f"{dst}/docs/db=*")
    # the LSM fold: the source's delta buffer is IN the compacted
    # layout (probe parity above proves it) and the copy has no delta
    assert os.path.isdir(f"{src}/delta")
    assert not os.path.isdir(f"{dst}/delta")


def test_delete_then_reingest_lifecycle(spark, docs, tmp_path):
    """Takedown reversal: a retracted doc_id can be re-accepted later
    via a normal append — the retraction removed every old state row,
    so re-ingestion leaves exactly one copy and probes resolve against
    it again."""
    from idhub_spark.operators.dedup_index import minhash_index_delete

    path = str(tmp_path / "mh_cycle")
    minhash_index_write(docs, path, n_hashes=16, bands=4, pb_buckets=16,
                        db_buckets=16)
    victim = int(docs.select(F.min("doc_id")).first()[0])
    minhash_index_delete(spark, path, [victim])
    assert (
        spark.read.parquet(f"{path}/docs")
        .filter(F.col("doc_id") == victim).count() == 0
    )

    # re-accept the same document (same id, same text) — the auto
    # router buffers a 1-doc batch into the delta; the LOGICAL table
    # (live ∪ delta) is what must hold exactly one copy
    from idhub_spark.operators.dedup_index import _read_state_table

    route = minhash_index_append(docs.filter(F.col("doc_id") == victim), path)
    assert route == "delta"
    post = _read_state_table(spark, path, "docs")
    assert post.filter(F.col("doc_id") == victim).count() == 1  # exactly one
    assert post.count() == docs.count()
    bands_rows = (
        _read_state_table(spark, path, "bands")
        .filter(F.col("doc_id") == victim).count()
    )
    assert bands_rows == 4  # one row per band, not doubled

    # and it's probe-visible again at est 1.0
    copy = _exact_copies(docs.filter(F.col("doc_id") == victim), 1, 750_000)
    got = minhash_index_probe(spark, path, copy, include_batch_pairs=False)
    assert (victim + 750_000, victim, 1.0, "history") in {
        tuple(r) for r in got.collect()
    }


def test_probe_stop_bucket_guard(spark, docs, tmp_path):
    """max_bucket_rows — the boilerplate guard: a blob of identical
    history docs collapses onto one band-key set; a colliding batch
    doc would emit one candidate PER blob member. With the cap below
    the blob size those pairs are excluded (bounded candidates), while
    non-boilerplate exact copies keep every pair."""
    from idhub_spark.operators.dedup_index import minhash_index_stats

    path = str(tmp_path / "mh_stop")
    blob_src = docs.limit(1)
    blob = blob_src.select(
        F.explode(F.sequence(F.lit(1), F.lit(30))).alias("_i"), "text"
    ).select((F.col("_i") + 10_000_000).alias("doc_id"), "text")
    minhash_index_write(
        docs.unionByName(blob), path, n_hashes=16, bands=4, pb_buckets=16,
        db_buckets=16,
    )
    st = {r.tbl: r for r in minhash_index_stats(spark, path).collect()}
    assert st["bands"].hot_bucket_rows >= 31  # blob + its source

    # batch: one copy of the blob text + one copy of a normal doc
    normal_id = int(
        docs.join(blob_src.select("text"), "text", "anti")
        .select(F.min("doc_id")).first()[0]
    )
    batch = blob_src.select(F.lit(20_000_001).alias("doc_id"), "text").unionByName(
        _exact_copies(docs.filter(F.col("doc_id") == normal_id), 1, 20_000_100)
    )

    unguarded = minhash_index_probe(
        spark, path, batch, include_batch_pairs=False
    )
    n_blob_pairs = unguarded.filter(F.col("new_id") == 20_000_001).count()
    assert n_blob_pairs >= 31  # the blowup the guard exists for

    guarded = minhash_index_probe(
        spark, path, batch, include_batch_pairs=False, max_bucket_rows=20
    )
    rows = {tuple(r) for r in guarded.collect()}
    # blob pairs gone (every agreeing band is a stop bucket)...
    assert not any(r[0] == 20_000_001 for r in rows)
    # ...while the normal exact copy keeps its pair at 1.0
    assert (normal_id + 20_000_100, normal_id, 1.0, "history") in rows


def test_rebuild_clears_stale_committed_staging(spark, docs, tmp_path):
    """ADVICE r12 medium: a rebuild must clear a leftover COMMITTED
    _append_staging (and _delete_staging) — it was committed against
    the OLD build's parameters, and promoting it into the new index
    would mix signature lengths / partition layouts, silently breaking
    probes and the lossless-pruning invariant."""
    import pathlib

    from idhub_spark.operators.dedup_index import (
        _COMMITTED,
        _STAGING,
        _doc_state,
        _load_params,
        _tables,
        _write_table,
    )

    path = str(tmp_path / "mh_rebuild")
    base = docs.filter(F.col("doc_id") % 3 == 0)
    stale_batch = docs.filter(F.col("doc_id") % 3 == 1)
    minhash_index_write(base, path, n_hashes=8, bands=2, pb_buckets=4, db_buckets=4)

    # fabricate a committed staging exactly as a crashed-mid-promotion
    # append under the OLD parameters would leave it
    n_hashes, bands, pb_b, db_b = _load_params(spark, path)
    staging = f"{path}/{_STAGING}"
    state = _doc_state(
        stale_batch, n_hashes=n_hashes, id_col="doc_id", text_col="text"
    )
    docs_df, bands_df = _tables(
        state, n_hashes=n_hashes, bands=bands, pb_buckets=pb_b, db_buckets=db_b
    )
    _write_table(docs_df, f"{staging}/docs", "db")
    _write_table(bands_df, f"{staging}/bands", "pb")
    pathlib.Path(staging, _COMMITTED).touch()
    # stale delete staging too (same clearing rule)
    dstage = pathlib.Path(path) / "_delete_staging" / "docs"
    dstage.mkdir(parents=True)
    (dstage / "junk.parquet").write_bytes(b"xx")

    # REBUILD with different parameters: both stagings must be gone
    minhash_index_write(base, path, n_hashes=16, bands=4, pb_buckets=8, db_buckets=8)
    assert not os.path.isdir(staging)
    assert not os.path.isdir(f"{path}/_delete_staging")

    # the next append must NOT promote the stale batch
    b2 = docs.filter(F.col("doc_id") % 3 == 2)
    minhash_index_append(b2, path, mode="direct")
    live = spark.read.parquet(f"{path}/docs")
    assert live.count() == base.count() + b2.count()
    # every signature has the NEW length — no mixed-parameter rows
    lens = {r[0] for r in live.select(F.size("sig")).distinct().collect()}
    assert lens == {16}


def test_probe_and_delete_settle_committed_staging(spark, docs, tmp_path):
    """ADVICE r12 low: a probe (or delete) between a crash
    mid-promotion and the next append must settle the committed
    staging first — half-promoted state drops pairs in the estimate
    join (probe) or misses doomed rows (delete)."""
    import pathlib

    from idhub_spark.operators.dedup_index import (
        _COMMITTED,
        _STAGING,
        _doc_state,
        _load_params,
        _tables,
        _write_table,
        minhash_index_delete,
    )

    path = str(tmp_path / "mh_settle")
    base = docs.filter(F.col("doc_id") % 3 == 0)
    minhash_index_write(base, path, n_hashes=8, bands=2)
    n_hashes, bands, pb_b, db_b = _load_params(spark, path)
    staging = f"{path}/{_STAGING}"

    def _fabricate(batch):
        state = _doc_state(
            batch, n_hashes=n_hashes, id_col="doc_id", text_col="text"
        )
        docs_df, bands_df = _tables(
            state,
            n_hashes=n_hashes,
            bands=bands,
            pb_buckets=pb_b,
            db_buckets=db_b,
        )
        _write_table(docs_df, f"{staging}/docs", "db" if db_b else None)
        _write_table(bands_df, f"{staging}/bands", "pb" if pb_b else None)
        pathlib.Path(staging, _COMMITTED).touch()

    # (a) probe: an exact copy of a STAGED-ONLY doc must be found
    b1 = docs.filter(F.col("doc_id") % 3 == 1)
    _fabricate(b1)
    b1_id = b1.select(F.min("doc_id")).first()[0]
    probe = _exact_copies(docs.filter(F.col("doc_id") == b1_id), 1, 800_000)
    got = minhash_index_probe(spark, path, probe, include_batch_pairs=False)
    assert (b1_id + 800_000, b1_id, 1.0, "history") in {
        tuple(r) for r in got.collect()
    }
    assert not os.path.isdir(staging)

    # (b) delete: a STAGED-ONLY doc must be retractable
    b2 = docs.filter(F.col("doc_id") % 3 == 2)
    _fabricate(b2)
    b2_id = int(b2.select(F.min("doc_id")).first()[0])
    res = minhash_index_delete(spark, path, [b2_id])
    assert res["rows_deleted"] == 1
    assert not os.path.isdir(staging)
    assert (
        spark.read.parquet(f"{path}/docs")
        .filter(F.col("doc_id") == b2_id)
        .count()
        == 0
    )


def test_flat_delete_all_leaves_readable_empty_index(spark, docs, tmp_path):
    """ADVICE r12 low: on a FLAT (pb/db=0) layout, deleting every row
    of a table used to stage a zero-part-file write whose read-back
    threw 'unable to infer schema'. The live table must come back as
    a schema-preserving EMPTY parquet: probes return no rows instead
    of erroring."""
    from idhub_spark.operators.dedup_index import (
        minhash_index_delete,
        minhash_index_stats,
    )

    path = str(tmp_path / "mh_flat_all")
    subset = docs.filter(F.col("doc_id") % 50 == 0)
    minhash_index_write(subset, path, n_hashes=8, bands=2, pb_buckets=0, db_buckets=0)
    n = subset.count()
    assert n > 0

    res = minhash_index_delete(spark, path, subset.select("doc_id"))
    assert res["rows_deleted"] == n
    assert spark.read.parquet(f"{path}/docs").count() == 0
    assert spark.read.parquet(f"{path}/bands").count() == 0

    # a probe against the emptied index is a clean no-match, not an error
    probe_batch = _exact_copies(subset, 50, 600_000)
    got = minhash_index_probe(
        spark, path, probe_batch, include_batch_pairs=False
    )
    assert got.count() == 0
    st = {r.tbl: r for r in minhash_index_stats(spark, path).collect()}
    assert st["docs"].n_rows == 0 and st["bands"].n_rows == 0


def test_minhash_index_compact_flat_layout(spark, docs, tmp_path):
    """A FLAT (pb/db=0) index compacts through the zero-shuffle
    per-leaf engine (single leaf per table) and stays probe-identical
    — the engine dispatch in minhash_index_compact keys on _params."""
    from idhub_spark.operators.dedup_index import minhash_index_compact

    src = str(tmp_path / "mh_flat_src")
    dst = str(tmp_path / "mh_flat_dst")
    parts = [docs.filter(F.col("doc_id") % 2 == i) for i in range(2)]
    minhash_index_write(parts[0], src, n_hashes=8, bands=2, pb_buckets=0,
                        db_buckets=0)
    minhash_index_append(parts[1], src)

    batch = _exact_copies(docs, 9, 600_000)
    before = sorted(map(tuple, minhash_index_probe(
        spark, src, batch, include_batch_pairs=False).collect()))
    n_src, n_out = minhash_index_compact(spark, src, dst)
    assert n_out <= n_src
    after = sorted(map(tuple, minhash_index_probe(
        spark, dst, batch, include_batch_pairs=False).collect()))
    assert before == after and before


# ---------------------------------------------------------------- #
# LSM delta buffer (r14): small appends land as ONE file per state  #
# table under <root>/delta — O(1) file ops instead of one file per  #
# touched partition — and every reader composes live ∪ delta, so    #
# placement never changes results.                                  #
# ---------------------------------------------------------------- #


def test_delta_append_one_file_and_probe_parity(spark, docs, tmp_path):
    """A small append buffers into the delta (exactly one file per
    state table — the O(1) file-op contract), and probe results are
    byte-identical to a twin index that appended the same batch via
    the direct partition-rename route."""
    direct = str(tmp_path / "mh_direct")
    buffered = str(tmp_path / "mh_buffered")
    base = docs.filter(F.col("doc_id") % 2 == 0)
    batch_in = docs.filter(F.col("doc_id") % 2 == 1)
    for p in (direct, buffered):
        minhash_index_write(base, p, n_hashes=16, bands=4, pb_buckets=16,
                            db_buckets=16)

    n_live_before = len(_state_files(buffered))
    assert minhash_index_append(batch_in, direct, mode="direct") == "direct"
    # auto: batch << 32*(16+16) = 1024 docs -> delta
    assert minhash_index_append(batch_in, buffered) == "delta"

    # O(1) file ops: live Hive trees untouched, one file per delta table
    assert len(_state_files(buffered)) == n_live_before
    delta_files = glob.glob(f"{buffered}/delta/*/*.parquet")
    assert len(delta_files) == 2  # one per state table
    assert not os.path.isdir(f"{buffered}/_append_staging")

    # probe parity: history hits AND in-batch pairs identical
    probe_batch = _exact_copies(docs, 7, 100_000).unionByName(
        _trimmed_copies(docs, 5, 200_000)
    )
    got_d = sorted(map(tuple, minhash_index_probe(
        spark, direct, probe_batch, threshold_est=0.5).collect()))
    got_b = sorted(map(tuple, minhash_index_probe(
        spark, buffered, probe_batch, threshold_est=0.5).collect()))
    assert got_d == got_b and got_b
    # an appended (delta-resident) doc's exact copy IS among the hits
    odd_id = int(batch_in.filter(F.col("doc_id") % 7 == 0)
                 .select(F.min("doc_id")).first()[0])
    assert any(
        r[0] == odd_id + 100_000 and r[1] == odd_id and r[2] == 1.0
        for r in got_b
    )


def test_delta_append_crash_protocol(spark, docs, tmp_path):
    """The delta route rides the same staged _COMMITTED-marker
    protocol: an uncommitted delta staging is discarded, a committed
    one is promoted by the next entry point and its rows become
    probe-visible."""
    import pathlib

    from idhub_spark.operators.dedup_index import (
        _COMMITTED,
        _STAGING,
        _doc_state,
        _load_params,
        _tables,
    )

    path = str(tmp_path / "mh_delta_crash")
    base = docs.filter(F.col("doc_id") % 3 == 0)
    b1 = docs.filter(F.col("doc_id") % 3 == 1)
    minhash_index_write(base, path, n_hashes=8, bands=2, pb_buckets=8,
                        db_buckets=8)

    # fabricate a committed delta staging exactly as a crashed
    # mid-promotion delta append would leave it
    n_hashes, bands, pb_b, db_b = _load_params(spark, path)
    staging = f"{path}/{_STAGING}"
    state = _doc_state(b1, n_hashes=n_hashes, id_col="doc_id", text_col="text")
    docs_df, bands_df = _tables(
        state, n_hashes=n_hashes, bands=bands, pb_buckets=pb_b, db_buckets=db_b
    )
    docs_df.coalesce(1).write.parquet(f"{staging}/delta/docs")
    bands_df.coalesce(1).write.parquet(f"{staging}/delta/bands")
    pathlib.Path(staging, _COMMITTED).touch()

    b1_id = int(b1.select(F.min("doc_id")).first()[0])
    probe = _exact_copies(docs.filter(F.col("doc_id") == b1_id), 1, 800_000)
    got = minhash_index_probe(spark, path, probe, include_batch_pairs=False)
    assert (b1_id + 800_000, b1_id, 1.0, "history") in {
        tuple(r) for r in got.collect()
    }
    assert not os.path.isdir(staging)
    assert os.path.isdir(f"{path}/delta/docs")

    # uncommitted junk staging: discarded by the next append
    junk = pathlib.Path(staging) / "delta" / "docs"
    junk.mkdir(parents=True)
    (junk / "junk.parquet").write_bytes(b"xx")
    assert minhash_index_append(b1.limit(0), path) == "empty"
    assert not os.path.isdir(staging)


def test_delta_delete_and_drop_when_empty(spark, docs, tmp_path):
    """Retraction reaches the delta buffer: doomed delta rows are
    anti-joined out of BOTH delta tables (delta_rows_deleted reports
    them), live partitions of live victims still rewrite, and a fully
    emptied buffer drops its directory."""
    from idhub_spark.operators.dedup_index import (
        _read_state_table,
        minhash_index_delete,
    )

    path = str(tmp_path / "mh_delta_del")
    base = docs.filter(F.col("doc_id") % 2 == 0)
    appended = docs.filter(F.col("doc_id") % 2 == 1)
    minhash_index_write(base, path, n_hashes=8, bands=2, pb_buckets=8,
                        db_buckets=8)
    assert minhash_index_append(appended, path) == "delta"

    live_victim = int(base.select(F.min("doc_id")).first()[0])
    delta_victim = int(appended.select(F.min("doc_id")).first()[0])
    rep = minhash_index_delete(spark, path, [live_victim, delta_victim])
    assert rep["rows_deleted"] == 2
    assert rep["delta_rows_deleted"] == 1
    assert rep["docs_partitions_rewritten"] >= 1  # the live victim's db

    post_docs = _read_state_table(spark, path, "docs")
    post_bands = _read_state_table(spark, path, "bands")
    for victim in (live_victim, delta_victim):
        assert post_docs.filter(F.col("doc_id") == victim).count() == 0
        assert post_bands.filter(F.col("doc_id") == victim).count() == 0
        ghost = _exact_copies(docs.filter(F.col("doc_id") == victim), 1, 800_000)
        got = minhash_index_probe(
            spark, path, ghost, include_batch_pairs=False
        ).collect()
        assert not any(r.dup_id == victim for r in got)

    # delete every remaining delta doc: the buffer directory is dropped
    rest = [r.doc_id for r in appended.filter(
        F.col("doc_id") != delta_victim).select("doc_id").collect()]
    rep2 = minhash_index_delete(spark, path, rest)
    assert rep2["delta_rows_deleted"] == len(rest)
    assert not os.path.isdir(f"{path}/delta")
    # the index is still healthy: a surviving live doc probes at 1.0
    keep = int(base.filter(F.col("doc_id") != live_victim)
               .select(F.min("doc_id")).first()[0])
    alive = _exact_copies(docs.filter(F.col("doc_id") == keep), 1, 810_000)
    got = minhash_index_probe(spark, path, alive, include_batch_pairs=False)
    assert (keep + 810_000, keep, 1.0, "history") in {
        tuple(r) for r in got.collect()
    }


def test_delta_stats_and_rebuild_clear(spark, docs, tmp_path):
    """Stats cover the LOGICAL table (live ∪ delta) while
    n_partitions stays the live Hive layout's count; a rebuild clears
    the delta (its rows carry the OLD parameters' signatures)."""
    from idhub_spark.operators.dedup_index import minhash_index_stats

    path = str(tmp_path / "mh_delta_stats")
    base = docs.filter(F.col("doc_id") % 2 == 0)
    appended = docs.filter(F.col("doc_id") % 2 == 1)
    minhash_index_write(base, path, n_hashes=8, bands=2, pb_buckets=8,
                        db_buckets=8)
    st0 = {r.tbl: r for r in minhash_index_stats(spark, path).collect()}
    assert minhash_index_append(appended, path) == "delta"
    st1 = {r.tbl: r for r in minhash_index_stats(spark, path).collect()}
    assert st1["docs"].n_rows == base.count() + appended.count()
    assert st1["bands"].n_rows == 2 * (base.count() + appended.count())
    assert st1["docs"].n_files == st0["docs"].n_files + 1  # one delta file
    assert st1["docs"].n_partitions == st0["docs"].n_partitions  # live only
    # the buffer split out of the totals (r15 — the fold-cadence signal)
    assert st0["docs"].delta_rows == 0 and st0["docs"].delta_files == 0
    assert st1["docs"].delta_rows == appended.count()
    assert st1["docs"].delta_files == 1
    assert st1["bands"].delta_rows == 2 * appended.count()

    # rebuild with new parameters: the delta belongs to the old
    # generation and must be gone
    minhash_index_write(base, path, n_hashes=16, bands=4, pb_buckets=8,
                        db_buckets=8)
    assert not os.path.isdir(f"{path}/delta")
    a_id = int(appended.select(F.min("doc_id")).first()[0])
    probe = _exact_copies(docs.filter(F.col("doc_id") == a_id), 1, 820_000)
    got = minhash_index_probe(spark, path, probe, include_batch_pairs=False)
    assert not any(r.dup_id == a_id for r in got.collect())


def test_minhash_index_cadence_state_ready(spark, duck):
    """The delta-buffer driver query (plans/dedup_q.py
    minhash_index_cadence_state — registered r15) must hold every
    verdict contract AND hash-match its oracle exactly, the same
    comparison the driver runs: delta-batch cadence -> mixed-layer
    probe -> fold parity -> cross-layer delete."""
    import idhub_spark.queries  # noqa: F401 — canonical plan import order
    from idhub_spark.plans.dedup_q import (
        MINHASH_CADENCE_STATE_ORACLE,
        minhash_index_cadence_state,
    )
    from tests.conftest import SF_DIR, assert_oracle_match

    df = minhash_index_cadence_state(spark, SF_DIR)
    assert_oracle_match(
        df, duck, MINHASH_CADENCE_STATE_ORACLE,
        name="minhash_index_cadence_state",
    )


def test_fold_delta_minor_compaction(spark, docs, tmp_path):
    """minhash_index_fold_delta — the LSM flush: the buffer's rows
    re-lay into the Hive layout (I/O ∝ delta, history untouched), the
    delta dir drops, probe results are identical before/after, and a
    second fold is a no-op."""
    from idhub_spark.operators.dedup_index import minhash_index_fold_delta

    path = str(tmp_path / "mh_fold")
    base = docs.filter(F.col("doc_id") % 2 == 0)
    b1 = docs.filter((F.col("doc_id") % 2 == 1) & (F.col("doc_id") % 3 == 0))
    b2 = docs.filter((F.col("doc_id") % 2 == 1) & (F.col("doc_id") % 3 != 0))
    minhash_index_write(base, path, n_hashes=8, bands=2, pb_buckets=8,
                        db_buckets=8)
    assert minhash_index_append(b1, path) == "delta"
    assert minhash_index_append(b2, path) == "delta"

    probe_batch = _exact_copies(docs, 7, 100_000)
    before_rows = sorted(map(tuple, minhash_index_probe(
        spark, path, probe_batch, include_batch_pairs=False).collect()))
    live_before = {f: os.path.getmtime(f) for f in _state_files(path)}

    rep = minhash_index_fold_delta(spark, path)
    assert rep["folded_rows"] == b1.count() + b2.count()
    assert rep["files_written"] >= 2
    assert not os.path.isdir(f"{path}/delta")
    assert not os.path.isdir(f"{path}/_append_staging")

    # history untouched: every pre-fold live file survives unmodified
    live_after = {f: os.path.getmtime(f) for f in _state_files(path)}
    assert set(live_before) < set(live_after)
    assert all(live_after[f] == live_before[f] for f in live_before)

    after_rows = sorted(map(tuple, minhash_index_probe(
        spark, path, probe_batch, include_batch_pairs=False).collect()))
    assert before_rows == after_rows and after_rows
    # no row visible twice: doc_ids unique in the folded layout
    dup = (
        spark.read.parquet(f"{path}/docs")
        .groupBy("doc_id").count().filter("count > 1").count()
    )
    assert dup == 0
    assert spark.read.parquet(f"{path}/docs").count() == docs.count()

    # empty buffer: no-op
    assert minhash_index_fold_delta(spark, path) == {
        "folded_rows": 0, "files_written": 0,
    }


def test_fold_delta_crash_protocol(spark, docs, tmp_path):
    """A fold that crashes after committing its staging is resumed by
    the next entry point's settle: the staged partition files rename
    in AND the delta dir is deleted (the _FOLD_DELTA marker) — rows
    restored exactly once, never duplicated."""
    import pathlib

    from idhub_spark.operators.dedup_index import (
        _COMMITTED,
        _FOLD,
        _STAGING,
        _write_table,
    )

    path = str(tmp_path / "mh_fold_crash")
    base = docs.filter(F.col("doc_id") % 2 == 0)
    b1 = docs.filter(F.col("doc_id") % 2 == 1)
    minhash_index_write(base, path, n_hashes=8, bands=2, pb_buckets=8,
                        db_buckets=8)
    assert minhash_index_append(b1, path) == "delta"

    # fabricate the crashed fold exactly as fold_delta stages it:
    # staged direct-layout tables + _FOLD + _COMMITTED, never promoted
    staging = f"{path}/{_STAGING}"
    _write_table(
        spark.read.parquet(f"{path}/delta/docs"), f"{staging}/docs", "db"
    )
    _write_table(
        spark.read.parquet(f"{path}/delta/bands"), f"{staging}/bands", "pb"
    )
    pathlib.Path(staging, _FOLD).touch()
    pathlib.Path(staging, _COMMITTED).touch()

    # the next probe settles: delta folded, results complete, no dups
    b1_id = int(b1.select(F.min("doc_id")).first()[0])
    probe = _exact_copies(docs.filter(F.col("doc_id") == b1_id), 1, 800_000)
    got = minhash_index_probe(spark, path, probe, include_batch_pairs=False)
    assert (b1_id + 800_000, b1_id, 1.0, "history") in {
        tuple(r) for r in got.collect()
    }
    assert not os.path.isdir(staging)
    assert not os.path.isdir(f"{path}/delta")
    post = spark.read.parquet(f"{path}/docs")
    assert post.count() == docs.count()
    assert post.groupBy("doc_id").count().filter("count > 1").count() == 0


def test_incremental_index_equals_single_build_randomized(spark, docs, tmp_path):
    """THE composition invariant, seeded-random (the test_properties
    pattern — hypothesis shrinking multiplies Spark minutes): an index
    grown through ANY sequence of build / routed appends (delta,
    direct, auto) / cross-layer deletes / an optional in-place fold
    must probe byte-identically to a SINGLE build over the surviving
    document set. This is the claim every delta-buffer reader path
    rests on, exercised over randomized slicings instead of the
    hand-picked ones above."""
    import random

    from idhub_spark.operators.dedup_index import (
        minhash_index_delete,
        minhash_index_fold_delta,
    )

    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    ids = sorted(r.doc_id for r in corpus.select("doc_id").collect())

    for seed in range(4):
        rng = random.Random(seed)
        inc = str(tmp_path / f"inc_{seed}")
        ref = str(tmp_path / f"ref_{seed}")

        # random slicing: 1 build slice + 1-3 append batches
        shuffled = ids[:]
        rng.shuffle(shuffled)
        n_batches = rng.randint(1, 3)
        cuts = sorted(rng.sample(range(1, len(shuffled)), n_batches))
        slices = [
            shuffled[a:b]
            for a, b in zip([0] + cuts, cuts + [len(shuffled)])
        ]
        minhash_index_write(
            corpus.filter(F.col("doc_id").isin(slices[0])), inc,
            n_hashes=8, bands=2, pb_buckets=8, db_buckets=8,
        )
        for batch_ids in slices[1:]:
            route = rng.choice(["delta", "direct", "auto"])
            minhash_index_append(
                corpus.filter(F.col("doc_id").isin(batch_ids)), inc,
                mode=route,
            )

        victims = rng.sample(ids, rng.randint(0, 4))
        if victims:
            rep = minhash_index_delete(spark, inc, victims)
            assert rep["rows_deleted"] == len(victims), f"seed {seed}"
        if rng.random() < 0.5:
            minhash_index_fold_delta(spark, inc)

        survivors = corpus.filter(~F.col("doc_id").isin(victims or [-1]))
        minhash_index_write(
            survivors, ref, n_hashes=8, bands=2, pb_buckets=8, db_buckets=8
        )

        probe_batch = _exact_copies(corpus, 5, 700_000).unionByName(
            _trimmed_copies(corpus, 7, 800_000)
        )
        got_inc = sorted(map(tuple, minhash_index_probe(
            spark, inc, probe_batch, threshold_est=0.5).collect()))
        got_ref = sorted(map(tuple, minhash_index_probe(
            spark, ref, probe_batch, threshold_est=0.5).collect()))
        assert got_inc == got_ref and got_ref, f"seed {seed}"


def test_delete_all_doomed_delta_crash_resume(spark, docs, tmp_path):
    """ADVICE r14 medium: when every buffered doc is doomed the bands
    leg drops its delta dir (surv==0); a crash before the docs leg
    used to make the rerun throw PATH_NOT_FOUND on the absent bands
    path — and a later compact would silently fold the stranded doomed
    docs back into the live table (an incomplete GDPR retraction).
    The rerun must now complete: absent subtable = already emptied,
    and the emptied parent dir drops regardless of which run sees it."""
    import shutil

    from idhub_spark.operators.dedup_index import (
        minhash_index_delete,
        minhash_index_fold_delta,
    )

    path = str(tmp_path / "mh_doomed_resume")
    base = docs.filter(F.col("doc_id") % 2 == 0)
    appended = docs.filter(F.col("doc_id") % 2 == 1)
    minhash_index_write(base, path, n_hashes=8, bands=2, pb_buckets=8,
                        db_buckets=8)
    assert minhash_index_append(appended, path) == "delta"
    doomed = [r.doc_id for r in appended.select("doc_id").collect()]

    # the crash debris: bands dropped, docs (all doomed) still present
    shutil.rmtree(f"{path}/delta/bands")
    rep = minhash_index_delete(spark, path, doomed)  # the rerun
    assert rep["delta_rows_deleted"] == len(doomed)
    assert not os.path.isdir(f"{path}/delta")
    a_id = doomed[0]
    ghost = _exact_copies(docs.filter(F.col("doc_id") == a_id), 1, 830_000)
    got = minhash_index_probe(spark, path, ghost, include_batch_pairs=False)
    assert not any(r.dup_id == a_id for r in got.collect())

    # empty-parent debris (crash between the subtable drops and the
    # parent delete): the next delete's unconditional check cleans it
    os.makedirs(f"{path}/delta")
    live_victim = int(base.select(F.min("doc_id")).first()[0])
    minhash_index_delete(spark, path, [live_victim])
    assert not os.path.isdir(f"{path}/delta")


def test_fold_delta_tolerates_delete_debris(spark, docs, tmp_path):
    """ADVICE r14 medium: the fold used to gate only on the parent
    delta dir and then read both subtables unconditionally — the
    delete-crash debris states (one subtable dropped; empty parent)
    made it throw instead of no-op. One-sided debris must NOT fold
    (the surviving rows are provably all retracted); the delete rerun
    finishes the retraction and the fold then no-ops clean."""
    import shutil

    from idhub_spark.operators.dedup_index import (
        minhash_index_delete,
        minhash_index_fold_delta,
    )

    path = str(tmp_path / "mh_fold_debris")
    base = docs.filter(F.col("doc_id") % 2 == 0)
    appended = docs.filter(F.col("doc_id") % 2 == 1)
    minhash_index_write(base, path, n_hashes=8, bands=2, pb_buckets=8,
                        db_buckets=8)
    assert minhash_index_append(appended, path) == "delta"

    shutil.rmtree(f"{path}/delta/bands")
    with pytest.warns(UserWarning, match="crashed-delete debris"):
        rep = minhash_index_fold_delta(spark, path)
    assert rep == {"folded_rows": 0, "files_written": 0}
    assert os.path.isdir(f"{path}/delta/docs")  # untouched, not folded

    doomed = [r.doc_id for r in appended.select("doc_id").collect()]
    minhash_index_delete(spark, path, doomed)
    assert not os.path.isdir(f"{path}/delta")
    assert minhash_index_fold_delta(spark, path) == {
        "folded_rows": 0, "files_written": 0,
    }

    # empty-parent debris: the fold itself cleans it up
    os.makedirs(f"{path}/delta")
    assert minhash_index_fold_delta(spark, path) == {
        "folded_rows": 0, "files_written": 0,
    }
    assert not os.path.isdir(f"{path}/delta")


def test_delta_rewrite_rename_swap_and_settle(spark, docs, tmp_path):
    """ADVICE r14 low: a partial-doom delta rewrite promotes survivors
    by RENAME SWAP (stage -> live aside -> staged in -> aside drop),
    never a second overwrite over the path the anti-join read — no
    crash point leaves a dir that passes fs.exists but fails reads.
    Each swap crash window settles exactly at the next entry point."""
    import shutil

    from idhub_spark.operators.dedup_index import (
        _read_state_table,
        minhash_index_delete,
        minhash_index_stats,
    )

    path = str(tmp_path / "mh_swap")
    base = docs.filter(F.col("doc_id") % 2 == 0)
    appended = docs.filter(F.col("doc_id") % 2 == 1)
    minhash_index_write(base, path, n_hashes=8, bands=2, pb_buckets=8,
                        db_buckets=8)
    assert minhash_index_append(appended, path) == "delta"
    n_app = appended.count()

    # healthy partial doom: live delta readable, exactly one data file
    victim = int(appended.select(F.min("doc_id")).first()[0])
    keep = int(appended.filter(F.col("doc_id") != victim)
               .select(F.min("doc_id")).first()[0])
    rep = minhash_index_delete(spark, path, [victim])
    assert rep["delta_rows_deleted"] == 1
    assert spark.read.parquet(f"{path}/delta/docs").count() == n_app - 1
    data = [f for f in os.listdir(f"{path}/delta/docs")
            if not f.startswith(("_", "."))]
    assert len(data) == 1 and not os.path.isdir(f"{path}/delta/._old_docs")

    def _probe_keep_found():
        ghost = _exact_copies(
            docs.filter(F.col("doc_id") == keep), 1, 840_000)
        got = minhash_index_probe(
            spark, path, ghost, include_batch_pairs=False)
        return any(r.dup_id == keep and r.est_jaccard == 1.0
                   for r in got.collect())

    # window A — crash between the aside rename and the staged
    # rename-in: aside present, live absent, staged survivors present.
    # The next read-only entry (probe) settles best-effort and heals.
    shutil.copytree(f"{path}/delta/docs",
                    f"{path}/_delete_staging/delta_docs")
    os.rename(f"{path}/delta/docs", f"{path}/delta/._old_docs")
    assert _probe_keep_found()
    assert os.path.isdir(f"{path}/delta/docs")
    assert not os.path.isdir(f"{path}/delta/._old_docs")
    shutil.rmtree(f"{path}/_delete_staging", ignore_errors=True)

    # window B — crash between the staged rename-in and the aside
    # drop: live IS the survivor set; settle drops the aside only
    shutil.copytree(f"{path}/delta/docs", f"{path}/delta/._old_docs")
    st = {r.tbl: r for r in minhash_index_stats(spark, path).collect()}
    assert st["docs"].delta_rows == n_app - 1
    assert not os.path.isdir(f"{path}/delta/._old_docs")
    assert _probe_keep_found()

    # window C — staged survivors vanished (manual staging cleanup):
    # the aside still holds the only copy; settle rolls it back
    os.rename(f"{path}/delta/docs", f"{path}/delta/._old_docs")
    rep2 = minhash_index_delete(spark, path, [victim])  # idempotent rerun
    assert rep2["delta_rows_deleted"] == 0
    assert os.path.isdir(f"{path}/delta/docs")
    assert not os.path.isdir(f"{path}/delta/._old_docs")
    assert _probe_keep_found()


def test_compact_excludes_delete_debris(spark, docs, tmp_path):
    """ADVICE r14 medium (second half): a one-sided delta buffer is a
    crashed delete's debris and its rows are provably all RETRACTED —
    minhash_index_compact must not fold them back into the compacted
    copy (that silently undid the takedown); excluding them completes
    the retraction."""
    import shutil

    from idhub_spark.operators.dedup_index import minhash_index_compact

    path = str(tmp_path / "mh_cmp_debris")
    dst = str(tmp_path / "mh_cmp_debris_out")
    base = docs.filter(F.col("doc_id") % 2 == 0)
    appended = docs.filter(F.col("doc_id") % 2 == 1)
    minhash_index_write(base, path, n_hashes=8, bands=2, pb_buckets=8,
                        db_buckets=8)
    assert minhash_index_append(appended, path) == "delta"
    shutil.rmtree(f"{path}/delta/bands")

    with pytest.warns(UserWarning, match="excluded from the compacted"):
        minhash_index_compact(spark, path, dst)
    assert spark.read.parquet(f"{dst}/docs").count() == base.count()
    assert not os.path.isdir(f"{dst}/delta")
    a_id = int(appended.select(F.min("doc_id")).first()[0])
    ghost = _exact_copies(docs.filter(F.col("doc_id") == a_id), 1, 850_000)
    got = minhash_index_probe(spark, dst, ghost, include_batch_pairs=False)
    assert not any(r.dup_id == a_id for r in got.collect())


def test_minhash_index_stopbucket_state_ready(spark, duck):
    """The stop-bucket-guard driver query (plans/dedup_q.py
    minhash_index_stopbucket_state — registered r15, VERDICT r14
    ask #2) must hold every verdict contract AND hash-match its
    oracle exactly, the same comparison the driver runs: organic
    dups kept at est 1.0, the 48-copy boilerplate blob suppressed
    under max_bucket_rows=20, and proven to collide unguarded."""
    import idhub_spark.queries  # noqa: F401 — canonical plan import order
    from idhub_spark.plans.dedup_q import (
        MINHASH_STOPBUCKET_STATE_ORACLE,
        minhash_index_stopbucket_state,
    )
    from tests.conftest import SF_DIR, assert_oracle_match

    df = minhash_index_stopbucket_state(spark, SF_DIR)
    assert_oracle_match(
        df, duck, MINHASH_STOPBUCKET_STATE_ORACLE,
        name="minhash_index_stopbucket_state",
    )


class _InjectedCrash(RuntimeError):
    pass


def test_delete_crash_injection_sweep(spark, docs, tmp_path, monkeypatch):
    """Exhaustive driver-crash coverage of the retraction path: a
    delete killed at EVERY driver-side filesystem-call boundary (the
    points where the protocol's ordering logic lives) must leave a
    state from which RERUNNING the same delete converges to exactly
    the never-crashed outcome — same logical doc/band row sets, no
    aside/staging debris, delta dir either gone or whole. The hand-
    built window tests above pin the named crash states; this sweep
    proves there are no UNNAMED ones. Injection wraps
    merge_into._hadoop_fs (imported at call time by every dedup_index
    fs touchpoint) to raise after K calls; Spark write jobs sit
    between those calls, so every write/fs boundary is crossed."""
    import shutil

    from idhub_spark.operators import merge_into
    from idhub_spark.operators.dedup_index import (
        _read_state_table,
        minhash_index_delete,
    )

    base = docs.filter(F.col("doc_id") % 2 == 0)
    appended = docs.filter(F.col("doc_id") % 2 == 1)
    app_ids = sorted(r.doc_id for r in appended.select("doc_id").collect())
    live_victim = int(base.select(F.min("doc_id")).first()[0])

    # template index: live history + a buffered (delta) batch
    tpl = str(tmp_path / "mh_tpl")
    minhash_index_write(base, tpl, n_hashes=8, bands=2, pb_buckets=4,
                        db_buckets=4)
    assert minhash_index_append(appended, tpl) == "delta"
    real_fs = merge_into._hadoop_fs

    def state_sets(path):
        d = {tuple(sorted(r.doc_id for r in
             _read_state_table(spark, path, t).select("doc_id").collect()))
             for t in ("docs",)}
        b = _read_state_table(spark, path, "bands").count()
        return d, b

    # scenario A: mixed live + partial-delta victims (rename-swap path)
    # scenario B: live + ALL delta victims (surv==0 drop path)
    scenarios = {
        "partial": [live_victim] + app_ids[:2],
        "all_delta": [live_victim] + app_ids,
    }
    for name, victims in scenarios.items():
        clean = str(tmp_path / f"mh_clean_{name}")
        shutil.copytree(tpl, clean)
        minhash_index_delete(spark, clean, victims)
        want = state_sets(clean)

        # count the clean run's fs-call boundaries on a fresh copy
        counter = {"n": 0}

        def counting(s, p):
            counter["n"] += 1
            return real_fs(s, p)

        probe_run = str(tmp_path / f"mh_count_{name}")
        shutil.copytree(tpl, probe_run)
        monkeypatch.setattr(merge_into, "_hadoop_fs", counting)
        minhash_index_delete(spark, probe_run, victims)
        monkeypatch.setattr(merge_into, "_hadoop_fs", real_fs)
        total = counter["n"]
        assert total > 10, f"{name}: expected a real fs-call sweep"

        # stride the sweep to bound wall (~12 points incl. first/last)
        ks = sorted(set(range(1, total + 1, max(1, total // 10))) | {1, total})
        for k in ks:
            idx = str(tmp_path / f"mh_k_{name}_{k}")
            shutil.copytree(tpl, idx)
            calls = {"n": 0}

            def crashing(s, p, _limit=k):
                calls["n"] += 1
                if calls["n"] > _limit:
                    raise _InjectedCrash(f"fs call {calls['n']}")
                return real_fs(s, p)

            monkeypatch.setattr(merge_into, "_hadoop_fs", crashing)
            try:
                minhash_index_delete(spark, idx, victims)
                crashed = False
            except (_InjectedCrash, RuntimeError):
                # RuntimeError: _move_tree/_settle raise their own
                # wrapper around an injected failure — still a crash
                crashed = True
            finally:
                monkeypatch.setattr(merge_into, "_hadoop_fs", real_fs)
            assert crashed or k == total, f"{name} K={k}"

            minhash_index_delete(spark, idx, victims)  # the rerun
            assert state_sets(idx) == want, f"{name} K={k}"
            assert not os.path.isdir(f"{idx}/_delete_staging"), (
                f"{name} K={k}"
            )
            for t in ("docs", "bands"):
                assert not os.path.isdir(f"{idx}/delta/._old_{t}"), (
                    f"{name} K={k}"
                )
            if os.path.isdir(f"{idx}/delta"):
                assert os.path.isdir(f"{idx}/delta/docs") == os.path.isdir(
                    f"{idx}/delta/bands"
                ), f"{name} K={k}"
            shutil.rmtree(idx, ignore_errors=True)


def test_append_batch_id_exactly_once(spark, docs, tmp_path):
    """r15 idempotent ingest: an append with a batch_id logs its key
    atomically within the promotion protocol; a retried append with
    the same key returns 'duplicate' and changes nothing; compact
    carries the log to the compacted copy; a rebuild clears it (old
    generation)."""
    from idhub_spark.operators.dedup_index import (
        _read_state_table,
        minhash_index_compact,
    )

    path = str(tmp_path / "mh_once")
    dst = str(tmp_path / "mh_once_packed")
    base = docs.filter(F.col("doc_id") % 2 == 0)
    appended = docs.filter(F.col("doc_id") % 2 == 1)
    minhash_index_write(base, path, n_hashes=8, bands=2, pb_buckets=4,
                        db_buckets=4)

    assert minhash_index_append(appended, path, batch_id="crawl-7") == "delta"
    n_all = docs.count()
    assert _read_state_table(spark, path, "docs").count() == n_all

    # the retry: same key -> no-op, no double ingest
    assert minhash_index_append(
        appended, path, batch_id="crawl-7") == "duplicate"
    assert _read_state_table(spark, path, "docs").count() == n_all
    # a DIFFERENT key ingests (caller's key, caller's meaning)
    fresh = appended.select((F.col("doc_id") + 500_000).alias("doc_id"),
                            "text")
    assert minhash_index_append(fresh, path, batch_id="crawl-8") == "delta"
    n_plus = n_all + appended.count()
    assert _read_state_table(spark, path, "docs").count() == n_plus

    # compact carries the log: the copy still rejects both keys
    minhash_index_compact(spark, path, dst)
    assert minhash_index_append(
        appended, dst, batch_id="crawl-7") == "duplicate"
    assert minhash_index_append(fresh, dst, batch_id="crawl-8") == "duplicate"
    assert _read_state_table(spark, dst, "docs").count() == n_plus

    # rebuild clears the log with the rest of the old generation
    minhash_index_write(base, path, n_hashes=8, bands=2, pb_buckets=4,
                        db_buckets=4)
    assert not os.path.isdir(f"{path}/_ingest_log")
    assert minhash_index_append(appended, path, batch_id="crawl-7") == "delta"


def test_append_batch_id_crash_injection_sweep(spark, docs, tmp_path,
                                               monkeypatch):
    """The exactly-once guarantee under crashes, swept like the delete
    test: an append with a batch_id killed at every strided driver
    fs-call boundary, then RETRIED with the same key, must land the
    batch exactly once — a crash before the commit marker discards
    and the retry re-ingests; after it, the retry's entry settle
    promotes+logs and the append returns 'duplicate'. Without the
    key, the post-commit crash window double-ingests silently (the
    gap this feature closes — pinned as the final control)."""
    import shutil

    from idhub_spark.operators import merge_into
    from idhub_spark.operators.dedup_index import _read_state_table

    base = docs.filter(F.col("doc_id") % 2 == 0)
    appended = docs.filter(F.col("doc_id") % 2 == 1)
    n_all = docs.count()
    tpl = str(tmp_path / "mh_once_tpl")
    minhash_index_write(base, tpl, n_hashes=8, bands=2, pb_buckets=4,
                        db_buckets=4)
    real_fs = merge_into._hadoop_fs

    counter = {"n": 0}

    def counting(s, p):
        counter["n"] += 1
        return real_fs(s, p)

    cnt_idx = str(tmp_path / "mh_once_cnt")
    shutil.copytree(tpl, cnt_idx)
    monkeypatch.setattr(merge_into, "_hadoop_fs", counting)
    assert minhash_index_append(appended, cnt_idx, batch_id="b1") == "delta"
    monkeypatch.setattr(merge_into, "_hadoop_fs", real_fs)
    total = counter["n"]
    assert total > 5

    ks = sorted(set(range(1, total + 1, max(1, total // 8))) | {1, total})
    for k in ks:
        idx = str(tmp_path / f"mh_once_k{k}")
        shutil.copytree(tpl, idx)
        calls = {"n": 0}

        def crashing(s, p, _limit=k):
            calls["n"] += 1
            if calls["n"] > _limit:
                raise _InjectedCrash(f"fs call {calls['n']}")
            return real_fs(s, p)

        monkeypatch.setattr(merge_into, "_hadoop_fs", crashing)
        try:
            minhash_index_append(appended, idx, batch_id="b1")
            crashed = False
        except (_InjectedCrash, RuntimeError):
            crashed = True
        finally:
            monkeypatch.setattr(merge_into, "_hadoop_fs", real_fs)
        assert crashed or k == total, f"K={k}"

        route = minhash_index_append(appended, idx, batch_id="b1")
        assert route in ("delta", "direct", "duplicate"), f"K={k}"
        got = _read_state_table(spark, idx, "docs").count()
        assert got == n_all, f"K={k}: {got} docs (exactly-once violated)"
        shutil.rmtree(idx, ignore_errors=True)

    # the control: WITHOUT a batch_id, the post-commit crash window
    # double-ingests on retry — the documented gap, kept honest here.
    # The no-key append makes fewer fs calls, so count its own run.
    cnt2 = str(tmp_path / "mh_once_cnt2")
    shutil.copytree(tpl, cnt2)
    counter["n"] = 0
    monkeypatch.setattr(merge_into, "_hadoop_fs", counting)
    assert minhash_index_append(appended, cnt2) == "delta"
    monkeypatch.setattr(merge_into, "_hadoop_fs", real_fs)
    total_nokey = counter["n"]

    idx = str(tmp_path / "mh_once_nokey")
    shutil.copytree(tpl, idx)
    calls = {"n": 0}

    def crash_late(s, p, _limit=total_nokey - 1):
        calls["n"] += 1
        if calls["n"] > _limit:
            raise _InjectedCrash(f"fs call {calls['n']}")
        return real_fs(s, p)

    monkeypatch.setattr(merge_into, "_hadoop_fs", crash_late)
    with pytest.raises((_InjectedCrash, RuntimeError)):
        minhash_index_append(appended, idx)
    monkeypatch.setattr(merge_into, "_hadoop_fs", real_fs)
    minhash_index_append(appended, idx)  # the naive retry
    assert _read_state_table(spark, idx, "docs").count() > n_all


def test_delta_rewrite_rollback_warns_and_flags(spark, docs, tmp_path):
    """ADVICE r15 low: the settle's rollback branch restores rows a
    crashed delete had already retracted — it must never be silent.
    The rollback warns and sets the root-level rerun flag; stats
    re-warns while the flag stands; compact carries it; a rebuild
    clears it with the old generation. r17 narrows the CLEAR (ADVICE
    r16): an UNRELATED delete — one that never touched the delta
    buffer (rows_delta == 0, buffer present) — used to clear the flag
    while the restored retracted rows stayed live; now only a delete
    that rewrote the buffer clears it, and once a fold consumes the
    buffer (restored rows now LIVE, untraceable) any completed delete
    clears under the documented same-takedown retry contract
    (docs/operations.md)."""
    import warnings as _warnings

    from idhub_spark.operators.dedup_index import (
        _RERUN_MARKER,
        minhash_index_compact,
        minhash_index_delete,
        minhash_index_fold_delta,
        minhash_index_stats,
    )

    path = str(tmp_path / "mh_rb")
    base = docs.filter(F.col("doc_id") % 2 == 0)
    appended = docs.filter(F.col("doc_id") % 2 == 1)
    minhash_index_write(base, path, n_hashes=8, bands=2, pb_buckets=8,
                        db_buckets=8)
    assert minhash_index_append(appended, path) == "delta"
    odd_ids = [
        r.doc_id
        for r in appended.select("doc_id").orderBy("doc_id").limit(3).collect()
    ]
    victim1, victim2 = int(odd_ids[0]), int(odd_ids[1])
    minhash_index_delete(spark, path, [victim1])
    assert not os.path.exists(f"{path}/{_RERUN_MARKER}")

    # fabricate the rollback state (window C of the rename-swap
    # protocol): aside present, live AND staged survivors absent —
    # models a delete of victim2 that crashed mid-swap
    os.rename(f"{path}/delta/docs", f"{path}/delta/._old_docs")
    with pytest.warns(UserWarning, match="rolled back"):
        minhash_index_stats(spark, path)
    assert os.path.isdir(f"{path}/delta/docs")
    assert os.path.exists(f"{path}/{_RERUN_MARKER}")

    # every later stats read keeps surfacing the pending takedown
    with pytest.warns(UserWarning, match="live again"):
        minhash_index_stats(spark, path)

    # compact carries the flag with the rows it still holds
    dst = str(tmp_path / "mh_rb_packed")
    minhash_index_compact(spark, path, dst)
    assert os.path.exists(f"{dst}/{_RERUN_MARKER}")

    # ADVICE r16: an unrelated delete (live-only ids, buffer present
    # and untouched) must NOT clear the flag
    bystander = int(base.select(F.min("doc_id")).first()[0])
    rep_unrel = minhash_index_delete(spark, path, [bystander])
    assert rep_unrel["delta_rows_deleted"] == 0
    assert os.path.exists(f"{path}/{_RERUN_MARKER}")
    with pytest.warns(UserWarning, match="live again"):
        minhash_index_stats(spark, path)

    # the same-takedown rerun rewrites the buffer and clears the flag
    rep_rerun = minhash_index_delete(spark, path, [victim2])
    assert rep_rerun["delta_rows_deleted"] > 0
    assert not os.path.exists(f"{path}/{_RERUN_MARKER}")
    with _warnings.catch_warnings(record=True) as caught:
        _warnings.simplefilter("always")
        minhash_index_stats(spark, path)
    assert not [w for w in caught if "live again" in str(w.message)]

    # once a FOLD consumes the buffer, the restored rows are live and
    # untraceable — any completed delete clears, per the documented
    # same-takedown contract (the pre-r17 semantics, confined here)
    os.rename(f"{path}/delta/docs", f"{path}/delta/._old_docs")
    with pytest.warns(UserWarning, match="rolled back"):
        minhash_index_stats(spark, path)
    assert os.path.exists(f"{path}/{_RERUN_MARKER}")
    minhash_index_fold_delta(spark, path)
    assert not os.path.isdir(f"{path}/delta")
    assert os.path.exists(f"{path}/{_RERUN_MARKER}")  # fold never clears
    minhash_index_delete(spark, path, [bystander])
    assert not os.path.exists(f"{path}/{_RERUN_MARKER}")

    # rebuild clears it with the rest of the old generation
    minhash_index_write(base, dst, n_hashes=8, bands=2, pb_buckets=8,
                        db_buckets=8)
    assert not os.path.exists(f"{dst}/{_RERUN_MARKER}")


def _log_entry(path, key):
    """(fullpath, accept_ms | None) of the ingest-log entry for key,
    (None, None) when absent — r17 entries are named <key>.<accept_ms>
    (accept_ms None = legacy bare-key form)."""
    import glob as _glob

    hits = _glob.glob(f"{path}/_ingest_log/{key}*")
    if not hits:
        return None, None
    name = os.path.basename(hits[0])
    stem, _, suf = name.rpartition(".")
    return hits[0], int(suf) if stem and suf.isdigit() else None


def _age_entry(path, key, delta_ms):
    """Rewind an entry's NAMED accept time by delta_ms while forcing
    its file mtime to NOW — age must come from the name alone (the
    storage-independence contract, _marker_parse)."""
    import time

    p, ms = _log_entry(path, key)
    aged = f"{path}/_ingest_log/{key}.{ms - delta_ms}"
    os.rename(p, aged)
    now = time.time()
    os.utime(aged, (now, now))


def test_ingest_log_dup_check_glob_metachar_root(spark, tmp_path):
    """ADVICE r17: the exactly-once dup check must not interpolate the
    caller's index ROOT into a glob pattern — globStatus on
    '<root>/_ingest_log/<key>*' with a root containing glob
    metacharacters ([, ], *, {}) matched a DIFFERENT directory (e.g.
    '[1]' matches the single character '1'), silently re-admitting
    every retried batch. _ingest_log_has now glob-ESCAPES the root
    before interpolation (one RPC, JVM-side match — the driver-side
    listStatus alternative measured 20-30x dearer at the log's entry
    bound, docs/scale_audit_r18.md §1), so only the LEAF is ever
    pattern-sensitive (and keys are fixed-length hex). Unit-level: a
    full index can't live under such a root anyway (Spark read paths
    glob too), but the marker protocol itself must stay correct."""
    from idhub_spark.operators.dedup_index import (
        _batch_key,
        _ingest_log_has,
        _marker_name,
    )

    for weird in ("mh[1]idx", "mh{a}idx", "mh*idx"):
        root = str(tmp_path / weird)
        key = _batch_key("crawl-7")
        os.makedirs(f"{root}/_ingest_log")
        open(f"{root}/_ingest_log/{_marker_name(key, 1755000000000)}",
             "w").close()
        assert _ingest_log_has(spark, root, key) is True, weird
        assert _ingest_log_has(spark, root, _batch_key("other")) is False
    # absent log dir (fresh index): False, no error
    assert _ingest_log_has(
        spark, str(tmp_path / "mh[2]fresh"), _batch_key("x")
    ) is False


def test_glob_escape_properties(spark, tmp_path):
    """Property-pin _glob_escape beyond the three hand-picked roots
    above: (1) pure codec — every Hadoop glob metachar in the output
    is backslash-escaped and stripping the escapes recovers the input
    (no character is lost or duplicated); (2) end-to-end — for an
    ARBITRARY metachar-bearing directory name, the escaped root makes
    the dup check find exactly the keys that exist under that literal
    root. Inner @given functions keep hypothesis off the
    function-scoped fixtures (the marker-codec test's pattern)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from idhub_spark.operators.dedup_index import (
        _GLOB_SPECIALS,
        _batch_key,
        _glob_escape,
        _ingest_log_has,
        _marker_name,
    )

    @settings(max_examples=200, deadline=None)
    @given(path=st.text(min_size=0, max_size=80))
    def codec(path):
        esc = _glob_escape(path)
        # every metachar occurrence is immediately preceded by the
        # escape; walking the escaped form recovers the original
        out, i = [], 0
        while i < len(esc):
            if esc[i] == "\\" and i + 1 < len(esc) and esc[i + 1] in _GLOB_SPECIALS:
                out.append(esc[i + 1])
                i += 2
            else:
                assert esc[i] not in _GLOB_SPECIALS
                out.append(esc[i])
                i += 1
        assert "".join(out) == path

    codec()

    # fs-level: arbitrary legal dir names (no '/', no ':' — Hadoop
    # Path scheme quirk, no NUL, not '.'/'..'); metachars weighted in
    # so most examples actually exercise the escape.
    name = st.text(
        alphabet=st.sampled_from(list("ab7._- ") + list("\\*?[]{}")),
        min_size=1,
        max_size=24,
    ).filter(lambda s: s not in (".", "..") and s.strip() != "")

    @settings(max_examples=25, deadline=None)
    @given(weird=name, batch_id=st.text(min_size=1, max_size=16))
    def dup_check_literal_root(weird, batch_id):
        root = str(tmp_path / "h" / weird)
        key = _batch_key(batch_id)
        log = f"{root}/_ingest_log"
        os.makedirs(log, exist_ok=True)
        marker = f"{log}/{_marker_name(key, 1755000000000)}"
        open(marker, "w").close()
        try:
            assert _ingest_log_has(spark, root, key) is True, weird
            absent = _batch_key(batch_id + "~other")
            assert _ingest_log_has(spark, root, absent) is False, weird
        finally:
            os.remove(marker)

    dup_check_literal_root()


def test_ingest_log_horizon_bounds_fold_and_compact(spark, docs, tmp_path):
    """r16 (VERDICT r15) + r17 (VERDICT r16): the ingest log is
    bounded by the retry horizon, with entry AGE in the FILENAME
    (<key>.<accept_ms>) so the clock is storage-independent — every
    aging step here rewinds the NAME while forcing the file mtime to
    NOW, the object-store worst case the old setTimes carry lost to.
    Fold prunes aged entries in place; compact carries only in-horizon
    entries under their canonical name; legacy bare-key entries
    mtime-age and canonicalize at first carry; and a post-horizon
    retry is a new ingest decision by documented contract."""
    import time

    from idhub_spark.operators.dedup_index import (
        _batch_key,
        minhash_index_compact,
        minhash_index_fold_delta,
    )

    path = str(tmp_path / "mh_log")
    base = docs.filter(F.col("doc_id") % 2 == 0)
    b1 = docs.filter(F.col("doc_id") % 4 == 1)
    b2 = docs.filter(F.col("doc_id") % 4 == 3)
    minhash_index_write(base, path, n_hashes=8, bands=2, pb_buckets=4,
                        db_buckets=4)
    assert minhash_index_append(b1, path, batch_id="old-batch") == "delta"
    assert minhash_index_append(b2, path, batch_id="new-batch") == "delta"
    assert _log_entry(path, _batch_key("old-batch"))[1] is not None
    assert _log_entry(path, _batch_key("new-batch"))[1] is not None

    # age the first entry beyond the 7-day default horizon (by NAME;
    # mtime forced fresh — the prune must ignore it)
    _age_entry(path, _batch_key("old-batch"), 8 * 24 * 3600 * 1000)

    # fold prunes it in place; the fresh entry survives and still
    # rejects its retry; the aged key is a NEW ingest decision now
    minhash_index_fold_delta(spark, path)
    assert _log_entry(path, _batch_key("old-batch"))[0] is None
    assert _log_entry(path, _batch_key("new-batch"))[0] is not None
    assert minhash_index_append(b2, path, batch_id="new-batch") == "duplicate"
    assert minhash_index_append(
        b1.select((F.col("doc_id") + 700_000).alias("doc_id"), "text"),
        path, batch_id="old-batch") == "delta"

    # compact: aged-by-name entries don't carry even at fresh mtime;
    # in-horizon entries carry under the SAME canonical name; a legacy
    # bare-key entry (pre-r17 form) still rejects its retry via the
    # name-prefix dup check and canonicalizes at carry with its mtime
    # as the accept time
    _age_entry(path, _batch_key("old-batch"), 8 * 24 * 3600 * 1000)
    legacy_key = _batch_key("legacy-batch")
    legacy_p = f"{path}/_ingest_log/{legacy_key}"
    open(legacy_p, "w").close()
    legacy_s = int(time.time()) - 3600  # inside the horizon
    os.utime(legacy_p, (legacy_s, legacy_s))
    assert minhash_index_append(b2, path, batch_id="legacy-batch") == "duplicate"
    new_ms = _log_entry(path, _batch_key("new-batch"))[1]
    dst = str(tmp_path / "mh_log_packed")
    minhash_index_compact(spark, path, dst)
    assert _log_entry(dst, _batch_key("old-batch"))[0] is None
    assert _log_entry(dst, _batch_key("new-batch"))[1] == new_ms
    assert _log_entry(dst, legacy_key)[1] == legacy_s * 1000


def test_ingest_log_horizon_survives_mtime_reset(spark, docs, tmp_path):
    """r17 (VERDICT r16 what's-wrong #1): entry age must survive a
    storage tier where mtimes are useless (S3A — setTimes is a silent
    no-op and every carried object's mtime is its write time; the old
    carry never aged entries out there). Worst case simulated: carry
    an in-horizon entry, force the dst file's mtime to NOW, advance
    the clock past the horizon — the prune must still drop it, from
    the NAMED accept time alone."""
    import time

    from idhub_spark.operators.dedup_index import (
        INGEST_LOG_HORIZON_S,
        _batch_key,
        _prune_ingest_log,
        minhash_index_compact,
    )

    path = str(tmp_path / "mh_s3")
    base = docs.filter(F.col("doc_id") % 2 == 0)
    b1 = docs.filter(F.col("doc_id") % 2 == 1)
    minhash_index_write(base, path, n_hashes=8, bands=2, pb_buckets=4,
                        db_buckets=4)
    assert minhash_index_append(b1, path, batch_id="batch-x") == "delta"
    # 6 days old by name — inside the 7-day horizon, so it carries
    _age_entry(path, _batch_key("batch-x"), 6 * 24 * 3600 * 1000)
    near_ms = _log_entry(path, _batch_key("batch-x"))[1]
    dst = str(tmp_path / "mh_s3_packed")
    minhash_index_compact(spark, path, dst)
    d, dms = _log_entry(dst, _batch_key("batch-x"))
    assert dms == near_ms  # accept time rode the carry in the NAME
    now = time.time()
    os.utime(d, (now, now))  # object-store rebirth: mtime = write time
    # two more days pass -> past the horizon; prune must drop it
    pruned = _prune_ingest_log(
        spark, dst, INGEST_LOG_HORIZON_S,
        now_ms=int(now * 1000) + 2 * 24 * 3600 * 1000,
    )
    assert pruned == 1
    assert _log_entry(dst, _batch_key("batch-x"))[0] is None


def test_minhash_index_fsck(spark, docs, tmp_path, monkeypatch):
    """minhash_index_fsck: READ-ONLY classification of every pending
    state — it must report exactly what the settle functions would do
    WITHOUT doing any of it (replica-safe diagnosis), surface the
    rollback hazard before a settle triggers it, and stay quiet on a
    healthy index."""
    from idhub_spark.operators.dedup_index import (
        _RERUN_MARKER,
        minhash_index_fsck,
        minhash_index_stats,
    )

    path = str(tmp_path / "mh_fsck")
    base = docs.filter(F.col("doc_id") % 2 == 0)
    appended = docs.filter(F.col("doc_id") % 2 == 1)
    minhash_index_write(base, path, n_hashes=8, bands=2, pb_buckets=8,
                        db_buckets=8)
    rep = minhash_index_fsck(spark, path)
    assert rep["healthy"] is True and rep["findings"] == []
    assert rep["params"]["pb_buckets"] == 8
    assert rep["ingest_log"]["n_entries"] == 0
    assert rep["delta"]["present"] is False

    # a buffered keyed append: delta + one named log entry, still healthy
    assert minhash_index_append(appended, path, batch_id="b1") == "delta"
    rep = minhash_index_fsck(spark, path)
    assert rep["healthy"] is True
    log = rep["ingest_log"]
    assert log["n_entries"] == 1 and log["n_legacy"] == 0
    assert log["n_past_horizon"] == 0 and log["oldest_age_s"] < 3600
    assert rep["delta"] == {"present": True, "files": 2}

    # fabricate an UNCOMMITTED append staging: fsck classifies discard
    # and MUTATES NOTHING (the staging survives the check)
    os.makedirs(f"{path}/_append_staging/docs")
    rep = minhash_index_fsck(spark, path)
    assert rep["healthy"] is False
    assert rep["pending_append_staging"]["state"] == "uncommitted"
    assert rep["pending_append_staging"]["settle_action"] == "discard"
    assert os.path.isdir(f"{path}/_append_staging")  # read-only proof
    os.rmdir(f"{path}/_append_staging/docs")
    os.rmdir(f"{path}/_append_staging")

    # fabricate the rollback window (aside only): fsck names the
    # hazard WITHOUT settling — aside intact, no rerun flag created
    os.rename(f"{path}/delta/docs", f"{path}/delta/._old_docs")
    rep = minhash_index_fsck(spark, path)
    assert rep["healthy"] is False
    assert "ROLLBACK" in rep["pending_delta_rewrite"]["docs"]
    assert os.path.isdir(f"{path}/delta/._old_docs")  # still pending
    assert not os.path.exists(f"{path}/{_RERUN_MARKER}")  # not settled

    # after a real settle (stats, best-effort) the flag exists and
    # fsck keeps surfacing it
    with pytest.warns(UserWarning, match="rolled back"):
        minhash_index_stats(spark, path)
    rep = minhash_index_fsck(spark, path)
    assert rep["delete_rerun_needed"] is True
    assert any("rerun" in f for f in rep["findings"])

    # CLI front: exit 3 on findings (cron-friendly)
    from idhub_spark import cli as _cli

    rc = _cli.main(["dedup-index", "fsck", "--index", path])
    assert rc == 3

    # concurrent-writer race: a settle promoting the staging between
    # fsck's exists and its follow-up calls must degrade to a
    # 'rerun fsck' finding, never crash the advisory check
    import idhub_spark.operators.merge_into as merge_into

    os.makedirs(f"{path}/_append_staging/docs", exist_ok=True)
    real_fs = merge_into._hadoop_fs

    def racy(s, p):
        if p.endswith("_COMMITTED"):
            raise RuntimeError("vanished under the check")
        return real_fs(s, p)

    monkeypatch.setattr(merge_into, "_hadoop_fs", racy)
    rep = minhash_index_fsck(spark, path)
    monkeypatch.setattr(merge_into, "_hadoop_fs", real_fs)
    assert rep["healthy"] is False
    assert any(
        "could not inspect append staging" in f for f in rep["findings"]
    )
    assert rep["pending_append_staging"] is None  # classification aborted


def test_marker_parse_roundtrip_properties():
    """Property-pin the r17 marker-name codec (no Spark): the named
    form round-trips exactly for every hex key and accept_ms; legacy
    bare keys (pure hex, no dot) always fall back to the supplied
    mtime; and the batch-key alphabet guarantees the bare/named forms
    can never be confused (a sha256-prefix key contains no '.')."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from idhub_spark.operators.dedup_index import (
        _batch_key,
        _marker_name,
        _marker_parse,
    )

    hex_key = st.text(alphabet="0123456789abcdef", min_size=32, max_size=32)

    @settings(max_examples=200, deadline=None)
    @given(key=hex_key, accept_ms=st.integers(min_value=0, max_value=2**53),
           mtime=st.integers(min_value=0, max_value=2**53))
    def roundtrip(key, accept_ms, mtime):
        assert _marker_parse(_marker_name(key, accept_ms), mtime) == (
            key, accept_ms,
        )
        # legacy bare form: key comes back verbatim, age = mtime
        assert _marker_parse(key, mtime) == (key, mtime)

    roundtrip()

    @settings(max_examples=100, deadline=None)
    @given(batch_id=st.text(min_size=1, max_size=64))
    def key_alphabet(batch_id):
        k = _batch_key(batch_id)
        assert len(k) == 32 and "." not in k
        assert all(c in "0123456789abcdef" for c in k)

    key_alphabet()


def test_doc_state_plan_shape_and_ab_values(spark, docs):
    """The r19 _doc_state pins the ADVICE r19 review asked for:

    (a) PLAN SHAPE — the per-row projection form has ZERO Exchange and
        ZERO HashAggregate (the r18 form paid a distinct exchange + a
        signature aggregation per invocation), and exactly one scan.
    (b) A/B VALUES — sig components and n_sh are BIT-IDENTICAL to the
        r18 aggregation form (explode -> distinct -> groupBy with
        per-component min(xxhash64(lit(i), sh))) on an adversarial
        micro-corpus: duplicate shingles, duplicate words, 1-word and
        2-word docs (short-doc fallback), leading/trailing spaces, and
        a NULL text (excluded on both paths). min over a set is
        duplicate- and order-insensitive, and xxhash64(<int literal>,
        s) types the seed exactly like F.lit(i) — this is the pin.
    """
    from idhub_spark.operators.dedup_index import _doc_state
    from idhub_spark.operators.shingles import word_shingles

    n_hashes = 4
    state = _doc_state(docs, n_hashes=n_hashes, id_col="doc_id", text_col="text")
    plan = state._sc._jvm.PythonSQLUtils.explainString(
        state._jdf.queryExecution(), "formatted"
    )
    import re

    assert not re.search(r"(?<![A-Za-z])Exchange\b", plan), plan
    assert "HashAggregate" not in plan, plan
    # one scan: count formatted-detail operator ids, not raw substring
    # hits (each scan appears in both the tree and the detail section)
    assert len(re.findall(r"(?m)^\(\d+\) Scan parquet", plan)) == 1, plan

    adv = spark.createDataFrame(
        [
            (1, "a b c a b c a b c"),          # duplicate shingles
            (2, "w w w w"),                     # duplicate words
            (3, "one"),                         # 1 word -> whole text
            (4, "two words"),                   # 2 words -> whole text
            (5, "  padded   text here  "),      # split() empties
            (6, None),                          # excluded on both paths
            (7, ""),                            # empty string
        ],
        "doc_id bigint, text string",
    )
    new = {
        r.doc_id: (tuple(r.sig), r.n_sh)
        for r in _doc_state(
            adv, n_hashes=n_hashes, id_col="doc_id", text_col="text"
        ).collect()
    }
    # r18 aggregation form, reconstructed: distinct 3-gram shingles for
    # >=3-word docs, whole trimmed text for shorter non-null docs
    base = adv.filter(F.col("text").isNotNull())
    ws = base.select("doc_id", "text", F.split("text", " ").alias("ws"))
    long_sh = (
        ws.filter(F.size("ws") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(ws)-3), "
                    "i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))"
                )
            ).alias("sh"),
        )
    )
    short_sh = ws.filter(F.size("ws") < 3).select(
        "doc_id", F.trim(F.col("text")).alias("sh")
    )
    sh = long_sh.unionByName(short_sh).distinct()
    old = {
        r.doc_id: (tuple(r.sig), r.n_sh)
        for r in sh.groupBy("doc_id")
        .agg(
            F.array(
                *[
                    F.min(F.xxhash64(F.lit(i), F.col("sh")))
                    for i in range(n_hashes)
                ]
            ).alias("sig"),
            F.count(F.lit(1)).alias("n_sh"),
        )
        .collect()
    }
    assert new == old
    assert set(new) == {1, 2, 3, 4, 5, 7}  # null text excluded


def test_load_params_marker_fallback_and_driver_side_parquet(
    spark, docs, tmp_path
):
    """_load_params crash-ordering pins (ADVICE r19): the _META marker
    is a fast path, the parquet row stays authoritative — a missing
    marker (crash between parquet and marker) and an ambiguous marker
    set (two _META files) both fall back to the parquet read with the
    same values. Also pins the r20 driver-side _params write: the
    parquet is a readable 1-row file with the exact int32 schema the
    Spark write produced."""
    import glob as _glob

    from idhub_spark.operators.dedup_index import _load_params

    path = str(tmp_path / "mh_params")
    minhash_index_write(
        docs.limit(40), path, n_hashes=8, bands=2, pb_buckets=4, db_buckets=4
    )
    want = (8, 2, 4, 4)
    assert _load_params(spark, path) == want

    # the authoritative parquet: 1 row, int32 columns (format pin for
    # the r20 driver-side pyarrow write — byte-compatible with the old
    # Spark write)
    p = spark.read.parquet(f"{path}/_params")
    assert [f.dataType.simpleString() for f in p.schema.fields] == ["int"] * 4
    assert p.collect()[0].asDict() == {
        "n_hashes": 8, "bands": 2, "pb_buckets": 4, "db_buckets": 4,
    }

    (marker,) = _glob.glob(f"{path}/_params/_META.*")
    os.remove(marker)
    assert _load_params(spark, path) == want  # parquet fallback

    # ambiguous marker set (exactly-1-match guard) -> parquet fallback
    open(f"{path}/_params/_META.9.9.9.9", "w").close()
    open(f"{path}/_params/_META.7.7.7.7", "w").close()
    assert _load_params(spark, path) == want


def test_par_jobs_propagates_first_exception(spark):
    """_par_jobs awaits every thunk and re-raises before the caller
    proceeds to its commit marker (the crash-ordering contract the r19
    overlap relies on)."""
    from idhub_spark.operators.dedup_index import _par_jobs

    ran = []

    def ok():
        ran.append("ok")

    def boom():
        raise RuntimeError("boom")

    with pytest.raises(RuntimeError, match="boom"):
        _par_jobs(ok, boom)
    assert ran == ["ok"]


def test_fsck_reports_duplicate_doc_ids(spark, docs, tmp_path):
    """VERDICT r19 what's-wrong #4: the per-row _doc_state emits one
    index row per input row, so a dirty ingest (same doc_id twice)
    yields duplicate docs rows where the old groupBy merged them.
    fsck surfaces the count; a clean index reports 0/healthy."""
    from idhub_spark.operators.dedup_index import minhash_index_fsck

    path = str(tmp_path / "mh_dup")
    hist = docs.limit(30)
    minhash_index_write(hist, path, n_hashes=8, bands=2,
                        pb_buckets=4, db_buckets=4)
    rep = minhash_index_fsck(spark, path)
    assert rep["duplicate_doc_ids"] == 0
    assert rep["healthy"]

    # dirty ingest: re-append 5 ids the index already holds
    minhash_index_append(hist.limit(5), path, mode="direct")
    rep2 = minhash_index_fsck(spark, path)
    assert rep2["duplicate_doc_ids"] == 5
    assert not rep2["healthy"]
    assert any("doc_id" in f for f in rep2["findings"])

    # the planted dup is visible through the DELTA layer too
    minhash_index_append(hist.limit(2), path, mode="delta")
    rep3 = minhash_index_fsck(spark, path)
    assert rep3["duplicate_doc_ids"] == 5  # same 5 ids, now 3 rows for 2
