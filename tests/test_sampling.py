"""Tests for deterministic sampling/splitting operators."""

from __future__ import annotations

from idhub_spark.operators.sampling import (
    downsample_majority,
    stratified_take,
    train_test_split,
)


def _docs(spark):
    return spark.createDataFrame(
        [(i, "en" if i % 3 else "de", f"text {i}") for i in range(300)],
        ["doc_id", "lang", "text"],
    )


def test_split_disjoint_total_and_stable(spark):
    df = _docs(spark)
    train, test = train_test_split(df, "doc_id", test_pct=20)
    tr = {r.doc_id for r in train.collect()}
    te = {r.doc_id for r in test.collect()}
    assert tr.isdisjoint(te)
    assert len(tr) + len(te) == 300
    assert 30 <= len(te) <= 90  # ~20% of 300, hash-uniform slack

    # stability: repartitioned input produces the identical split
    train2, test2 = train_test_split(df.repartition(13), "doc_id", test_pct=20)
    assert {r.doc_id for r in test2.collect()} == te


def test_stratified_take_exact_n(spark):
    out = stratified_take(_docs(spark), strata="lang", key="doc_id", n_per_stratum=7)
    counts = {}
    for r in out.collect():
        counts[r.lang] = counts.get(r.lang, 0) + 1
    assert counts == {"en": 7, "de": 7}
    # deterministic membership
    again = stratified_take(
        _docs(spark).repartition(5), strata="lang", key="doc_id", n_per_stratum=7
    )
    assert {r.doc_id for r in again.collect()} == {r.doc_id for r in out.collect()}


def test_downsample_majority_only_hits_target_label(spark):
    df = _docs(spark)
    out = downsample_majority(df, label="lang", key="doc_id", keep_pct={"en": 10})
    counts = {}
    for r in out.collect():
        counts[r.lang] = counts.get(r.lang, 0) + 1
    assert counts["de"] == 100  # untouched
    assert counts["en"] < 60  # ~10% of 200 kept


def test_pack_sequences_contiguous(spark):
    """Packing invariants: within each shard the documents tile the
    token stream with no gaps or overlaps, and (seq_id, offset_in_seq)
    is exactly the decomposition of the running offset by seq_len."""
    from pyspark.sql import functions as F

    from idhub_spark.operators.sampling import pack_sequences

    rows = [(i, "w " * (i % 7) + "w") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pack_sequences(
        df, key="doc_id", token_count=F.size(F.split("text", " ")),
        n_shards=4, seq_len=10,
    ).collect()
    assert len(out) == 60
    by_shard = {}
    for r in out:
        assert 0 <= r.offset_in_seq < 10
        by_shard.setdefault(r.shard, []).append(r)
    for shard, docs in by_shard.items():
        docs.sort(key=lambda r: (r.seq_id, r.offset_in_seq))
        expect = 0
        for r in docs:
            assert r.seq_id * 10 + r.offset_in_seq == expect, (shard, r)
            expect += r.n_tokens


def test_sample_frames_short_payloads_yield_no_rows(spark):
    """Payloads shorter than one 16-byte frame (including empty) emit
    ZERO frames — sequence(0, -1) would otherwise produce the
    descending [0, -1] and two spurious rows; trailing partial frames
    are dropped at every length."""
    from idhub_spark.operators.multimodal import sample_frames

    df = spark.createDataFrame(
        [(1, b"x" * 40), (2, b"short"), (3, b""), (4, b"y" * 16)],
        "doc_id long, payload binary",
    )
    got = {}
    for r in sample_frames(df, every=1).collect():
        got.setdefault(r.doc_id, []).append((r.frame_no, r.frame_bytes))
    assert got == {1: [(0, 16), (1, 16)], 4: [(0, 16)]}  # 2 and 3 absent


def test_byte_histogram_features_exact(spark):
    """mapInPandas byte histogram equals a direct numpy recompute and
    sums to 1.0; empty payloads give the zero vector."""
    import numpy as np
    from pyspark.sql import functions as F

    from idhub_spark.operators.multimodal import byte_histogram_features

    rows = [(1, b"abcabc"), (2, bytes(range(256))), (3, b"")]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r.features for r in byte_histogram_features(df).collect()}
    for doc_id, payload in rows:
        arr = np.frombuffer(payload, dtype=np.uint8)
        if arr.size == 0:
            assert got[doc_id] == [0.0] * 16
            continue
        expect = (np.bincount(arr // 16, minlength=16)[:16] / arr.size).tolist()
        assert got[doc_id] == expect, doc_id
        assert abs(sum(got[doc_id]) - 1.0) < 1e-12


def test_resize_image_raster_kernel(spark):
    """kernel='raster' runs the pure-numpy kernel REGARDLESS of PIL
    importability: nearest-neighbor out[r,c] = img[(r*side)//H,
    (c*side)//W] over the isqrt-side grayscale interpretation; empty
    payload -> zero bytes. An unknown kernel name is rejected."""
    import pytest

    from idhub_spark.operators.multimodal import resize_image

    rows = [
        (1, bytes(range(16))),  # 4x4 raster
        (2, bytes(range(17))),  # 17 bytes: side=4, 17th byte truncated
        (3, b""),  # empty -> zeros
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    with pytest.raises(ValueError, match="kernel"):
        resize_image(df, width=2, height=2, kernel="bicubic")
    out = resize_image(df, width=2, height=2, kernel="raster")
    assert [f.name for f in out.schema.fields] == ["doc_id", "payload", "width", "height"]
    got = {r.doc_id: bytes(r.payload) for r in out.collect()}
    # rows/cols picked: (r*4)//2 -> [0, 2]; flat indices [0,2,8,10]
    assert got[1] == bytes([0, 2, 8, 10])
    assert got[2] == bytes([0, 2, 8, 10])
    assert got[3] == bytes(4)
    dims = {(r.width, r.height) for r in out.collect()}
    assert dims == {(2, 2)}


def test_leakage_safe_split_no_pair_straddles(spark):
    """The split's defining invariant: no near-dup pair may land on
    different sides — verified directly against the pair set, and
    coverage/determinism hold (every corpus doc split exactly once,
    same assignment on a re-run)."""
    import idhub_spark.queries  # load the registry first: plan modules
    # cross-import and only initialize cleanly through this entry
    from idhub_spark.plans.dedup_q import (
        _corpus,
        leakage_safe_split,
        minhash_lsh_pairs,
    )
    from idhub_spark.queries import tables

    sf = "/root/testdata/sf0.001"
    out = leakage_safe_split(spark, sf).cache()
    t = tables(spark, sf, "documents")
    n_docs = _corpus(t).count()
    assert out.count() == n_docs
    side = {r.doc_id: r.split for r in out.collect()}
    pairs = minhash_lsh_pairs(_corpus(t)).select("doc_a", "doc_b").collect()
    assert pairs, "fixture must plant near-dup pairs"
    for p in pairs:
        assert side[p.doc_a] == side[p.doc_b], (p.doc_a, p.doc_b)
    # determinism: a second evaluation assigns identically
    again = {r.doc_id: r.split for r in leakage_safe_split(spark, sf).collect()}
    assert again == side
    out.unpersist()
