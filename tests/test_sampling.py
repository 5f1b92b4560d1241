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
