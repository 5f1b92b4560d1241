"""Tests for the API facade (§3.4 route parity) and reporting layer."""

from __future__ import annotations

from pyspark.sql import functions as F

from idhub_spark.api import get_subject, register_subjects, withdraw_subject
from idhub_spark.reports import (
    change_history,
    find_duplicate_subjects,
    resolution_stats,
)


def test_register_subjects_contract(spark):
    registry = spark.createDataFrame(
        [("KNOWN-1", "GSID-K1", "2020-01-01")],
        ["local_subject_id", "global_subject_id", "created_at"],
    )
    reqs = spark.createDataFrame(
        [("r1", "known-1", None), ("r2", "FRESH-9", "FRESH-ALT"),
         ("r3", None, " NA ")],  # no usable candidate at all
        ["request_id", "consortium_id", "site_id"],
    )
    out = {
        r.request_id: r
        for r in register_subjects(
            spark, reqs, registry,
            candidates={"consortium_id": "consortium", "site_id": "site"},
        ).collect()
    }
    assert out["r1"].action == "link_existing"
    assert out["r1"].global_subject_id == "GSID-K1"
    assert out["r1"].identifiers_linked == 1
    assert out["r2"].action == "create_new"
    assert out["r2"].identifiers_linked == 2
    assert out["r2"].conflicts is False
    # one row per REQUEST: an all-null/sentinel candidate set comes
    # back as an explicit error response, not a silently missing row
    assert len(out) == 3
    assert out["r3"].action == "error_no_identifiers"
    assert out["r3"].global_subject_id is None
    assert out["r3"].identifiers_linked == 0


def test_get_and_withdraw_subject(spark):
    subjects = spark.createDataFrame(
        [("G1", 1, False, None), ("G2", 2, False, None)],
        "global_subject_id string, center_id int, withdrawn boolean, updated_at timestamp",
    )
    local_ids = spark.createDataFrame(
        [(1, "A", "t", "G1", "2020-01-02"), (1, "B", "t", "G1", "2020-01-01"),
         (1, "C", "t", "G1", "2019-06-01"), (1, "D", "t", "G1", "2021-03-01")],
        ["center_id", "local_subject_id", "identifier_type", "global_subject_id", "created_at"],
    )
    centers = spark.createDataFrame([(1, "Mount Sinai")], ["center_id", "center_name"])
    # repartition to many partitions: a pre-aggregation .sort() would
    # NOT survive the shuffle; ordering must come from array_sort
    row = get_subject(subjects, local_ids.repartition(8), centers, "G1").collect()[0]
    assert row.center_name == "Mount Sinai"
    # oldest-first identifier ordering (routes.py:121-130)
    assert [i.local_subject_id for i in row.identifiers] == ["C", "B", "A", "D"]

    after = {r.global_subject_id: r for r in withdraw_subject(subjects, "G2").collect()}
    assert after["G2"].withdrawn is True and after["G1"].withdrawn is False
    assert after["G2"].updated_at is not None


def test_reports(spark):
    res = spark.createDataFrame(
        [
            ("link_existing", "exact", "0.99", True, 1, "2024-01-02"),
            ("link_existing", "exact", "0.97", False, 1, "2024-01-03"),
            ("create_new", None, "1.0", False, 2, "2024-01-04"),
        ],
        ["action", "match_strategy", "confidence", "requires_review", "center_id", "created_at"],
    )
    stats = {
        (r.action, r.match_strategy): r
        for r in resolution_stats(res, since="2024-01-01").collect()
    }
    assert stats[("link_existing", "exact")].n == 2
    assert abs(stats[("link_existing", "exact")].avg_confidence - 0.98) < 1e-9

    lids = spark.createDataFrame(
        [(1, "A", "t", "G1"), (2, "a", "t", "G2"), (1, "B", "t", "G3")],
        ["center_id", "local_subject_id", "identifier_type", "global_subject_id"],
    )
    dups = find_duplicate_subjects(lids).collect()
    assert len(dups) == 1 and dups[0].gsids == ["G1", "G2"]

    audit = spark.createDataFrame(
        [("t1", "f1", "2024-01-01"), ("t1", "f2", "2024-01-03"), ("t2", "f3", "2024-01-02")],
        ["table_name", "field", "changed_at"],
    ).withColumn("changed_at", F.col("changed_at").cast("timestamp"))
    top = change_history(audit, limit=2).collect()
    assert [r.field for r in top] == ["f2", "f3"]


def test_per_center_summary_from_resolution_log(spark):
    """The canonical chain: resolve -> resolution_log (with
    input_center_id attached per record) -> per_center_summary — the
    three pieces agree on the row shape (01-schema.sql:689-701 groups
    on input_center_id)."""
    from idhub_spark.operators.identity import resolution_log, resolve_identities
    from idhub_spark.reports import per_center_summary

    registry = spark.createDataFrame(
        [("KNOWN-1", "GSID-K1", "2020-01-01")],
        ["local_subject_id", "global_subject_id", "created_at"],
    )
    ids = spark.createDataFrame(
        [(1, "KNOWN-1", "t"), (2, "FRESH-2", "t")],
        ["record_key", "local_subject_id", "identifier_type"],
    )
    resolved = resolve_identities(ids, registry)
    input_centers = spark.createDataFrame(
        [(1, 5), (2, 7)], ["record_key", "input_center_id"]
    )
    log = resolution_log(resolved, batch_id="b9", input_centers=input_centers)
    centers = spark.createDataFrame(
        [(5, "Mount Sinai"), (7, "Cedars")], ["center_id", "center_name"]
    )
    out = {r.center_id: r for r in per_center_summary(log, centers).collect()}
    assert out[5].center_name == "Mount Sinai" and out[5].n_resolutions == 1
    assert out[7].center_name == "Cedars" and out[7].n_resolutions == 1
    # without input_centers the column still exists (NULL), so the
    # report never raises UNRESOLVED_COLUMN on canonical log rows
    bare = resolution_log(resolved, batch_id="b9")
    assert "input_center_id" in bare.columns
    assert per_center_summary(bare, centers).count() == 1  # one NULL group


def test_health_endpoint(spark, tmp_path):
    """GET /health parity: healthy session + readable registry ->
    'connected'; a registry whose files vanished reports unhealthy
    instead of raising (routes.py:82-96 returns 503, never crashes)."""
    import shutil

    from idhub_spark.api import health

    reg = spark.createDataFrame([("GSID-1",)], ["global_subject_id"])
    assert health(spark, reg) == {"status": "healthy", "database": "connected"}
    assert health(spark) == {"status": "healthy", "database": "connected"}

    # a registry that resolved at plan time but whose files are gone at
    # execution time (the mid-flight outage a health check exists for)
    root = str(tmp_path / "reg")
    reg.write.parquet(root)
    broken = spark.read.parquet(root)
    shutil.rmtree(root)
    out = health(spark, broken)
    assert out["status"] == "unhealthy"
