"""Tests for the local_subject_ids center-migration merge (§2.10.5)
and the LabKey specimen sync (J10)."""

from __future__ import annotations

from pyspark.sql import functions as F

from idhub_spark.operators.local_ids import merge_local_subject_ids
from idhub_spark.pipelines.labkey_sync import labkey_sync

COLS = ["center_id", "local_subject_id", "identifier_type", "global_subject_id"]


def test_local_ids_merge_paths(spark):
    current = spark.createDataFrame(
        [
            (1, "A", "t", "G1"),  # unchanged
            (1, "B", "t", "G2"),  # gsid update
            (1, "C", "t", "G3"),  # center migration
            (1, "D", "t", "G4"),  # duplicate pair -> cleanup
            (2, "D", "t", "G5"),
            (9, "KEEP", "t", "G9"),  # not in incoming -> kept
        ],
        COLS,
    )
    incoming = spark.createDataFrame(
        [
            (1, "a", "t", "G1"),  # case-insensitive match, unchanged
            (1, "B", "t", "G2NEW"),
            (3, "C", "t", "G3"),
            (1, "D", "t", "G4"),
            (5, "NEW", "t", "G6"),  # insert
        ],
        COLS,
    )
    res = merge_local_subject_ids(incoming, current)
    merged = {(r.local_subject_id.upper(), r.identifier_type): r for r in res.merged.collect()}

    assert len(merged) == 6  # A,B,C,D(one row),KEEP,NEW
    assert merged[("A", "t")].global_subject_id == "G1"
    assert merged[("A", "t")].center_id == 1
    assert merged[("B", "t")].global_subject_id == "G2NEW"
    assert merged[("C", "t")].center_id == 3  # migrated
    assert merged[("D", "t")].center_id == 1  # dup collapsed to one row
    assert merged[("KEEP", "t")].global_subject_id == "G9"
    assert merged[("NEW", "t")].center_id == 5

    changes = {r.local_subject_id: r.change for r in res.audit.collect()}
    assert changes == {
        "B": "gsid_update",
        "C": "center_migration",
        "D": "dedup_rewrite",
    }


def test_local_ids_unknown_center_never_downgrades(spark):
    """center 0 = unknown (gsid-service/services/identity_resolution
    .py:222-245): an incoming 0 keeps the existing real center (the
    row still gsid-updates), while an existing 0 upgrades to a real
    incoming center via the normal migration path."""
    current = spark.createDataFrame(
        [(5, "A", "t", "G1"), (0, "B", "t", "G2")], COLS
    )
    incoming = spark.createDataFrame(
        [(0, "A", "t", "G1NEW"), (7, "B", "t", "G2")], COLS
    )
    res = merge_local_subject_ids(incoming, current)
    merged = {r.local_subject_id: r for r in res.merged.collect()}
    assert merged["A"].center_id == 5  # unknown incoming kept real center
    assert merged["A"].global_subject_id == "G1NEW"  # gsid still updated
    assert merged["B"].center_id == 7  # unknown existing upgraded
    changes = {r.local_subject_id: r.change for r in res.audit.collect()}
    assert changes == {"A": "gsid_update", "B": "center_migration"}


def test_local_ids_merge_idempotent(spark):
    current = spark.createDataFrame([(1, "A", "t", "G1")], COLS)
    res = merge_local_subject_ids(current, current)
    assert res.audit.count() == 0
    assert res.merged.count() == 1


def test_labkey_sync(spark):
    specimen = spark.createDataFrame(
        [
            ("S1", "GS-1", "blood", True, None),
            ("S2", "GS-2", "dna", True, None),
            ("S3", "GS-3", "lcl", True, 1999),
            ("S4", "GS-4", "blood", False, 2018),  # already unavailable
            ("S5", "GS-5", "dna", True, 2017),
        ],
        "sample_id string, global_subject_id string, sample_type string, "
        "sample_available boolean, year_collected int",
    )
    labkey = spark.createDataFrame(
        [
            ("S1", "Consumed", "2020-03-04"),
            ("S2", "available", "2021-07-01"),
            # non-consumed status must NOT reset availability to true,
            # and a present date still updates the year
            ("S4", "Available", "2022-05-05"),
            # NULL status + NULL date: both fields keep current values
            ("S5", None, None),
            ("SX", "consumed", "2020-01-01"),  # unknown sample: semi-join drops
        ],
        ["sample_id", "status", "collected_date"],
    ).withColumn("collected_date", F.col("collected_date").cast("timestamp"))

    res = labkey_sync(specimen, labkey)
    rows = {r.sample_id: r for r in res.merged.collect()}
    assert rows["S1"].sample_available is False and rows["S1"].year_collected == 2020
    assert rows["S2"].sample_available is True and rows["S2"].year_collected == 2021
    assert rows["S3"].year_collected == 1999  # untouched
    # the reference only ever sets sample_available=false (on consumed);
    # an 'Available' status leaves a consumed specimen consumed
    assert rows["S4"].sample_available is False and rows["S4"].year_collected == 2022
    # NULL status / NULL date write nothing (specimen_updater.py:57-66)
    assert rows["S5"].sample_available is True and rows["S5"].year_collected == 2017
    assert "SX" not in rows
    audit_fields = {(a.record_key["sample_id"], a.field) for a in res.audit.collect()}
    assert ("S1", "sample_available") in audit_fields
