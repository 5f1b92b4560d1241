"""Randomized invariants for batch identity resolution (SURVEY.md §5
rebuild strategy: determinism + within-batch agreement + registry
linking over seeded random identifier-sharing graphs).

Deliberately seeded-random rather than hypothesis-driven: each
resolution run costs several Spark jobs (the CC loop), so a shrinking
property framework multiplies minutes; five seeded graphs cover the
same component shapes reproducibly.
"""

from __future__ import annotations

import random

COLS = ["record_key", "local_subject_id", "identifier_type"]
REG_COLS = ["local_subject_id", "global_subject_id", "created_at"]


def _scenario(seed: int):
    rng = random.Random(seed)
    n_records, n_ids = rng.randint(4, 14), rng.randint(3, 8)
    edges = sorted(
        {
            (rng.randrange(n_records), rng.randrange(n_ids))
            for _ in range(rng.randint(n_records, n_records * 2))
        }
    )
    registry_ids = sorted(rng.sample(range(n_ids), rng.randint(0, min(3, n_ids))))
    return edges, registry_ids


def test_resolution_invariants_randomized(spark):
    from idhub_spark.operators.identity import resolve_identities

    for seed in range(5):
        edges, registry_ids = _scenario(seed)
        ids = spark.createDataFrame(
            [(rec, f"ID-{i}", "t") for rec, i in edges], COLS
        )
        reg_rows = [
            (f"id-{i}", f"GSID-REG{i:04d}AAAAAAAAA", f"20{10 + i}-01-01")
            for i in registry_ids
        ]
        registry = (
            spark.createDataFrame(reg_rows, REG_COLS)
            if reg_rows
            else spark.createDataFrame(
                [], "local_subject_id string, global_subject_id string, created_at string"
            )
        )
        out = {r.record_key: r for r in resolve_identities(ids, registry).collect()}

        # total: every record resolves to exactly one non-null GSID
        assert set(out) == {rec for rec, _ in edges}, f"seed {seed}"
        assert all(r.global_subject_id for r in out.values()), f"seed {seed}"

        # within-batch agreement: records sharing an identifier agree
        by_id: dict[int, list[int]] = {}
        for rec, i in edges:
            by_id.setdefault(i, []).append(rec)
        for i, recs in by_id.items():
            gsids = {out[r].global_subject_id for r in recs}
            assert len(gsids) == 1, f"seed {seed}: id {i} records {recs} -> {gsids}"

        # registry linking: a record holding a registered id adopts a
        # registry GSID (case-insensitively), never mints
        for rec, i in edges:
            if i in registry_ids:
                assert out[rec].global_subject_id.startswith("GSID-REG"), (
                    f"seed {seed}: record {rec} id {i}"
                )
