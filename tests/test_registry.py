"""Registry hygiene: the hand-curated driver window must fail LOUDLY.

`_DRIVER_ORDER` is rewritten by hand every round (CLAUDE.md rotation
math), and the driver checks exactly its first 50 entries for
correctness evidence. Before r18 a typo'd or retired-but-not-removed
name was silently filtered out of the window — shrinking it below 50
and sliding an arbitrary alphabetical query into the vacated slot, so
the intended row got no evidence and expired under the 3-round
policy. `_check_driver_order` now raises on every `_ordered()` call
(i.e. before `queries()`/`oracle_sql()` hand the driver a window).
It deliberately does NOT run at module import: a direct plan-module
import re-enters queries.py while the plan package is mid-import and
REGISTRY is only partially populated, so an import-time check raises
spuriously on valid windows — pinned below with a fresh interpreter.
"""

import subprocess
import sys

import pytest

from idhub_spark.queries import _DRIVER_ORDER, REGISTRY, _check_driver_order


def test_current_window_passes_guard():
    _check_driver_order(_DRIVER_ORDER, REGISTRY)
    assert len(_DRIVER_ORDER) == 50
    assert len(set(_DRIVER_ORDER)) == 50
    assert set(_DRIVER_ORDER) <= set(REGISTRY)


def test_guard_rejects_unknown_name():
    with pytest.raises(ValueError, match="not in REGISTRY.*no_such_query"):
        _check_driver_order([*_DRIVER_ORDER, "no_such_query"], REGISTRY)


def test_guard_rejects_duplicate_name():
    with pytest.raises(ValueError, match="duplicate"):
        _check_driver_order(
            [*_DRIVER_ORDER, _DRIVER_ORDER[0]], REGISTRY
        )


def test_queries_surface_guarded():
    """The driver-facing surfaces run the guard before returning a
    window."""
    from idhub_spark import queries as q

    qs = q.queries()
    assert list(qs)[:50] == _DRIVER_ORDER
    assert set(q.oracle_sql()) <= set(qs)


def test_direct_plan_import_does_not_trip_guard():
    """Importing a plan module FIRST (fresh interpreter, nothing else
    loaded) re-enters queries.py mid-plan-package-import with a
    partially populated REGISTRY; the guard must not fire there. The
    conftest masks this in-suite by importing queries first, so pin it
    in a subprocess."""
    code = (
        "import idhub_spark.plans.dedup_q\n"
        "from idhub_spark.queries import queries, _DRIVER_ORDER\n"
        "assert list(queries())[:50] == _DRIVER_ORDER\n"
        "print('ok')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=120,
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.strip() == "ok"
