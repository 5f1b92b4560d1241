"""Registry hygiene: the hand-curated driver window must fail LOUDLY.

`_DRIVER_ORDER` is rewritten by hand every round (CLAUDE.md rotation
math), and the driver checks exactly its first 50 entries for
correctness evidence. Before r18 a typo'd or retired-but-not-removed
name was silently filtered out of the window — shrinking it below 50
and sliding an arbitrary alphabetical query into the vacated slot, so
the intended row got no evidence and expired under the 3-round
policy. `_check_driver_order` now raises at import; these tests pin
the guard itself (queries.py's duplicate/stacked/arity registration
guards are exercised implicitly by the package importing at all).
"""

import pytest

from idhub_spark.queries import _DRIVER_ORDER, REGISTRY, _check_driver_order


def test_current_window_passes_guard():
    # the import itself already ran the guard; re-assert the invariants
    # the driver depends on so a future guard refactor can't weaken them
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
