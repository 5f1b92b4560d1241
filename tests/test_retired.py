"""Retired-but-pinned queries: rows displaced from the driver registry
(50-slot rotation-window economics, r13) whose plans and oracles stay
oracle-exact in CI. Each entry here was retired because a LIVE registry
row already hash-verifies the same mechanism:

- grouped_zscore_native — byte-identical oracle and output to the
  registered grouped_zscore (the applyInPandas path keeps the driver
  row; it pins the harder claim — Python grouped-map bit-determinism).
- ann_topk_bucketed — its single-bucket candidate join is executed and
  hash-verified inside the registered ann_recall_at_k, and
  ann_topk_multiprobe supersets the probe (Hamming<=1 ⊇ Hamming=0).
- large_orders / order_priority_check / idle_customers — retired r18
  (VERDICT r17 ask #2: break the deferral-debt cycle by RETIRING
  low-information TPC-H-parity rows instead of rolling deferrals).
  Q18's aggregate→HAVING→join-back is pinned by avg_yearly_small_qty
  and returned_item_report; Q4's EXISTS-as-left-semi by
  keyed_lookup_semi and order_priority_pivot; Q22's NOT-EXISTS-as-
  left-anti by conflict_exclusion / orphan_detection and its broadcast
  scalar threshold by lsh_recall_eval / weighted_mixture_sample.

If one of these regresses here, re-register it before shipping the fix
(a broken mechanism must not hide behind a retired row).
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR, assert_oracle_match


def _retired():
    from idhub_spark.plans.similarity_q import (
        ANN_TOPK_BUCKETED_ORACLE,
        ann_topk_bucketed,
    )
    from idhub_spark.plans.stats_q import (
        GROUPED_ZSCORE_NATIVE_ORACLE,
        grouped_zscore_native,
    )
    from idhub_spark.plans.tpch import (
        IDLE_CUSTOMERS_ORACLE,
        LARGE_ORDERS_ORACLE,
        ORDER_PRIORITY_CHECK_ORACLE,
        idle_customers,
        large_orders,
        order_priority_check,
    )

    return {
        "grouped_zscore_native": (
            grouped_zscore_native,
            GROUPED_ZSCORE_NATIVE_ORACLE,
        ),
        "ann_topk_bucketed": (ann_topk_bucketed, ANN_TOPK_BUCKETED_ORACLE),
        "large_orders": (large_orders, LARGE_ORDERS_ORACLE),
        "order_priority_check": (
            order_priority_check,
            ORDER_PRIORITY_CHECK_ORACLE,
        ),
        "idle_customers": (idle_customers, IDLE_CUSTOMERS_ORACLE),
    }


@pytest.mark.parametrize("name", sorted(_retired()))
def test_retired_query_matches_oracle(name, spark, duck):
    fn, oracle = _retired()[name]
    assert_oracle_match(fn(spark, SF_DIR), duck, oracle, name=name)


def test_retired_not_registered():
    """A retirement is a displacement decision, not a deletion — but a
    re-registration must be deliberate (it changes the rotation math),
    so pin the current state."""
    from idhub_spark.queries import REGISTRY

    for name in (
        "grouped_zscore_native",
        "ann_topk_bucketed",
        "sketch_profile",
        "large_orders",
        "order_priority_check",
        "idle_customers",
    ):
        assert name not in REGISTRY
