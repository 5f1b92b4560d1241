"""Local replica of the driver's t2 correctness gate: run every
registered query on Spark and its oracle SQL on DuckDB over the same
parquet, compare exactly (order-insensitive). Queries without an
oracle get a rows-run smoke check."""

from __future__ import annotations

import pytest

from idhub_spark.queries import REGISTRY
from tests.conftest import SF_DIR, assert_oracle_match

# the 146-query oracle replica: slow-marked (driver-window default
# skips it; the driver's own sf0.01/sf0.1 sims cover the same gate,
# and the round gate runs the full set with -m "")
pytestmark = pytest.mark.slow


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, duck):
    spec = REGISTRY[name]
    df = spec.fn(spark, SF_DIR)
    if spec.oracle is None:
        assert df.count() >= 0  # smoke: plan executes
    else:
        assert_oracle_match(df, duck, spec.oracle, name=name)
