"""Shared fixtures: one SparkSession per test session, a DuckDB
connection with the synthetic tables registered, and the
oracle-compare helper that mirrors the driver's correctness gate
(row count + schema-width + order-insensitive exact values)."""

from __future__ import annotations

import datetime
import decimal
import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from idhub_spark.session import ALL_TABLES, get_spark

SF_DIR = os.environ.get("IDHUB_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("idhub_spark_tests", cpus=os.environ.get("IDHUB_TEST_CPUS", "8"))
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in ALL_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    """Canonical form for order-insensitive exact comparison.

    DuckDB's fetchdf and Spark's toPandas disagree on nullable dtypes
    (BooleanDtype/Int64 vs object-with-None), so everything that isn't
    float/int/datetime canonicalizes to str-or-None."""
    out = pdf.copy()
    for c in out.columns:
        s = out[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            out[c] = s.astype("datetime64[us]")
            continue
        if isinstance(s.dtype, pd.api.extensions.ExtensionDtype):
            s = s.astype(object).where(s.notna(), None)
        if s.dtype == bool:
            s = s.astype(object)
        if s.dtype == object:
            first = s.dropna().iloc[0] if s.notna().any() else None
            if isinstance(first, decimal.Decimal):
                # DuckDB hands DECIMAL back as float64; match it
                out[c] = s.astype("float64")
            elif isinstance(first, (datetime.date, datetime.datetime)):
                out[c] = pd.to_datetime(s).astype("datetime64[us]")
            else:
                # bools / arrays / strings -> str-or-None
                out[c] = s.map(
                    lambda v: None
                    if v is None or v is pd.NA or (isinstance(v, float) and v != v)
                    else str(v)
                )
        elif pd.api.types.is_float_dtype(s):
            out[c] = s.astype("float64")
        else:
            out[c] = s
    out = out.reindex(sorted(out.columns), axis=1)
    out = out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)
    return out


def assert_oracle_match(spark_df, duck_con, sql: str, name: str = "?"):
    got = _normalize(spark_df.toPandas())
    want = _normalize(duck_con.execute(sql).fetchdf())
    assert list(got.columns) == list(want.columns), (
        f"{name}: column mismatch {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g) and pd.api.types.is_float_dtype(w):
            ok = (g.values == w.values) | (pd.isna(g.values) & pd.isna(w.values))
            if not ok.all():
                bad = np.where(~ok)[0][:5]
                raise AssertionError(
                    f"{name}: float col {c} differs at rows {bad}: "
                    f"{g.values[bad]} vs {w.values[bad]}"
                )
        else:
            pd.testing.assert_series_equal(
                g, w, check_dtype=False, check_names=False, obj=f"{name}.{c}"
            )
