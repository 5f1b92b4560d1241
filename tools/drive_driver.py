"""Driver simulation — the pre-commit correctness gate.

Runs every `queries()` entry at sf0.01 against its DuckDB oracle and
compares columns / row counts / values order-insensitively, PLUS a
numeric-class check the driver's value-hash effectively enforces:
an integer column on one side vs a float column on the other (DuckDB
HUGEINT -> float64 from un-cast SUMs) breaks the driver's hash even
when values are numerically equal. int32-vs-int64 pairs are fine
(proven by green driver rows).

Usage: python tools/drive_driver.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

import __spark_entry__ as E
from idhub_spark.session import ALL_TABLES, get_spark

args = [a for a in sys.argv[1:] if not a.startswith("-")]
SF = args[0] if args else "/root/testdata/sf0.01"

if "--bare" in sys.argv:
    # exact driver replica: default confs, nothing from get_spark —
    # catches any conf-dependent behavior load_tables doesn't pin
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[8]").appName("driver_sim_bare").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
else:
    spark = get_spark("driver_sim", cpus=8)
con = duckdb.connect()
for t in ALL_TABLES:
    con.execute(
        f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
    )

from tests.conftest import _normalize as normalize  # noqa: E402

edf = E.entry(spark)
n = edf.count()
assert n >= 0
print(f"entry(): OK ({n} rows)")

qs = E.queries()
oracles = E.oracle_sql()
# --only=a,b,c restricts the sim to named queries (fast targeted
# re-verification while iterating; the full run stays the gate)
only = [a.split("=", 1)[1] for a in sys.argv[1:] if a.startswith("--only=")]
if only:
    wanted = set(only[0].split(","))
    unknown = wanted - set(qs)
    if unknown:
        raise SystemExit(f"--only names not registered: {sorted(unknown)}")
    qs = {k: v for k, v in qs.items() if k in wanted}
fail = []
for name in qs:
    try:
        got_df = qs[name](spark, SF)
        if name not in oracles:
            # Mimic the driver's rows-only path exactly: it does NOT
            # just count() — it pulls the frame and canonicalizes with
            # an all-column sort + value hash, which dies on
            # unhashable cells (array<...> columns: r2's
            # sketch_profile crash). Reproduce that here so the sim
            # catches the same class of failure.
            pdf = got_df.toPandas()
            pdf = pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)
            pd.util.hash_pandas_object(pdf, index=False)
            print(f"{name}: NO-ORACLE rows-only OK ({len(pdf)} rows)")
            continue
        got = normalize(got_df.toPandas())
        want = normalize(con.execute(oracles[name]).fetchdf())
        if list(got.columns) != list(want.columns):
            raise AssertionError(f"columns {list(got.columns)} vs {list(want.columns)}")
        if len(got) != len(want):
            raise AssertionError(f"rows {len(got)} vs {len(want)}")
        for c in got.columns:
            g, w = got[c], want[c]
            g_f, w_f = pd.api.types.is_float_dtype(g), pd.api.types.is_float_dtype(w)
            g_i, w_i = pd.api.types.is_integer_dtype(g), pd.api.types.is_integer_dtype(w)
            if (g_f and w_i) or (g_i and w_f):
                raise AssertionError(
                    f"numeric-class mismatch col {c}: {g.dtype} vs {w.dtype} "
                    "(CAST the oracle SUM to BIGINT or the Spark side to DOUBLE)"
                )
            if g_f and w_f:
                ok = (g.values == w.values) | (pd.isna(g.values) & pd.isna(w.values))
                if not ok.all():
                    bad = np.where(~ok)[0][:3]
                    raise AssertionError(
                        f"float col {c} differs: {g.values[bad]} vs {w.values[bad]}"
                    )
            else:
                pd.testing.assert_series_equal(
                    g, w, check_dtype=False, check_names=False
                )
        print(f"{name}: MATCH ({len(got)} rows)")
    except Exception as ex:  # noqa: BLE001
        msg = str(ex).split("\n")[0][:300]
        print(f"{name}: FAIL {msg}")
        fail.append(name)

print(f"\n{len(qs) - len(fail)}/{len(qs)} match; failures: {fail}")
sys.exit(1 if fail else 0)
