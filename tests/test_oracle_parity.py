"""Local mirror of the driver's t2 correctness gate: run each
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over the
same parquet tables, then compare row count + column names + values
(order-insensitive, EXACT values — mirrors the driver's hash gate).
"""

from __future__ import annotations


import os
from decimal import Decimal

import duckdb
import pytest

import __spark_entry__ as entry_mod

pytestmark = pytest.mark.smoke

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def _duck():
    con = duckdb.connect()
    for t in entry_mod.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        return v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def _row_key(row):
    out = []
    for v in row:
        v = _norm(v)
        if v is None:
            out.append((0, ""))
        elif isinstance(v, bool):
            out.append((1, str(v)))
        elif isinstance(v, (int, float)):
            out.append((2, round(float(v), 6)))
        else:
            out.append((3, str(v)))
    return tuple(out)


def _values_close(a, b):
    # EXACT comparison, floats included (repr equality = bit equality
    # for finite doubles): the driver's hard gate hashes values, so a
    # last-ulp drift that a tolerance would forgive still fails there —
    # every query is engineered for bit-exactness (decimal sums,
    # integer-cent money, floor-based rounding), and this test must
    # fail exactly when the driver's hash would.
    a, b = _norm(a), _norm(b)
    if isinstance(a, float) or isinstance(b, float):
        if a is None or b is None:
            return a is None and b is None
        return repr(float(a)) == repr(float(b))
    return a == b


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_oracle_parity(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    spark_rows = df.collect()
    spark_cols = df.columns

    if name not in ORACLES:
        # rows-only check (non-SQL-expressible op)
        assert len(spark_rows) >= 0
        return

    con = _duck()
    res = con.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: columns {spark_cols} vs {duck_cols}")
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: rows {len(spark_rows)} vs {len(duck_rows)}")

    # order-insensitive: sort both by normalized key over name-sorted cols
    order = sorted(range(len(spark_cols)),
                   key=lambda i: spark_cols[i])
    duck_order = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
    s_sorted = sorted(([_norm(r[spark_cols[i]]) for i in order]
                       for r in spark_rows), key=_row_key)
    d_sorted = sorted(([_norm(r[i]) for i in duck_order]
                      for r in duck_rows), key=_row_key)
    mismatches = 0
    first = None
    for sr, dr in zip(s_sorted, d_sorted):
        for sv, dv in zip(sr, dr):
            if not _values_close(sv, dv):
                mismatches += 1
                if first is None:
                    first = (sr, dr)
                break
    assert mismatches == 0, (
        f"{name}: {mismatches}/{len(s_sorted)} mismatched rows; "
        f"first: spark={first[0]} duck={first[1]}")
