"""Driver-contract smoke tests: entry() + every queries() entry runs on
a bare SparkSession (no engine-specific builder configs) and returns a
stable schema with ≥0 rows at sf0.001."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod

pytestmark = pytest.mark.smoke

SF = "/root/testdata/sf0.001"


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns[0] == "l_returnflag"


@pytest.mark.parametrize("name", sorted(entry_mod.queries()))
def test_query_runs_sf0001(spark, name):
    df = entry_mod.queries()[name](spark, SF)
    assert df.count() >= 0


def test_oracles_cover_queries():
    qs = set(entry_mod.queries())
    oracles = set(entry_mod.oracle_sql())
    assert oracles <= qs
    # every query is oracle-gated (bit votes and float buckets replay in
    # DuckDB via ('0x'||hex)::BIGINT arithmetic)
    assert qs - oracles == set()


def test_registry_fits_driver_window():
    # The driver's correctness gate records at most 50 queries; a 51st
    # entry silently falls off the gate (it happened to q_shingle_edges
    # in round 5).  New queries must merge into composites instead.
    assert len(entry_mod.queries()) <= 50
