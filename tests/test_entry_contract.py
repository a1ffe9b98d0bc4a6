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


def test_agg_cents_equivalence(spark):
    """r9: the cents-based q_agg_pricing_summary must be bit-identical
    to the original decimal(18,2)-sum formulation on every SF the
    driver checks (the money columns are 2-decimal by data contract,
    so integer-cents sums + one exact decimal division per group
    reproduce the decimal semantics exactly)."""
    from pyspark.sql import functions as F

    def legacy(li):
        dec = lambda c: F.col(c).cast("decimal(18,2)")
        return (li.filter(F.col("l_shipdate") <= "1998-09-02")
                .groupBy("l_returnflag", "l_linestatus")
                .agg(F.sum(dec("l_quantity")).cast("double")
                     .alias("sum_qty"),
                     F.sum(dec("l_extendedprice")).cast("double")
                     .alias("sum_base_price"),
                     F.sum(dec("l_extendedprice") *
                           (F.lit(1).cast("decimal(18,2)")
                            - dec("l_discount"))).cast("double")
                     .alias("sum_disc_price"),
                     F.count("*").alias("count_order"))
                .orderBy("l_returnflag", "l_linestatus"))

    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        # per-row premise: round(x*100) == decimal(18,2) unscaled cents
        bad = li.filter(
            (F.round(F.col("l_quantity") * 100).cast("long") !=
             (F.col("l_quantity").cast("decimal(18,2)") * 100)
             .cast("long")) |
            (F.round(F.col("l_extendedprice") * 100).cast("long") !=
             (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
             .cast("long")) |
            (F.round(F.col("l_discount") * 100).cast("long") !=
             (F.col("l_discount").cast("decimal(18,2)") * 100)
             .cast("long"))).count()
        assert bad == 0, sf_dir
        got = entry_mod.q_agg_pricing_summary(spark, sf_dir).collect()
        want = legacy(li).collect()
        assert got == want, sf_dir
