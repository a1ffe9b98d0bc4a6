"""Stable-sort guarantees under multi-partition execution (VERDICT r3
next #7).  The reference sorts with Rust's stable ``Vec::sort_by``
(``transform.rs:646-691``); this engine claims the same stability via
input-order index tiebreakers:

- ``finalize.sort`` → ``orderBy(key, __idx__)`` where ``__idx__`` comes
  from ``_zip_with_index`` (per-partition offsets, no global window);
- array op ``sort_by`` → ``array_sort`` with an element-index
  tiebreaker inside the comparator.

Both are exercised with HEAVY key ties over >1 (up to 32) partitions —
the regime where an unstable shuffle would scramble tied runs.
"""

from __future__ import annotations

import json
import random

from pyspark.sql import functions as F

from rulemorph_spark.engine import transform, transform_table


def test_zip_with_index_matches_line_order_multi_partition(spark, tmp_path):
    """The load-bearing assumption: a single NDJSON file split into
    many byte-range partitions still gets a dense 0-based index in
    LINE order (partition ids follow split offsets)."""
    n = 20_000
    p = tmp_path / "rows.ndjson"
    with open(p, "w") as f:
        for i in range(n):
            f.write(json.dumps({"i": i, "pad": "x" * 40}) + "\n")
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(16 * 1024))
    try:
        from rulemorph_spark.engine import records_from_json_file
        df = records_from_json_file(spark, str(p), records_path=None)
        assert df.rdd.getNumPartitions() > 4  # the test premise
        rows = (df.select("__idx__",
                          F.variant_get("__record__", "$.i", "long")
                          .alias("i")).collect())
        assert {r["__idx__"]: r["i"] for r in rows} \
            == {i: i for i in range(n)}
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_finalize_sort_stable_under_heavy_ties(spark, tmp_path):
    """3 distinct keys over 6000 records read in many partitions:
    within each key, input order must be preserved exactly."""
    n, k = 6_000, 3
    rng = random.Random(42)
    keys = [rng.randrange(k) for _ in range(n)]
    p = tmp_path / "docs.ndjson"
    with open(p, "w") as f:
        for i, key in enumerate(keys):
            f.write(json.dumps({"seq": i, "key": key,
                                "pad": "y" * 40}) + "\n")
    rule = """
version: 2
input: {format: json}
mappings:
  - target: seq
    source: seq
  - target: key
    source: key
finalize:
  sort: {by: key, order: asc}
"""
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(16 * 1024))
    try:
        out = transform(spark, rule, input_path=str(p))
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
    # reference semantics: stable sort == sorted-by-key with original
    # order preserved inside each tie run
    expect = sorted(({"seq": i, "key": key}
                     for i, key in enumerate(keys)),
                    key=lambda d: d["key"])  # python sort is stable
    assert out == expect


def test_finalize_sort_desc_stable(spark, tmp_path):
    n = 2_000
    rng = random.Random(7)
    keys = [rng.choice(["a", "b"]) for _ in range(n)]
    p = tmp_path / "d2.ndjson"
    with open(p, "w") as f:
        for i, key in enumerate(keys):
            f.write(json.dumps({"seq": i, "key": key,
                                "pad": "z" * 60}) + "\n")
    rule = """
version: 2
input: {format: json}
mappings:
  - target: seq
    source: seq
  - target: key
    source: key
finalize:
  sort: {by: key, order: desc}
"""
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(16 * 1024))
    try:
        out = transform(spark, rule, input_path=str(p))
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
    expect = sorted(({"seq": i, "key": key}
                     for i, key in enumerate(keys)),
                    key=lambda d: d["key"], reverse=True)
    assert out == expect


def test_sort_by_stable_within_rows_across_32_partitions(spark):
    """array op sort_by: element-index tiebreaker keeps tied elements
    in array order, identically on every row of a 32-partition table."""
    rng = random.Random(99)
    rows = []
    for rid in range(64):
        vals = [(i, rng.randrange(4)) for i in range(50)]
        rows.append((rid, [{"seq": i, "k": k} for i, k in vals]))
    df = (spark.createDataFrame(
        rows, "id long, xs array<struct<seq:long,k:long>>")
        .repartition(32))
    rule = """
version: 2
input: {format: json}
mappings:
  - target: id
    source: id
  - target: sorted
    expr: ["@input.xs", {sort_by: [["@item.k"]]}, {map: ["@item.seq"]}]
"""
    out = {r["id"]: r["sorted"] for r in
           transform_table(df, rule, mode="variant")
           .select(F.col("id").try_cast("long").alias("id"),
                   F.to_json("sorted").alias("sorted")).collect()}
    for rid, xs in rows:
        expect = [e["seq"] for e in
                  sorted(xs, key=lambda e: e["k"])]  # stable
        assert json.loads(out[rid]) == expect, rid
