"""Small-files compaction (functions/layout.py): the planner is a pure
bin-packer; the executor must preserve row contents exactly while
shrinking the file count.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from rulemorph_spark.functions.layout import (compact_parquet,
                                              list_data_files,
                                              plan_compaction)


def test_plan_compaction_groups_small_spares_large():
    files = [("big1", 200), ("big2", 150),
             ("s1", 40), ("s2", 35), ("s3", 30), ("s4", 20), ("s5", 5)]
    groups = plan_compaction(files, target_bytes=100)
    flat = [u for g in groups for u in g]
    # large files are never rewritten
    assert "big1" not in flat and "big2" not in flat
    # every group fits the target and has ≥2 members
    sizes = dict(files)
    for g in groups:
        assert len(g) >= 2
        assert sum(sizes[u] for u in g) <= 100
    # FFD packs 40+35+20+5 into one bin; s3 (30) is left a singleton
    # and correctly dropped (rewriting one file buys nothing)
    assert sorted(flat) == ["s1", "s2", "s4", "s5"]


def test_plan_compaction_singletons_dropped():
    assert plan_compaction([("a", 90), ("b", 80)], 100) == []
    assert plan_compaction([], 100) == []


def test_compact_parquet_preserves_rows(spark):
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet")
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "tbl")
        # 20 tiny files — the streaming-sink small-files shape
        docs.repartition(20).write.parquet(path)
        before_files = list_data_files(spark, path)
        assert len(before_files) == 20
        want = sorted(r["doc_id"] for r in
                      spark.read.parquet(path).collect())

        removed = compact_parquet(spark, path,
                                  target_bytes=64 * 1024 * 1024)
        assert removed > 0
        after_files = list_data_files(spark, path)
        assert len(after_files) < len(before_files)
        got_df = spark.read.parquet(path)
        got = sorted(r["doc_id"] for r in got_df.collect())
        assert got == want
        # full row equality, not just ids
        assert got_df.exceptAll(docs).count() == 0
        assert docs.exceptAll(got_df).count() == 0

        # idempotent-ish: a second pass on an already-compacted dir
        # with one big file does nothing
        assert compact_parquet(spark, path,
                               target_bytes=64 * 1024 * 1024) == 0 or \
            len(list_data_files(spark, path)) <= len(after_files)
