"""IVF materialized index (llm/similarity.py): partition-pruned probes
must return exactly what the in-memory ivf_topk computes, and the probe
scan must actually prune partitions (PartitionFilters in the plan).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rulemorph_spark.llm.similarity import (ivf_topk, ivf_topk_indexed,
                                            ivf_write_index)

SF = "/root/testdata/sf0.001"


def _setup(spark):
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    centroids = (e.filter(F.col("vec_id") < 8)
                 .select(F.col("vec_id").alias("cell"),
                         F.col("embedding").alias("cvec")))
    queries = e.filter((F.col("vec_id") >= 8) & (F.col("vec_id") < 11))
    return e, centroids, queries


def test_indexed_matches_inmemory(spark, tmp_path):
    e, centroids, queries = _setup(spark)
    path = str(tmp_path / "ivf")
    ivf_write_index(e, centroids, path, "vec_id", "embedding")

    expected = sorted(
        map(tuple, ivf_topk(e, queries, centroids, "vec_id", "embedding",
                            k=3, nprobe=2).collect()))
    got = sorted(
        map(tuple, ivf_topk_indexed(spark, path, queries, centroids,
                                    "vec_id", "embedding",
                                    k=3, nprobe=2).collect()))
    assert got == expected and len(got) > 0


def test_indexed_scan_is_partition_pruned(spark, tmp_path):
    e, centroids, queries = _setup(spark)
    path = str(tmp_path / "ivf")
    ivf_write_index(e, centroids, path, "vec_id", "embedding")
    out = ivf_topk_indexed(spark, path, queries, centroids,
                           "vec_id", "embedding", k=3, nprobe=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the index scan must carry a partition filter on cell — i.e. only
    # the probed cells' directories are listed/read
    assert "PartitionFilters: [cell" in plan.replace("#", " #") or \
        "PartitionFilters: [isnotnull(cell" in plan or \
        ("PartitionFilters" in plan and "cell" in
         plan.split("PartitionFilters", 1)[1][:200]), plan[:4000]
