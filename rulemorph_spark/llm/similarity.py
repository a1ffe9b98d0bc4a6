"""Approximate / exact nearest-neighbor search over embedding columns.

- brute-force cosine top-k: the correctness baseline — a crossJoin
  pruned to the query set, windowed rank.  Fine for ≤10⁵ corpus ×
  small query batches.
- IVF (inverted-file) top-k: the scale path — k-means-style coarse
  cells (deterministic seed centroids), each vector assigned to its
  nearest cell, queries probe only ``nprobe`` cells.  At 100 TB the
  cell assignment is a broadcast join against ≤64k centroids and the
  probe is a partition-pruned scan when the table is written
  partitioned by cell id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import cosine_similarity


def brute_force_topk(corpus: DataFrame, queries: DataFrame, id_col: str,
                     vec_col: str, k: int = 5,
                     query_id: str = "query_id") -> DataFrame:
    """Exact top-k by cosine for each query vector.

    Output: (query_id, neighbor id, rounded cosine, rank).  Cosine is
    rounded before ranking so ties break on id deterministically across
    engines.
    """
    q = queries.select(F.col(id_col).alias(query_id),
                       F.col(vec_col).alias("__qv__"))
    joined = corpus.crossJoin(F.broadcast(q)) \
        .filter(F.col(id_col) != F.col(query_id))
    cos = F.round(cosine_similarity(F.col(vec_col), F.col("__qv__")), 6)
    scored = joined.select(F.col(query_id), F.col(id_col).alias("neighbor"),
                           cos.alias("cosine"))
    w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(),
                                             F.col("neighbor").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def ivf_assign(corpus: DataFrame, centroids: DataFrame, id_col: str,
               vec_col: str, centroid_id: str = "cell",
               centroid_vec: str = "cvec") -> DataFrame:
    """Assign each vector to its nearest centroid (broadcast argmax)."""
    joined = corpus.crossJoin(F.broadcast(centroids))
    cos = cosine_similarity(F.col(vec_col), F.col(centroid_vec))
    w = Window.partitionBy(id_col).orderBy(F.round(cos, 6).desc(),
                                           F.col(centroid_id).asc())
    return (joined.withColumn("__r__", F.row_number().over(w))
            .filter(F.col("__r__") == 1)
            .select(id_col, vec_col, centroid_id))


def ivf_write_index(corpus: DataFrame, centroids: DataFrame, path: str,
                    id_col: str, vec_col: str) -> None:
    """Materialize the IVF index: the corpus with cell assignments,
    written **partitioned by cell id**.

    This is what makes IVF sublinear at rest: a probe of ``nprobe``
    cells becomes a partition-pruned scan (``PartitionFilters`` in the
    plan) — only nprobe/ncells of the files are opened, no full-corpus
    scan per query batch.
    """
    assigned = ivf_assign(corpus, centroids, id_col, vec_col)
    assigned.write.partitionBy("cell").mode("overwrite").parquet(path)


def ivf_topk_indexed(spark, index_path: str, queries: DataFrame,
                     centroids: DataFrame, id_col: str, vec_col: str,
                     k: int = 5, nprobe: int = 2) -> DataFrame:
    """IVF search against a materialized index (``ivf_write_index``).

    Collects the probe cells (tiny: queries × nprobe) and pushes them
    into the scan as a partition filter, so only the probed cells'
    files are read.
    """
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("__qv__"))
    qcells = (q.crossJoin(F.broadcast(centroids))
              .withColumn("__qcos__",
                          F.round(cosine_similarity(F.col("__qv__"),
                                                    F.col("cvec")), 6)))
    wq = Window.partitionBy("query_id").orderBy(F.col("__qcos__").desc(),
                                                F.col("cell").asc())
    probe = (qcells.withColumn("__qr__", F.row_number().over(wq))
             .filter(F.col("__qr__") <= nprobe)
             .select("query_id", "__qv__", "cell"))
    cells = [r["cell"] for r in probe.select("cell").distinct().collect()]
    index = spark.read.parquet(index_path).filter(F.col("cell").isin(cells))
    cand = index.join(F.broadcast(probe), "cell") \
        .filter(F.col(id_col) != F.col("query_id"))
    cos = F.round(cosine_similarity(F.col(vec_col), F.col("__qv__")), 6)
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                               F.col("neighbor").asc())
    return (cand.select("query_id", F.col(id_col).alias("neighbor"),
                        cos.alias("cosine"))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def ivf_topk(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
             id_col: str, vec_col: str, k: int = 5,
             nprobe: int = 2) -> DataFrame:
    """IVF search: probe the ``nprobe`` nearest cells per query.

    At scale, corpus-by-cell is a bucketed/partitioned table, so each
    query touches ~nprobe/ncells of the data instead of all of it.
    """
    assigned = ivf_assign(corpus, centroids, id_col, vec_col)
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("__qv__"))
    qcells = (q.crossJoin(F.broadcast(centroids))
              .withColumn("__qcos__",
                          F.round(cosine_similarity(F.col("__qv__"),
                                                    F.col("cvec")), 6)))
    wq = Window.partitionBy("query_id").orderBy(F.col("__qcos__").desc(),
                                                F.col("cell").asc())
    probe = (qcells.withColumn("__qr__", F.row_number().over(wq))
             .filter(F.col("__qr__") <= nprobe)
             .select("query_id", "__qv__", "cell"))
    cand = assigned.join(probe, "cell") \
        .filter(F.col(id_col) != F.col("query_id"))
    cos = F.round(cosine_similarity(F.col(vec_col), F.col("__qv__")), 6)
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                               F.col("neighbor").asc())
    return (cand.select("query_id", F.col(id_col).alias("neighbor"),
                        cos.alias("cosine"))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))
