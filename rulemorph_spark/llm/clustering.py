"""Distributed k-means (Lloyd's algorithm) over an embedding column.

Closes the loop for the IVF ANN path: ``similarity.ivf_*`` consumes a
(cell, cvec) centroid table; round 1 used deterministic seed centroids,
this trains them from the corpus itself.  Also the generic corpus
clustering primitive (topic bucketing, stratified curation).

Scale shape (100 TB):
- each Lloyd iteration is: broadcast the k centroids → per-row argmin
  (a narrow map over the corpus, no shuffle) → centroid update via
  ``posexplode`` + groupBy(cell, dim) mean — one shuffle whose key
  space is k·dims (tiny), with map-side partial sums.
- the corpus is never collected; the driver only holds the k centroid
  rows between iterations (``localCheckpoint`` truncates the per-round
  lineage exactly like ``dedup.connected_components``).
- deterministic: seeds are the k rows with the smallest xxhash64 of
  the id column, and every reduction is avg/min-by over exact inputs,
  so reruns converge identically on identical data.

Iterative fixpoint ⇒ no single ANSI-SQL oracle; verified instead by
unit tests (inertia monotonically non-increasing, parity with a NumPy
reference run on the collected sf0.001 slice, stable under
repartitioning).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def l2_sq(a: Column, b: Column) -> Column:
    """Squared Euclidean distance between two float arrays (JVM HOFs —
    whole-stage-codegen'd, no UDF)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
                       F.lit(0.0), lambda acc, v: acc + v)


def seed_centroids(df: DataFrame, id_col: str, vec_col: str,
                   k: int) -> DataFrame:
    """Deterministic k seeds: rows with the smallest ``xxhash64(id)``
    (a uniform pseudo-random draw that any engine replays)."""
    from pyspark.sql import Window
    seeds = (df.select(F.col(id_col).alias("__sid__"),
                       F.col(vec_col).alias("cvec"))
             .orderBy(F.xxhash64(F.col("__sid__")), F.col("__sid__"))
             .limit(k))
    # k rows only → a global window here is k-sized, not corpus-sized
    w = Window.orderBy(F.xxhash64(F.col("__sid__")), F.col("__sid__"))
    return seeds.select((F.row_number().over(w) - 1).cast("int")
                        .alias("cell"), "cvec")


def assign_cells(df: DataFrame, centroids: DataFrame, id_col: str,
                 vec_col: str) -> DataFrame:
    """Nearest-centroid assignment: broadcast the centroid table, take
    the per-row ``min_by`` over the k candidates.  One narrow pass +
    a fold keyed by the row id (co-partitioned with the scan)."""
    joined = df.select(id_col, vec_col) \
        .crossJoin(F.broadcast(centroids))
    d = F.round(l2_sq(F.col(vec_col), F.col("cvec")), 9)
    return (joined.groupBy(id_col)
            .agg(F.min_by(F.col("cell"),
                          F.struct(d.alias("d"),
                                   F.col("cell").alias("c")))
                 .alias("cell")))


def _mean_vectors(assigned: DataFrame, df: DataFrame, id_col: str,
                  vec_col: str) -> DataFrame:
    """Element-wise mean vector per cell: posexplode → groupBy
    (cell, dim) avg → re-assemble (sort by dim).  Shuffle key space =
    k · dims, with map-side partial aggregation."""
    with_cell = df.select(id_col, vec_col).join(assigned, id_col)
    dims = with_cell.select(
        "cell", F.posexplode(F.col(vec_col)).alias("__d__", "__v__"))
    means = (dims.groupBy("cell", "__d__")
             .agg(F.avg("__v__").alias("__m__")))
    return (means.groupBy("cell")
            .agg(F.array_sort(F.collect_list(
                F.struct(F.col("__d__"), F.col("__m__")))).alias("__p__"))
            .select("cell",
                    F.transform(F.col("__p__"),
                                lambda p: p["__m__"]).alias("cvec")))


def kmeans_train(df: DataFrame, id_col: str, vec_col: str, k: int,
                 iters: int = 8) -> DataFrame:
    """Lloyd's algorithm: returns the trained (cell, cvec) table, the
    exact shape ``similarity.ivf_assign`` / ``ivf_write_index`` expect.

    Empty cells keep their previous centroid (standard practice — no
    resampling, preserving determinism).
    """
    if k <= 0:
        raise ValueError("k must be positive")
    centroids = seed_centroids(df, id_col, vec_col, k) \
        .localCheckpoint(eager=True)
    for _ in range(max(iters, 0)):
        assigned = assign_cells(df, centroids, id_col, vec_col)
        updated = _mean_vectors(assigned, df, id_col, vec_col)
        # empty cells: fall back to the previous centroid
        merged = (centroids.alias("old")
                  .join(updated.alias("new"), "cell", "left")
                  .select("cell",
                          F.coalesce(F.col("new.cvec"),
                                     F.col("old.cvec")).alias("cvec")))
        centroids = merged.localCheckpoint(eager=True)
    return centroids


def kmeans_inertia(df: DataFrame, centroids: DataFrame, id_col: str,
                   vec_col: str) -> float:
    """Sum of squared distances to the assigned centroid (the Lloyd
    objective — must be non-increasing over iterations)."""
    joined = df.select(id_col, vec_col).crossJoin(F.broadcast(centroids))
    d = l2_sq(F.col(vec_col), F.col("cvec"))
    per_row = (joined.groupBy(id_col)
               .agg(F.min(d).alias("__d__")))
    return per_row.agg(F.sum("__d__")).collect()[0][0]


def train_ivf_centroids(corpus: DataFrame, id_col: str, vec_col: str,
                        k: int = 64, iters: int = 8) -> DataFrame:
    """Convenience: trained centroids ready for
    ``similarity.ivf_write_index(corpus, centroids, ...)``."""
    return kmeans_train(corpus, id_col, vec_col, k, iters)
