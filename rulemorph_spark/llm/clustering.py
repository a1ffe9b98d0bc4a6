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


def _cents_1row(centroids: DataFrame) -> DataFrame:
    """The (small, broadcastable) centroid table collapsed to ONE row
    holding the cell-sorted struct array — the in-plan form the per-row
    argmin expression consumes (r9, guide §2.4)."""
    return centroids.agg(
        F.array_sort(F.collect_list(F.struct(
            F.col("cell").alias("cell"),
            F.col("cvec").alias("cvec")))).alias("__cents__"))


def _best_cell(vec: Column) -> Column:
    """argmin_{cell} ||vec - cvec||² over the ``__cents__`` array as a
    struct (d, cell, cvec): lowest rounded distance, ties to the lowest
    cell id — the exact ordering of the former min_by fold
    (struct(round(d,9), cell)), now a narrow per-row expression with no
    k-way row blowup and no exchange.  ``cvec`` rides along for free
    (never compared: cell ids are unique, so the (d, cell) prefix always
    decides)."""
    return F.array_min(F.transform(
        F.col("__cents__"),
        lambda c: F.struct(
            F.round(l2_sq(vec, c["cvec"]), 9).alias("d"),
            c["cell"].alias("cell"),
            c["cvec"].alias("cvec"))))


def assign_cells_with_vec(df: DataFrame, centroids: DataFrame,
                          id_col: str, vec_col: str,
                          keep_cvec: bool = False) -> DataFrame:
    """Nearest-centroid assignment carrying the input vector through:
    (id, vec, cell[, __cvec__]).  One narrow pass over the corpus with
    the one-row centroid array broadcast — no shuffle at all.

    r9 (guide §2.4): the former shape crossJoined the corpus k-fold and
    folded it back through a groupBy(id) min_by — an Exchange of
    corpus×k rows carrying the full vectors.  Assignment values are
    identical (same rounded distance, same tiebreak).  Input ids are
    assumed unique (the min_by fold deduplicated; this keeps one output
    row per input row)."""
    cents = _cents_1row(centroids)
    best = _best_cell(F.col(vec_col))
    cols = [F.col(id_col), F.col(vec_col), best["cell"].alias("cell")]
    if keep_cvec:
        cols.append(best["cvec"].alias("__cvec__"))
    return (df.select(id_col, vec_col)
            .crossJoin(F.broadcast(cents))
            .select(*cols)
            .filter(F.col("cell").isNotNull()))


def assign_cells(df: DataFrame, centroids: DataFrame, id_col: str,
                 vec_col: str) -> DataFrame:
    """Nearest-centroid assignment → (id, cell): broadcast the one-row
    centroid array, take the per-row argmin expression (see
    :func:`assign_cells_with_vec`)."""
    return assign_cells_with_vec(df, centroids, id_col, vec_col) \
        .select(id_col, "cell")


def _mean_vectors(with_cell: DataFrame, vec_col: str) -> DataFrame:
    """Element-wise mean vector per cell from an already-assigned
    (…, vec, cell) frame: posexplode → groupBy (cell, dim) avg →
    re-assemble (sort by dim).  Shuffle key space = k · dims, with
    map-side partial aggregation.  (r9: takes the assigned frame
    directly — the former signature re-joined assignments to the
    corpus by id, one corpus-sized shuffle join per Lloyd iteration.)"""
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

    r9 iteration shape (guide §2.4): narrow argmin assignment (no
    corpus exchange) → posexplode → ONE tiny (cell, dim)-keyed shuffle
    with map-side partial avg → k-row merge join.  The former iteration
    paid a corpus×k min_by shuffle plus a corpus-sized assignment join.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    centroids = seed_centroids(df, id_col, vec_col, k) \
        .localCheckpoint(eager=True)
    for _ in range(max(iters, 0)):
        with_cell = assign_cells_with_vec(df, centroids, id_col, vec_col)
        updated = _mean_vectors(with_cell, vec_col)
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
    """Sum of squared distances to the nearest centroid (the Lloyd
    objective — must be non-increasing over iterations).  r9: per-row
    min over the one-row centroid array + one scalar agg — no
    corpus×k shuffle."""
    cents = _cents_1row(centroids)
    d = F.array_min(F.transform(
        F.col("__cents__"), lambda c: l2_sq(F.col(vec_col), c["cvec"])))
    per_row = (df.select(vec_col).crossJoin(F.broadcast(cents))
               .select(d.alias("__d__")))
    return per_row.agg(F.sum("__d__")).collect()[0][0]


def train_ivf_centroids(corpus: DataFrame, id_col: str, vec_col: str,
                        k: int = 64, iters: int = 8) -> DataFrame:
    """Convenience: trained centroids ready for
    ``similarity.ivf_write_index(corpus, centroids, ...)``."""
    return kmeans_train(corpus, id_col, vec_col, k, iters)
