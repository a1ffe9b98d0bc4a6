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
- LSH (random-hyperplane) top-k: the centroid-free scale path — each
  vector gets an ``nbits``-bit sign signature under pseudo-random ±1
  hyperplanes; candidates share a bucket with the query (multi-probe:
  plus all buckets at Hamming distance 1).  No training step, a single
  narrow projection to compute signatures, and the candidate join is an
  equi-join on the bucket id — shuffle-partitioned by bucket, no cross
  product.  Hyperplane signs come from an integer LCG and per-component
  products are fixed-point micro-units, so signatures are bit-exact
  across engines (the DuckDB oracle replays them).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .dedup import cosine_similarity


def brute_force_scored(corpus: DataFrame, queries: DataFrame, id_col: str,
                       vec_col: str, query_id: str = "query_id",
                       dim: int | None = None) -> DataFrame:
    """Exact cosine of every (corpus row, query) pair — the un-ranked
    half of :func:`brute_force_topk`, exposed so composite callers can
    rank several strategies' candidates under ONE shared window
    (r9, guide §2.4: one exchange instead of one per strategy).

    ``dim`` (r10): the embedding table's known fixed dimension —
    statically unrolls the per-pair cosine (bit-identical; rows of any
    other length take the HOF path per row, see
    ``dedup.cosine_similarity``)."""
    q = queries.select(F.col(id_col).alias(query_id),
                       F.col(vec_col).alias("__qv__"))
    joined = corpus.crossJoin(F.broadcast(q)) \
        .filter(F.col(id_col) != F.col(query_id))
    cos = F.round(cosine_similarity(vec_col, "__qv__", dim), 6)
    return joined.select(F.col(query_id), F.col(id_col).alias("neighbor"),
                         cos.alias("cosine"))


def brute_force_topk(corpus: DataFrame, queries: DataFrame, id_col: str,
                     vec_col: str, k: int = 5,
                     query_id: str = "query_id",
                     dim: int | None = None) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    Output: (query_id, neighbor id, rounded cosine, rank).  Cosine is
    rounded before ranking so ties break on id deterministically across
    engines.
    """
    scored = brute_force_scored(corpus, queries, id_col, vec_col,
                                query_id, dim)
    w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(),
                                             F.col("neighbor").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def _cents_1row(centroids: DataFrame, centroid_id: str,
                centroid_vec: str) -> DataFrame:
    """Collapse the (small, broadcastable) centroid table to ONE row
    holding the sorted struct array — the in-plan form every per-row
    argmax/probe expression consumes.  Sorting by cell id makes the
    array order deterministic under any physical partitioning."""
    return centroids.agg(
        F.array_sort(F.collect_list(F.struct(
            F.col(centroid_id).alias("cell"),
            F.col(centroid_vec).alias("cvec")))).alias("__cents__"))


def _with_cents(df: DataFrame, centroids: DataFrame,
                centroid_id: str = "cell",
                centroid_vec: str = "cvec"
                ) -> tuple[DataFrame, int | None]:
    """``df`` plus the ``__cents__`` array: a typed plan literal when
    the centroid table is driver-local and small — no broadcast
    exchange, no driver broadcast-build job per consuming branch — else
    the one-row broadcast join (r9, guide §5.2; values identical, see
    ``clustering.cents_inline``).  Also returns the centroids' uniform
    dimension when driver-known (r10 — unlocks the static distance
    unroll), else None."""
    from .clustering import cents_inline_meta
    meta = cents_inline_meta(centroids, centroid_id, centroid_vec)
    if meta is not None:
        lit, dim = meta
        return df.withColumn("__cents__", lit), dim
    return df.crossJoin(
        F.broadcast(_cents_1row(centroids, centroid_id,
                                centroid_vec))), None


def _norm0(c: Column) -> Column:
    """+0.0 normalizes IEEE -0.0 to 0.0 so struct-wise comparisons on
    the rounded cosine tie exactly like a window sort (whose keys go
    through NormalizeFloatingNumbers) did."""
    return c + F.lit(0.0)


def _nearest_cell(vec_col: str, cell_type) -> Column:
    """argmax_{cell} cosine(vec, cvec) over the ``__cents__`` array:
    highest rounded cosine, ties to the LOWEST cell id — bit-for-bit
    the ordering of the former per-row window
    (round(cos,6) DESC, cell ASC), now a narrow expression with no
    k-way row blowup and no exchange (r9, guide §2.4).

    The per-centroid cosine deliberately stays the HOF form: this
    expression lives INSIDE a ``transform`` lambda, where everything
    is interpreted without common-subexpression sharing — a statically
    unrolled cosine here measured 3× SLOWER (r10 rejection; the unroll
    only pays in top-level projections, see ``dedup.cosine_similarity``)."""
    best = F.array_max(F.transform(
        F.col("__cents__"),
        lambda c: F.struct(
            _norm0(F.round(cosine_similarity(F.col(vec_col), c["cvec"]),
                           6)).alias("c"),
            (-c["cell"].cast("long")).alias("negcell"))))
    return (-best["negcell"]).cast(cell_type)


def _probe_cells(vec_col: str, nprobe: int) -> Column:
    """The ``nprobe`` nearest cells for a query vector, ordered by
    (rounded cosine DESC, cell ASC) — expression twin of the former
    probe window (row_number <= nprobe)."""
    ranked = F.array_sort(F.transform(
        F.col("__cents__"),
        lambda c: F.struct(
            (-_norm0(F.round(cosine_similarity(F.col(vec_col), c["cvec"]),
                             6))).alias("negc"),
            c["cell"].alias("cell"))))
    return F.transform(F.slice(ranked, 1, nprobe), lambda s: s["cell"])


def ivf_assign(corpus: DataFrame, centroids: DataFrame, id_col: str,
               vec_col: str, centroid_id: str = "cell",
               centroid_vec: str = "cvec") -> DataFrame:
    """Assign each vector to its nearest centroid.

    r9 (guide §2.4): the centroid table collapses to a one-row struct
    array (broadcast), and the assignment is a per-row argmax
    EXPRESSION — the former crossJoin blew the corpus up k-fold and
    shuffled it through a per-id row_number window (an Exchange of
    corpus×k rows carrying the full vectors).  Same assignment
    bit-for-bit (`tests/test_similarity.py` equivalence pin)."""
    cell_type = centroids.schema[centroid_id].dataType
    base, _ = _with_cents(corpus, centroids, centroid_id, centroid_vec)
    return (base
            .select(id_col, vec_col,
                    _nearest_cell(vec_col, cell_type).alias(centroid_id))
            .filter(F.col(centroid_id).isNotNull()))


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
                     k: int = 5, nprobe: int = 2,
                     dim: int | None = None) -> DataFrame:
    """IVF search against a materialized index (``ivf_write_index``).

    Collects the probe cells (tiny: queries × nprobe) and pushes them
    into the scan as a partition filter, so only the probed cells'
    files are read.
    """
    qbase, _ = _with_cents(
        queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("__qv__")),
        centroids)
    probe = qbase.select("query_id", "__qv__",
                         F.explode(_probe_cells("__qv__", nprobe))
                         .alias("cell"))
    cells = [r["cell"] for r in probe.select("cell").distinct().collect()]
    index = spark.read.parquet(index_path).filter(F.col("cell").isin(cells))
    cand = index.join(F.broadcast(probe), "cell") \
        .filter(F.col(id_col) != F.col("query_id"))
    cos = F.round(cosine_similarity(vec_col, "__qv__", dim), 6)
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                               F.col("neighbor").asc())
    return (cand.select("query_id", F.col(id_col).alias("neighbor"),
                        cos.alias("cosine"))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


_LCG_A = 1_013_904_223
_LCG_B = 2_654_435_761
_LCG_M = 4_294_967_296


def _hyperplane_sign(h: Column, idx: Column) -> Column:
    """Deterministic ±1 for hyperplane ``h``, component ``idx`` (0-based):
    the top bit of a Knuth-style integer hash.  Pure long arithmetic so
    any engine reproduces it exactly."""
    v = (h.cast("long") * F.lit(_LCG_A) + idx.cast("long") * F.lit(_LCG_B)) \
        % F.lit(_LCG_M)
    return F.when(v < F.lit(_LCG_M // 2), F.lit(1)).otherwise(F.lit(-1)) \
        .cast("long")


def lsh_signature(vec_col: Column, nbits: int = 6,
                  dim: int | None = None) -> Column:
    """``nbits``-bit random-hyperplane signature of a float vector.

    Bit ``h`` is the sign of the dot product with hyperplane ``h``.
    Components are quantized to integer micro-units (floor(x*1e6 + 0.5))
    before the fold, so the sum is exact integer arithmetic —
    order-independent and bit-identical across engines, unlike a float
    sum whose rounding depends on evaluation order.

    The quantized long array is hoisted once; each bit is then one
    integer pass over it (nbits passes total, O(1) allocation each).
    The earlier one-pass form allocated an nbits-wide product array
    per ELEMENT plus a zip_with accumulator — measured 22% slower in
    the interpreted HOF evaluator, bit-identical output.

    ``dim`` is accepted for signature-compatibility with the cosine
    operators but IGNORED: a statically-unrolled signature was
    prototyped in r10 and measured 3.5× SLOWER at sf0.1 (the unrolled
    form re-quantizes every component once per bit — nbits×d floor/cast
    chains — where the HOF binds the quantized array once; see
    OPTIMIZATION_r10.md "measured rejections").
    """
    from .dedup import _ref
    v = _ref(vec_col)
    if v is not None:
        return F.expr(_lsh_signature_sql(v, nbits))
    q = F.transform(vec_col,
                    lambda x: F.floor(x.cast("double") * 1e6 +
                                      F.lit(0.5)).cast("long"))
    hs = F.sequence(F.lit(0), F.lit(nbits - 1))

    def build(qq: Column) -> Column:
        def dot(h: Column) -> Column:
            prods = F.transform(
                qq, lambda x, i: x * _hyperplane_sign(h, i))
            return F.aggregate(prods, F.lit(0).cast("long"),
                               lambda a, x: a + x)

        return F.aggregate(
            hs, F.lit(0).cast("long"),
            lambda acc, h: acc + F.when(
                dot(h) >= 0,
                F.call_function("shiftleft", F.lit(1).cast("long"),
                                h.cast("int")))
            .otherwise(F.lit(0).cast("long")))

    # single-element transform let-binds the quantized array (one
    # evaluation per row, not one per bit)
    return F.element_at(F.transform(F.array(q), build), 1)


def _lsh_signature_sql(v: str, nbits: int) -> str:
    """SQL text twin of :func:`lsh_signature`."""
    q = (f"transform({v}, x -> cast(floor(cast(x as double) * 1e6 + "
         f"cast(0.5 as double)) as bigint))")
    sign = (f"CASE WHEN (cast(h as bigint) * {_LCG_A} + "
            f"cast(i as bigint) * {_LCG_B}) % {_LCG_M} < "
            f"{_LCG_M // 2} THEN cast(1 as bigint) "
            f"ELSE cast(-1 as bigint) END")
    dot = (f"aggregate(transform(qq, (x, i) -> x * {sign}), "
           f"cast(0 as bigint), (a, x) -> a + x)")
    build = (f"aggregate(sequence(0, {nbits - 1}), cast(0 as bigint), "
             f"(acc, h) -> acc + (CASE WHEN {dot} >= 0 THEN "
             f"shiftleft(cast(1 as bigint), cast(h as int)) "
             f"ELSE cast(0 as bigint) END))")
    return f"element_at(transform(array({q}), qq -> {build}), 1)"




def lsh_scored(corpus: DataFrame, queries: DataFrame, id_col: str,
               vec_col: str, nbits: int = 6,
               multiprobe: bool = True,
               dim: int | None = None) -> DataFrame:
    """LSH candidates with exact cosine within signature buckets,
    un-ranked (see :func:`brute_force_scored`).

    The query side probes its own bucket plus (with ``multiprobe``)
    every bucket at Hamming distance 1 — ``nbits + 1`` probe rows per
    query, a tiny broadcast.  The candidate join is an equi-join on the
    bucket id: at 100 TB the corpus side shuffles (or is pre-bucketed /
    partitioned) by bucket once and each query batch touches only its
    probed buckets, never a cross product.  Output may rank fewer than
    ``k`` neighbors for a query when its probed buckets are sparse —
    the standard ANN recall trade-off (raise ``nbits`` probing or fall
    back to ``brute_force_topk`` for stragglers).
    """
    # one unbound expression reused for both sides — Column trees are
    # immutable, and building the signature once halves the py4j cost
    sig = lsh_signature(vec_col, nbits, dim)
    keyed = corpus.select(F.col(id_col), F.col(vec_col),
                          sig.alias("__bucket__"))
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("__qv__"),
                       sig.alias("__qsig__"))
    if multiprobe:
        flips = F.array(F.lit(-1), *[F.lit(b) for b in range(nbits)])
        probe = (q.select("query_id", "__qv__", "__qsig__",
                          F.explode(flips).alias("__flip__"))
                 .select("query_id", "__qv__",
                         F.when(F.col("__flip__") < 0, F.col("__qsig__"))
                         .otherwise(F.col("__qsig__").bitwiseXOR(
                             F.call_function("shiftleft",
                                             F.lit(1).cast("long"),
                                             F.col("__flip__"))))
                         .alias("__bucket__")))
    else:
        probe = q.select("query_id", "__qv__",
                         F.col("__qsig__").alias("__bucket__"))
    cand = keyed.join(F.broadcast(probe), "__bucket__") \
        .filter(F.col(id_col) != F.col("query_id"))
    cos = F.round(cosine_similarity(vec_col, "__qv__", dim), 6)
    return cand.select("query_id", F.col(id_col).alias("neighbor"),
                       cos.alias("cosine"))


def lsh_topk(corpus: DataFrame, queries: DataFrame, id_col: str,
             vec_col: str, k: int = 5, nbits: int = 6,
             multiprobe: bool = True,
             dim: int | None = None) -> DataFrame:
    """LSH approximate top-k: :func:`lsh_scored` candidates ranked by
    (cosine DESC, neighbor ASC) per query."""
    scored = lsh_scored(corpus, queries, id_col, vec_col, nbits,
                        multiprobe, dim)
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                               F.col("neighbor").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def ivf_scored(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
               id_col: str, vec_col: str, nprobe: int = 2,
               dim: int | None = None) -> DataFrame:
    """IVF candidates with exact cosines, un-ranked (see
    :func:`brute_force_scored` for why this is exposed).

    r9 (guide §2.4): both the corpus cell assignment and the per-query
    probe selection are per-row expressions over the one-row broadcast
    centroid array — the former shape blew the corpus up k-fold through
    a crossJoin and shuffled it through a per-id window for the
    assignment, ran a second window for the probe, then
    SORT-MERGE-joined assigned⋈probe (the probe's size estimate was
    unknown).  Now: zero corpus exchange before the candidate join, and
    the (queries × nprobe)-row probe side is broadcast."""
    cell_type = centroids.schema["cell"].dataType
    cbase, _ = _with_cents(corpus, centroids)
    assigned = (cbase
                .select(id_col, vec_col,
                        _nearest_cell(vec_col, cell_type).alias("cell")))
    qbase, _ = _with_cents(
        queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("__qv__")),
        centroids)
    probe = qbase.select("query_id", "__qv__",
                         F.explode(_probe_cells("__qv__", nprobe))
                         .alias("cell"))
    cand = assigned.join(F.broadcast(probe), "cell") \
        .filter(F.col(id_col) != F.col("query_id"))
    cos = F.round(cosine_similarity(vec_col, "__qv__", dim), 6)
    return cand.select("query_id", F.col(id_col).alias("neighbor"),
                       cos.alias("cosine"))


def ivf_topk(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
             id_col: str, vec_col: str, k: int = 5,
             nprobe: int = 2, dim: int | None = None) -> DataFrame:
    """IVF search: probe the ``nprobe`` nearest cells per query.

    At scale, corpus-by-cell is a bucketed/partitioned table, so each
    query touches ~nprobe/ncells of the data instead of all of it.
    """
    scored = ivf_scored(corpus, queries, centroids, id_col, vec_col,
                        nprobe, dim)
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                               F.col("neighbor").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def brute_force_topk_np(corpus: DataFrame, queries: DataFrame,
                        id_col: str, vec_col: str, k: int = 5,
                        query_id: str = "query_id") -> DataFrame:
    """Vectorized twin of ``brute_force_topk``: the query matrix is
    collected to the driver (queries are small by construction) and
    each corpus partition scores against it with one NumPy matmul
    inside Arrow-batched ``mapInPandas`` — the "Python wins" case,
    where a BLAS kernel beats per-element JVM expression evaluation.

    Each batch emits only its local top-k per query (sorted by
    (-cosine, neighbor) so cross-partition ties resolve identically),
    so the shuffle into the global rank window carries
    O(k × partitions × queries) rows, not the full cross product.

    Measured on 50k random 64-dim vectors × 8 queries (local[32]): 2×
    the JVM expression path, widening with the query-batch size since
    the matmul amortizes where the crossJoin pays per pair.

    Rounding parity: Spark's ``F.round`` is HALF_UP on the shortest
    decimal representation, which ``np.round`` (half-even on the
    binary value) does NOT reproduce at 6th-decimal boundaries — so
    the BLAS pass only pre-selects a margin superset and the survivors
    are re-rounded with the exact Decimal(repr) HALF_UP rule.  The
    remaining divergence window is summation-order ULP noise landing
    exactly on a rounding boundary, which the parity test never
    observes on real data.
    """
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np
    import pandas as pd

    q_rows = queries.select(F.col(id_col).alias("qid"),
                            F.col(vec_col).alias("qv")).collect()
    qids = np.array([r.qid for r in q_rows], dtype=np.int64)
    qmat = np.array([r.qv for r in q_rows], dtype=np.float64)
    qnorm = np.linalg.norm(qmat, axis=1)
    qnorm[qnorm == 0] = np.inf  # zero query vector → cosine 0

    out_schema = T.StructType([
        T.StructField(query_id, T.LongType()),
        T.StructField("neighbor", T.LongType()),
        T.StructField("cosine", T.DoubleType()),
    ])
    six = Decimal("0.000001")

    def round6(x: float) -> float:
        return float(Decimal(repr(float(x))).quantize(
            six, rounding=ROUND_HALF_UP))

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue  # empty Arrow batch: np.linalg.norm would
                # raise on the 1-D empty array before any guard below
            ids = pdf["__id__"].to_numpy(dtype=np.int64)
            emat = np.array(list(pdf["__vec__"]), dtype=np.float64)
            enorm = np.linalg.norm(emat, axis=1)
            enorm[enorm == 0] = np.inf
            cos = (emat @ qmat.T) / np.outer(enorm, qnorm)
            parts = []
            for j, qid in enumerate(qids):
                mask = ids != qid
                cand_ids, cand_cos = ids[mask], cos[mask, j]
                if len(cand_ids) > k:
                    # margin superset: anything whose ROUNDED cosine
                    # could reach the rounded top-k is within 2e-6 of
                    # the kth unrounded value
                    kth = np.partition(cand_cos, -k)[-k]
                    keep = cand_cos >= kth - 2e-6
                    cand_ids, cand_cos = cand_ids[keep], cand_cos[keep]
                rounded = np.array([round6(c) for c in cand_cos])
                order = np.lexsort((cand_ids, -rounded))[:k]
                parts.append(pd.DataFrame({
                    query_id: qid,
                    "neighbor": cand_ids[order],
                    "cosine": rounded[order]}))
            if parts:
                yield pd.concat(parts, ignore_index=True)

    scored = (corpus.select(F.col(id_col).alias("__id__"),
                            F.col(vec_col).alias("__vec__"))
              .mapInPandas(score, out_schema))
    w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(),
                                             F.col("neighbor").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def l2_normalize(vec: Column) -> Column:
    """Unit-normalize a float array (zero vectors pass through
    unchanged — no NaNs).  The norm is hoisted through a
    single-element transform so it evaluates once per row, not once
    per component (interpreted-HOF re-eval, see dedup gram builders).
    After normalization, cosine == dot product, which halves the
    per-pair cost of every downstream similarity op."""
    def build(v: Column) -> Column:
        norm = F.sqrt(F.aggregate(
            v, F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double")))
        return F.element_at(
            F.transform(
                F.array(norm),
                lambda n: F.when(n == 0, v.cast("array<double>"))
                .otherwise(F.transform(
                    v, lambda x: x.cast("double") / n))), 1)

    return F.element_at(F.transform(F.array(vec), build), 1)


def mean_pool(df: DataFrame, group_col: str, vec_col: str,
              out_col: str = "vec") -> DataFrame:
    """Element-wise mean vector per group — pool chunk/passage
    embeddings into one document embedding (the standard retrieval /
    semdedup preprocessing).  Same distributed shape as the k-means
    centroid update: posexplode → groupBy(group, dim) avg →
    re-assemble; shuffle key space = groups × dims with map-side
    partial aggregation."""
    dims = df.select(
        F.col(group_col),
        F.posexplode(F.col(vec_col)).alias("__d__", "__v__"))
    means = (dims.groupBy(group_col, "__d__")
             .agg(F.avg("__v__").alias("__m__")))
    return (means.groupBy(group_col)
            .agg(F.array_sort(F.collect_list(
                F.struct(F.col("__d__"), F.col("__m__"))))
                 .alias("__p__"))
            .select(F.col(group_col),
                    F.transform(F.col("__p__"),
                                lambda p: p["__m__"]).alias(out_col)))
