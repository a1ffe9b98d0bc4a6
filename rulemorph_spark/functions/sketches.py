"""Sketch-based approximate operators — the sublinear-memory scale path.

At 100 TB, exact distinct counts and membership tables stop fitting
anywhere; the standard answers are mergeable sketches:

- **HyperLogLog distinct counts** ride Spark's built-in DataSketches
  HLL (`hll_sketch_agg` / `hll_union_agg`, JVM-side, mergeable):
  per-partition/per-day sketch tables can be maintained incrementally
  and unioned later without rescanning history.
- **Bloom-filter membership prefilter**: Spark's automatic runtime
  bloom join (`spark.sql.optimizer.runtime.bloomFilter.enabled`)
  covers the within-query case; this module adds the *explicit,
  reusable* filter — build once from a (possibly large) key set,
  persist the bits, and prefilter any number of later scans (e.g.
  decontamination against a fixed benchmark set).  PySpark 4.1
  exposes no public bloom expression, so: two `xxhash64` seeds are
  computed JVM-side per key and expanded into the k probe positions by
  Kirsch-Mitzenmacher double hashing (position_i = (h1 + i*h2) mod
  num_bits — the standard Bloom construction); small filters are
  probed entirely in whole-stage codegen, large ones test bits in an
  Arrow-batched pandas UDF against a broadcast numpy bit array — no
  per-row Python hashing.

KLL quantile sketches already live in ``relational.grouped_percentiles``
(``approx_percentile``).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hll_distinct", "hll_sketch_table", "hll_merge_estimate",
    "bloom_build", "bloom_build_auto", "bloom_might_contain",
    "bloom_params",
]


# --------------------------------------------------------------- HLL


def hll_distinct(df: DataFrame, value_col: str,
                 group_cols: list[str] | None = None,
                 lgk: int = 12) -> DataFrame:
    """Approximate COUNT(DISTINCT value) per group via HLL.

    One shuffle (map-side partial sketches merge), constant memory per
    group (2^lgk registers ≈ 1.6 KB at the default lgk=12, ~2% error).
    """
    agg = F.hll_sketch_estimate(
        F.hll_sketch_agg(value_col, F.lit(lgk))).alias("approx_distinct")
    if group_cols:
        return df.groupBy(*group_cols).agg(agg)
    return df.agg(agg)


def hll_sketch_table(df: DataFrame, value_col: str,
                     group_cols: list[str], lgk: int = 12) -> DataFrame:
    """Materialize per-group HLL sketches (binary column ``hll``).

    The incremental pattern: write one sketch row per (partition key,
    batch); later distinct counts over any group subset come from
    :func:`hll_merge_estimate` over the sketch table — no rescan of
    the raw 100 TB.
    """
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lgk)).alias("hll"))


def hll_merge_estimate(sketches: DataFrame,
                       group_cols: list[str] | None = None,
                       sketch_col: str = "hll") -> DataFrame:
    """Union previously-materialized sketches → distinct estimates."""
    agg = F.hll_sketch_estimate(
        F.hll_union_agg(sketch_col)).alias("approx_distinct")
    if group_cols:
        return sketches.groupBy(*group_cols).agg(agg)
    return sketches.agg(agg)


# ------------------------------------------------------------- Bloom


def bloom_params(expected_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """Optimal (num_bits, num_hashes) for a target false-positive rate."""
    if expected_items <= 0:
        raise ValueError("expected_items must be positive")
    if not 0.0 < fpp < 1.0:
        raise ValueError("fpp must be in (0, 1)")
    num_bits = int(math.ceil(-expected_items * math.log(fpp)
                             / (math.log(2) ** 2)))
    num_hashes = max(1, int(round(num_bits / expected_items * math.log(2))))
    return max(64, num_bits), num_hashes


def _hash_pairs(df: DataFrame, key_col: str):
    """ONE distributed job → the distinct keys' (h1, h2) xxhash64 pair
    as two int64 numpy arrays.  The k probe positions derive from the
    pair by Kirsch-Mitzenmacher double hashing — position_i =
    (h1 + i·h2) mod num_bits — so the filter can be sized AND built
    from a single collect (r9: the former build needed a separate
    ``count()`` job to size the filter before a second job could hash,
    and collected ~k rows per key instead of one pair)."""
    rows = (df.select(F.xxhash64(F.col(key_col), F.lit(0)).alias("h1"),
                      F.xxhash64(F.col(key_col), F.lit(1)).alias("h2"))
            .distinct().collect())
    h1 = np.array([r["h1"] for r in rows], dtype=np.int64)
    h2 = np.array([r["h2"] for r in rows], dtype=np.int64)
    return h1, h2


def _pack_bits(h1, h2, num_bits: int, num_hashes: int) -> bytes:
    bits = np.zeros(num_bits, dtype=np.uint8)
    if h1.size:
        a = h1 % num_bits  # numpy % has the divisor's sign == pmod
        b = h2 % num_bits
        for i in range(num_hashes):
            bits[(a + i * b) % num_bits] = 1
    return np.packbits(bits, bitorder="little").tobytes()


def bloom_build(df: DataFrame, key_col: str, num_bits: int,
                num_hashes: int) -> bytes:
    """Build the filter's packed bit array from a key DataFrame.

    Distributed: keys hash and dedup on the cluster; one (h1, h2) pair
    per distinct key comes back to the driver (16 bytes/key — less
    than the ~1.2 bytes-per-key-per-probe of the former per-position
    collect), positions expand vectorized on the driver."""
    h1, h2 = _hash_pairs(df, key_col)
    return _pack_bits(h1, h2, num_bits, num_hashes)


def bloom_build_auto(df: DataFrame, key_col: str,
                     fpp: float = 0.01) -> tuple[bytes, int, int]:
    """Size AND build the filter in ONE distributed job → (bits,
    num_bits, num_hashes).  The distinct (h1, h2) collect doubles as
    the exact key count, so the separate ``df.count()`` sizing job the
    explicit-signature path needs disappears (r9 — at sf0.1 that was
    half the Bloom construction wall time; at scale it was a second
    full scan of the dim side)."""
    h1, h2 = _hash_pairs(df, key_col)
    num_bits, num_hashes = bloom_params(max(h1.size, 1), fpp)
    return _pack_bits(h1, h2, num_bits, num_hashes), num_bits, num_hashes


# filters at or below this size are embedded in the plan as a packed
# long-array literal and probed with pure codegen bit arithmetic —
# no Python boundary at all.  2^20 bits = 16 Ki longs (~128 KiB in the
# plan, milliseconds to ship); beyond that the literal's plan/py4j cost
# outgrows the Arrow-probe cost and the broadcast+pandas path takes
# over.
_JVM_PROBE_MAX_BITS = 1 << 20


def bloom_might_contain(df: DataFrame, key_col: str, bloom_bits: bytes,
                        num_bits: int, num_hashes: int,
                        out_col: str = "might_contain") -> DataFrame:
    """Append a boolean column: key possibly in the built filter.

    No false negatives; false-positive rate per :func:`bloom_params`.
    Hashing stays JVM-side (`xxhash64` per seed, whole-stage codegen).
    Small filters (≤ ``_JVM_PROBE_MAX_BITS``) are probed entirely in
    codegen — the packed bit words ride in the plan as an array<long>
    literal and each probe is an element_at + shift + mask (r9: removes
    the ArrowEvalPython node and its JVM↔Python transfer; measured
    0.75 s → 0.28 s for a 150k-row probe at local[32]).  Large filters
    keep the broadcast-numpy pandas UDF, whose cost is one vectorized
    fancy-index per Arrow batch.
    """
    if num_bits <= _JVM_PROBE_MAX_BITS:
        pad = (8 - len(bloom_bits) % 8) % 8
        words = np.frombuffer(bloom_bits + b"\0" * pad,
                              dtype="<u8").view(np.int64)
        # ONE SQL-text expression (a single py4j call — the former
        # per-probe Column chain cost ~0.3 s of driver construction per
        # filter at k=7).  The expression stays FLAT so it keeps
        # whole-stage codegen (a `transform` let-binding would be
        # CodegenFallback); the h1/h2 hashes repeat textually per probe
        # and codegen subexpression elimination evaluates them once.
        # h1/h2 are reduced mod num_bits first, so h1 + i*h2 never
        # overflows under ANSI; the array literal constant-folds once.
        words_sql = "array(" + ",".join(f"{int(w)}L" for w in words) + ")"
        h1 = f"pmod(xxhash64(`{key_col}`, 0), {num_bits}L)"
        h2 = f"pmod(xxhash64(`{key_col}`, 1), {num_bits}L)"
        tests = " AND ".join(
            f"((shiftright(element_at({words_sql}, "
            f"cast((pmod({h1} + {i}L * {h2}, {num_bits}L)) div 64 as int)"
            f" + 1), "
            f"cast(pmod(pmod({h1} + {i}L * {h2}, {num_bits}L), 64) as int))"
            f" & 1L) = 1L)"
            for i in range(num_hashes))
        return df.withColumn(out_col, F.expr(f"({tests})"))

    sc = df.sparkSession.sparkContext
    bits_bc = sc.broadcast(
        np.unpackbits(np.frombuffer(bloom_bits, dtype=np.uint8),
                      bitorder="little")[:num_bits])

    @F.pandas_udf("boolean")
    def _test(h1s: pd.Series, h2s: pd.Series) -> pd.Series:
        bits = bits_bc.value
        if not len(h1s):
            return pd.Series([], dtype="bool")
        a = h1s.to_numpy(dtype=np.int64) % num_bits
        b = h2s.to_numpy(dtype=np.int64) % num_bits
        ok = np.ones(len(a), dtype=bool)
        for i in range(num_hashes):
            ok &= bits[(a + i * b) % num_bits] == 1
        return pd.Series(ok)

    return df.withColumn(
        out_col, _test(F.xxhash64(F.col(key_col), F.lit(0)),
                       F.xxhash64(F.col(key_col), F.lit(1))))
