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
  exposes no public bloom expression, so: the k probe positions are
  computed JVM-side with `xxhash64` (cheap, codegen'd), and only the
  bit test runs in an Arrow-batched pandas UDF against a broadcast
  numpy bit array — no per-row Python hashing.

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
    "bloom_build", "bloom_might_contain", "bloom_params",
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


def _positions(col: Column, num_bits: int, num_hashes: int) -> Column:
    """k probe positions, each an independent JVM-side xxhash64 seed."""
    return F.array(*[
        F.pmod(F.xxhash64(col, F.lit(i)), F.lit(num_bits)).cast("long")
        for i in range(num_hashes)])


def bloom_build(df: DataFrame, key_col: str, num_bits: int,
                num_hashes: int) -> bytes:
    """Build the filter's packed bit array from a key DataFrame.

    Distributed: keys hash and dedup on the cluster; only the set bit
    POSITIONS come back to the driver (≤ num_bits values — bounded by
    the filter size, not the key count), then pack to num_bits/8 bytes.
    """
    rows = (df.select(F.explode(_positions(F.col(key_col), num_bits,
                                           num_hashes)).alias("p"))
            .distinct().collect())
    bits = np.zeros(num_bits, dtype=np.uint8)
    idx = np.array([r["p"] for r in rows], dtype=np.int64)
    if idx.size:
        bits[idx] = 1
    return np.packbits(bits, bitorder="little").tobytes()


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
        packed = F.lit([int(w) for w in words])

        def probe(i: int) -> Column:
            # bit p lives at word p//64, bit p%64 (little-endian pack)
            p = F.pmod(F.xxhash64(F.col(key_col), F.lit(i)),
                       F.lit(num_bits)).cast("long")
            word = F.element_at(packed, F.floor(p / 64).cast("int") + 1)
            return F.call_function(
                "shiftright", word,
                F.pmod(p, F.lit(64)).cast("int")
            ).bitwiseAND(F.lit(1)) == F.lit(1)

        cond = probe(0)
        for i in range(1, num_hashes):
            cond = cond & probe(i)
        return df.withColumn(out_col, cond)

    sc = df.sparkSession.sparkContext
    bits_bc = sc.broadcast(
        np.unpackbits(np.frombuffer(bloom_bits, dtype=np.uint8),
                      bitorder="little")[:num_bits])

    @F.pandas_udf("boolean")
    def _test(pos: pd.Series) -> pd.Series:
        bits = bits_bc.value
        if not len(pos):
            return pd.Series([], dtype="bool")
        mat = np.stack([np.asarray(p, dtype=np.int64) for p in pos])
        return pd.Series(bits[mat].all(axis=1))

    pos = _positions(F.col(key_col), num_bits, num_hashes)
    return df.withColumn(out_col, _test(pos))
