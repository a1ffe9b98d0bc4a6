"""Data-layout clustering for scan pruning — Z-order (Morton) keys.

At 100 TB the cheapest query is the one that never reads the file:
parquet footers carry per-column min/max, and both Spark's scan and
any lakehouse table format skip files whose stats exclude the
predicate.  Single-column sort only prunes that column; interleaving
the bits of several columns (Z-order) keeps every clustered column's
per-file range tight simultaneously, so multi-dimensional predicates
prune on all of them.

``zorder_key`` is pure Column arithmetic (bit tests + shifts —
whole-stage codegen, no UDF); ``cluster_write`` is
``repartitionByRange`` on the key (one range shuffle, skew-safe
via range sampling) + ``sortWithinPartitions`` + parquet write.
``file_column_bounds`` reads the written footers back (pyarrow) so
tests — and capacity reviews — can *measure* the clustering quality
instead of trusting it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_key", "cluster_write", "file_column_bounds",
           "list_data_files", "plan_compaction", "compact_parquet"]


def _scale_to_bits(col: Column, cmin: Column, cmax: Column,
                   bits: int) -> Column:
    """Min/max-normalize a numeric column onto [0, 2^bits - 1]."""
    span = cmax.cast("double") - cmin.cast("double")
    unit = F.when(span.isNull() | (span <= 0.0), F.lit(0.0)) \
            .otherwise((col.cast("double") - cmin.cast("double")) / span)
    top = F.lit((1 << bits) - 1)
    scaled = F.floor(unit * top).cast("long")
    return F.greatest(F.lit(0), F.least(top.cast("long"), scaled))


def zorder_key(df: DataFrame, cols: list[str], bits: int = 16) -> Column:
    """Morton key Column interleaving ``bits`` bits of each column.

    Column mins/maxes are taken in one tiny aggregate job (a full
    scan of just those columns — at rest this is the same footer
    metadata the files already carry).  ``len(cols) * bits`` must be
    ≤ 63 to stay in a long.
    """
    if not cols:
        raise ValueError("zorder_key needs at least one column")
    ndims = len(cols)
    if ndims * bits > 63:
        raise ValueError(f"{ndims} cols x {bits} bits exceeds a long; "
                         f"lower bits to {63 // ndims}")
    from pyspark.sql import types as T
    for c in cols:
        dt = df.schema[c].dataType
        if not isinstance(dt, T.NumericType):
            raise ValueError(
                f"zorder column {c!r} has non-numeric type "
                f"{dt.simpleString()}; cast first (timestamps via "
                f"unix_micros, string keys via xxhash64)")
    stats = df.agg(*[f(c).alias(f"{tag}_{c}") for c in cols
                     for tag, f in (("min", F.min), ("max", F.max))]) \
              .collect()[0]
    z = F.lit(0).cast("long")
    for d, c in enumerate(cols):
        scaled = _scale_to_bits(F.col(c), F.lit(stats[f"min_{c}"]),
                                F.lit(stats[f"max_{c}"]), bits)
        for b in range(bits):
            # bit b of dim d lands at position b*ndims + d
            bit = F.shiftright(scaled, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * ndims + d))
    return z


def cluster_write(df: DataFrame, cols: list[str], path: str,
                  num_files: int = 8, bits: int = 16) -> None:
    """Write ``df`` as parquet Z-order-clustered on ``cols``.

    One range shuffle on the Morton key (AQE/range-sampling handles
    skew), sorted within each output file so row-group stats are tight
    too.  The key column itself is dropped from the output.
    """
    z = zorder_key(df, cols, bits=bits)
    (df.withColumn("__z__", z)
       .repartitionByRange(num_files, "__z__")
       .sortWithinPartitions("__z__")
       .drop("__z__")
       .write.mode("overwrite").parquet(path))


def file_column_bounds(path: str, cols: list[str]) -> list[dict]:
    """Per-file min/max for ``cols`` from the parquet footers.

    Returns one dict per data file: ``{"file", "<col>_min",
    "<col>_max"}`` — exactly the stats a scan planner prunes with.
    """
    import os

    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        entry: dict = {"file": name}
        for c in cols:
            lo = hi = None
            for rg in range(md.num_row_groups):
                row_group = md.row_group(rg)
                for ci in range(row_group.num_columns):
                    col_meta = row_group.column(ci)
                    if col_meta.path_in_schema != c:
                        continue
                    st = col_meta.statistics
                    if st is None or not st.has_min_max:
                        continue
                    lo = st.min if lo is None else min(lo, st.min)
                    hi = st.max if hi is None else max(hi, st.max)
            entry[f"{c}_min"], entry[f"{c}_max"] = lo, hi
        if len(entry) > 1:
            out.append(entry)
    return out


def list_data_files(spark, path: str) -> list[tuple[str, int]]:
    """(uri, bytes) for every parquet data file under ``path`` — via
    the Hadoop FileSystem API, so it works against file://, hdfs://,
    s3a:// alike (the compaction planner's input)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    it = fs.listFiles(p, True)
    out = []
    while it.hasNext():
        st = it.next()
        uri = st.getPath().toString()
        if uri.endswith(".parquet"):
            out.append((uri, int(st.getLen())))
    return out


def plan_compaction(files: list[tuple[str, int]],
                    target_bytes: int) -> list[list[str]]:
    """Greedy first-fit-decreasing bin-packing of small files into
    groups of ≈``target_bytes``.  Files already ≥ target stay alone
    and are NOT rewritten; singleton groups are dropped (rewriting one
    file buys nothing).  Pure function — unit-testable without Spark.
    """
    small = sorted(((u, b) for u, b in files if b < target_bytes),
                   key=lambda x: -x[1])
    bins: list[tuple[list[str], int]] = []
    for uri, b in small:
        for i, (members, used) in enumerate(bins):
            if used + b <= target_bytes:
                bins[i] = (members + [uri], used + b)
                break
        else:
            bins.append(([uri], b))
    return [members for members, _ in bins if len(members) >= 2]


def compact_parquet(spark, path: str,
                    target_bytes: int = 128 * 1024 * 1024) -> int:
    """Compact the small-files tail of a parquet directory: merge
    groups of small files into ≈``target_bytes`` files.  Returns the
    number of files removed (0 = nothing to do).

    The 100 TB operational reality: streaming ingestion and per-epoch
    sinks (``streaming/corpus.py``) accumulate KB-scale files whose
    per-file open/footer cost eventually dominates scans.  Each group
    is rewritten with one job (read N small files → one output file);
    originals are deleted only after the replacement is durable.
    NOTE: the swap is file-level, not transactional — readers racing
    the compactor can see a group twice or missing; at scale this runs
    inside a table-format transaction (Iceberg/Delta commit) or on a
    quiesced partition.  Row contents are preserved exactly.
    """
    import uuid

    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(path)
    fs = root.getFileSystem(conf)
    files = list_data_files(spark, path)
    groups = plan_compaction(files, target_bytes)
    removed = 0
    for members in groups:
        tmp = f"{path}/_compact_{uuid.uuid4().hex[:12]}"
        spark.read.parquet(*members).coalesce(1) \
            .write.mode("overwrite").parquet(tmp)
        # durable replacement first, then retire the originals
        part = [u for u, _ in list_data_files(spark, tmp)]
        assert len(part) == 1
        dst = jvm.org.apache.hadoop.fs.Path(
            f"{path}/compacted-{uuid.uuid4().hex[:12]}.parquet")
        fs.rename(jvm.org.apache.hadoop.fs.Path(part[0]), dst)
        fs.delete(jvm.org.apache.hadoop.fs.Path(tmp), True)
        for uri in members:
            fs.delete(jvm.org.apache.hadoop.fs.Path(uri), False)
            removed += 1
        removed -= 1  # net: group size - 1 files disappear
    return removed
