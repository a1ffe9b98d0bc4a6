"""Scale-adaptive scan spreading.

A parquet scan's task count is bounded by the file's row-group layout:
Spark assigns every row group to the byte split containing its
midpoint, so a single-row-group file yields exactly ONE non-empty scan
task no matter how small ``spark.sql.files.maxPartitionBytes`` is or
how many cores the session has.  For inputs whose per-row compute
dominates (hash signatures, text metrics, per-row HOF pipelines) that
serializes the whole query on one core.

``spread_small_scan`` redistributes such a scan across the session's
default parallelism — but ONLY when the scanned files are provably
tiny (total bytes ≤ a threshold), so the round-robin exchange it adds
is bounded by the threshold.  At production scale the inputs exceed
the threshold and the helper is an exact no-op: the plan is unchanged,
no exchange is added.  This is the scale-adaptive form the
optimization guide asks for (§2: derive partitioning from input size,
not from a constant tuned for one deployment).

The threshold is configurable via ``SPARK_GRAFT_SPREAD_MAX_MB``
(default 64; ``0`` disables spreading entirely).  64 MB round-robin
exchanges cost milliseconds on any hardware, while the serial-scan
penalty they remove grows with per-row compute.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

_ENV = "SPARK_GRAFT_SPREAD_MAX_MB"
_DEFAULT_MB = 64.0


def _max_bytes() -> int:
    try:
        mb = float(os.environ.get(_ENV, _DEFAULT_MB))
    except ValueError:
        mb = _DEFAULT_MB
    return int(mb * 1024 * 1024)


def scan_bytes(df: DataFrame) -> int | None:
    """Total on-disk bytes behind ``df``'s scan, or None when unknown
    (non-local files, empty listing, or a non-scan plan)."""
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    total = 0
    for uri in files:
        if uri.startswith("file:"):
            path = uri[5:]
            while path.startswith("//"):
                path = path[1:]
        elif uri.startswith("/"):
            path = uri
        else:
            return None  # remote storage: size unknown, stay a no-op
        try:
            total += os.path.getsize(path)
        except OSError:
            return None
    return total


def spread_small_scan(df: DataFrame, max_bytes: int | None = None
                      ) -> DataFrame:
    """Round-robin the rows of a *tiny* scan across the session's
    cores; identity for anything at scale (see module docstring).

    Use at query sites where heavy per-row compute follows the scan
    directly (before any exchange of its own).  Do NOT use in front of
    an aggregation/join whose exchange would redistribute anyway, or
    where per-row work is trivial — the added exchange only pays for
    itself when it unlocks parallel compute.
    """
    limit = _max_bytes() if max_bytes is None else max_bytes
    if limit <= 0:
        return df
    total = scan_bytes(df)
    if total is None or total > limit:
        return df
    spark = df.sparkSession
    return df.repartition(spark.sparkContext.defaultParallelism)
