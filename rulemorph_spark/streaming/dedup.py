"""Streaming exact deduplication with bounded state.

The batch engine's exact dedup (``llm/dedup.dedup_exact``) keeps one
row per key via a hash aggregation; on an unbounded stream the naive
equivalent (``dropDuplicates``) grows state forever.  The scale-safe
operator is ``dropDuplicatesWithinWatermark``: the watermark bounds how
long a key is remembered, so state size = distinct keys within the
watermark horizon, independent of stream length.  Keys recurring
further apart than the horizon re-emit — the standard trade-off for
bounded state; size the delay to the source's real duplicate window
(e.g. an at-least-once ingestion's redelivery window, usually minutes).

Streaming-only: Spark rejects ``dropDuplicatesWithinWatermark`` on a
batch DataFrame.  The equivalence test runs a real file-source stream
with a horizon covering the dataset and compares against batch
``distinct()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream(df: DataFrame, keys: list[str], ts_col: str,
                 delay: str = "1 hour") -> DataFrame:
    """First-occurrence exact dedup on ``keys`` with watermark-bounded
    state.  ``ts_col`` must be a timestamp column (see
    ``windows.event_time``)."""
    return (df.withWatermark(ts_col, delay)
            .dropDuplicatesWithinWatermark(keys))
