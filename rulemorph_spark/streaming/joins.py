"""Watermarked stream-stream joins (Spark-native extension surface).

The reference engine has no event-time processing (SURVEY §2.1 "not
present"), so this is pure Spark capability a large-scale event
pipeline needs: correlating two live streams (click↔purchase,
impression↔conversion) with bounded state.

Mechanics on a stream: both sides carry watermarks and the join
condition carries an event-time band (``right.ts ∈ [left.ts + lower,
left.ts + upper]``), so Spark can prove when a buffered row can no
longer match and evict it — state is bounded by
``rate × (watermark + band width)`` per key, independent of stream
length.  The same expression on batch DataFrames is a plain equi-join
with a band filter, which is what the batch/stream equivalence test
asserts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(left: DataFrame, right: DataFrame, *,
                  left_ts: str, right_ts: str,
                  left_key: str, right_key: str,
                  lower: str = "interval 0 seconds",
                  upper: str = "interval 1 hour",
                  left_watermark: str | None = None,
                  right_watermark: str | None = None,
                  how: str = "inner") -> DataFrame:
    """Key-equality join with an event-time band:
    ``right_ts ∈ [left_ts + lower, left_ts + upper]``.

    On streaming inputs pass both watermarks (required by Spark for
    state eviction; inner joins strictly, outer joins additionally
    need them to emit nulls).  On batch inputs watermarks are
    no-op-compatible and the band is an ordinary filter.

    The band is the state-bounding knob: at 100 TB/day of events, a
    1-hour band with a 10-minute watermark keeps only ~70 minutes of
    the faster stream buffered per partition — never the full history.
    """
    if left_watermark is not None:
        left = left.withWatermark(left_ts, left_watermark)
    if right_watermark is not None:
        right = right.withWatermark(right_ts, right_watermark)
    lcol, rcol = F.col(left_ts), F.col(right_ts)
    cond = ((F.col(left_key) == F.col(right_key)) &
            (rcol >= lcol + F.expr(lower)) &
            (rcol <= lcol + F.expr(upper)))
    return left.join(right, cond, how)


def attribution_join(clicks: DataFrame, purchases: DataFrame, *,
                     user_col: str = "user_id",
                     click_ts: str = "click_ts",
                     purchase_ts: str = "purchase_ts",
                     horizon: str = "interval 1 hour",
                     watermark: str = "10 minutes") -> DataFrame:
    """The canonical shape: each purchase joined to every click by the
    same user in the preceding ``horizon`` — a thin preset over
    :func:`interval_join` (purchase side is ``left`` so the band reads
    "click happened at most ``horizon`` before the purchase")."""
    return interval_join(
        purchases,
        clicks.withColumnRenamed(user_col, f"__c_{user_col}"),
        left_ts=purchase_ts, right_ts=click_ts,
        left_key=user_col, right_key=f"__c_{user_col}",
        lower=f"-{horizon}", upper="interval 0 seconds",
        left_watermark=watermark, right_watermark=watermark,
    ).drop(f"__c_{user_col}")
