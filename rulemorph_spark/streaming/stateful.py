"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has no stateful streaming (SURVEY §2.1 "not present");
this is part of the engine's Spark-native extension surface: per-key
state machines over unbounded streams, with timeout-driven emission.

``sessionize`` implements the canonical example — gap-based user
sessions over an event stream: events within ``gap_ms`` of each other
belong to one session; a session emits when the gap passes (processing-
time timeout) or the stream ends.  State per user is O(1) (count +
bounds), so 10⁹ keys shard across executors with no full-history
retention.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("session_start_ms", T.LongType()),
    T.StructField("session_end_ms", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("total_value", T.DoubleType()),
])

_STATE_SCHEMA = T.StructType([
    T.StructField("start_ms", T.LongType()),
    T.StructField("end_ms", T.LongType()),
    T.StructField("n", T.LongType()),
    T.StructField("total", T.DoubleType()),
])


def sessionize(events: DataFrame, gap_ms: int = 30 * 60 * 1000,
               user_col: str = "user_id", ts_col: str = "ts_ms",
               value_col: str = "value") -> DataFrame:
    """Gap-based sessionization of a streaming (or batch) DataFrame.

    Input columns: ``user_id`` long, ``ts_ms`` long (epoch millis),
    ``value`` double.  Output: one row per closed session.
    """

    def fn(key, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            if state.exists:
                start_ms, end_ms, n, total = state.get
                state.remove()
                yield pd.DataFrame([{
                    "user_id": user_id, "session_start_ms": start_ms,
                    "session_end_ms": end_ms, "n_events": n,
                    "total_value": total,
                }])
            return

        if state.exists:
            start_ms, end_ms, n, total = state.get
        else:
            start_ms, end_ms, n, total = None, None, 0, 0.0

        closed = []
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            for ts, value in zip(pdf[ts_col], pdf[value_col]):
                ts = int(ts)
                if start_ms is None:
                    start_ms, end_ms, n, total = ts, ts, 1, float(value)
                elif ts - end_ms <= gap_ms:
                    end_ms, n = max(end_ms, ts), n + 1
                    total += float(value)
                else:
                    closed.append({
                        "user_id": user_id, "session_start_ms": start_ms,
                        "session_end_ms": end_ms, "n_events": n,
                        "total_value": total,
                    })
                    start_ms, end_ms, n, total = ts, ts, 1, float(value)

        if start_ms is not None:
            state.update((start_ms, end_ms, n, total))
            state.setTimeoutDuration(gap_ms)
        if closed:
            yield pd.DataFrame(closed)

    return (events.groupBy(user_col)
            .applyInPandasWithState(
                fn, outputStructType=SESSION_SCHEMA,
                stateStructType=_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.ProcessingTimeTimeout))
