"""Batch/stream equivalence for watermarked stream-stream interval
joins (streaming/joins.py): the same click→purchase attribution join
run (a) on batch DataFrames and (b) as two file-source streams with an
availableNow trigger into a memory sink must agree exactly.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import functions as F

from rulemorph_spark.streaming.joins import attribution_join, interval_join
from rulemorph_spark.streaming.windows import event_time

SF_DIR = "/root/testdata/sf0.001"


def _sides(df):
    clicks = (df.filter(F.col("event_type") == "click")
              .select(F.col("event_id").alias("click_id"),
                      "user_id",
                      event_time(F.col("ts")).alias("click_ts")))
    purchases = (df.filter(F.col("event_type") == "purchase")
                 .select(F.col("event_id").alias("purchase_id"),
                         "user_id",
                         event_time(F.col("ts")).alias("purchase_ts")))
    return clicks, purchases


def _result_rows(out):
    return sorted(map(tuple, out.select(
        "purchase_id", "user_id", "click_id").collect()))


def test_attribution_join_stream_equals_batch(spark):
    src = spark.read.parquet(f"{SF_DIR}/events.parquet")
    clicks, purchases = _sides(src)
    expected = _result_rows(attribution_join(
        clicks, purchases, horizon="interval 12 hours"))
    assert len(expected) > 10

    with tempfile.TemporaryDirectory() as d:
        os.makedirs(f"{d}/events")
        shutil.copy(f"{SF_DIR}/events.parquet",
                    f"{d}/events/part-0.parquet")
        stream = spark.readStream.schema(src.schema).parquet(f"{d}/events")
        s_clicks, s_purch = _sides(stream)
        out = attribution_join(s_clicks, s_purch,
                               horizon="interval 12 hours",
                               watermark="10 minutes")
        name = f"attr_{uuid.uuid4().hex[:8]}"
        q = (out.writeStream.format("memory").queryName(name)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)
        got = sorted(map(tuple, spark.table(name).select(
            "purchase_id", "user_id", "click_id").collect()))
    assert got == expected


def test_interval_join_band_semantics(spark):
    """band [lower, upper] is inclusive on both ends and keyed."""
    rows = [(1, "2024-01-01 10:00:00"), (1, "2024-01-01 11:00:00"),
            (2, "2024-01-01 10:30:00")]
    left = spark.createDataFrame(rows, "k int, lts string") \
        .select("k", F.col("lts").cast("timestamp").alias("lts"))
    rrows = [(1, "2024-01-01 10:00:00"),   # == left+0 → in band
             (1, "2024-01-01 10:30:00"),   # +30m → in band
             (1, "2024-01-01 11:00:01"),   # 1s past upper for 10:00
             (2, "2024-01-01 11:30:00"),   # +60m → in band (inclusive)
             (3, "2024-01-01 10:00:00")]   # wrong key
    right = spark.createDataFrame(rrows, "k2 int, rts string") \
        .select("k2", F.col("rts").cast("timestamp").alias("rts"))
    out = interval_join(left, right, left_ts="lts", right_ts="rts",
                        left_key="k", right_key="k2",
                        lower="interval 0 seconds",
                        upper="interval 1 hour")
    got = sorted((r.k, str(r.lts)[11:16], str(r.rts)[11:16])
                 for r in out.collect())
    # (1, 10:00) must NOT match 11:00:01 (1s past its upper bound);
    # (1, 11:00) DOES match it (in [11:00, 12:00]); k=3 never joins
    assert got == [(1, "10:00", "10:00"), (1, "10:00", "10:30"),
                   (1, "11:00", "11:00"), (2, "10:30", "11:30")]
