"""Batch/stream equivalence for watermark-bounded exact dedup
(streaming/dedup.py): with a watermark horizon covering the whole
dataset, the stream's first-occurrence dedup keeps exactly the batch
distinct key set, with bounded state in the streaming planner.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import functions as F

from rulemorph_spark.streaming.dedup import dedup_stream
from rulemorph_spark.streaming.windows import event_time

SF_DIR = "/root/testdata/sf0.001"


def _prepared(df):
    return df.select(event_time(F.col("ts")).alias("ets"),
                     "user_id", "event_type")


def test_stream_dedup_equals_batch_distinct(spark):
    batch = _prepared(spark.read.parquet(f"{SF_DIR}/events.parquet"))
    expected = sorted(map(tuple, batch.select("user_id", "event_type")
                          .distinct().collect()))
    assert len(expected) > 10

    schema = spark.read.parquet(f"{SF_DIR}/events.parquet").schema
    with tempfile.TemporaryDirectory() as d:
        shutil.copy(f"{SF_DIR}/events.parquet",
                    os.path.join(d, "part-0.parquet"))
        stream = _prepared(spark.readStream.schema(schema).parquet(d))
        out = dedup_stream(stream, ["user_id", "event_type"], "ets",
                           delay="3650 days")
        name = f"dedup_{uuid.uuid4().hex[:8]}"
        q = (out.select("user_id", "event_type")
             .writeStream.format("memory").queryName(name)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)
        got = sorted(map(tuple, spark.table(name).collect()))
    assert got == expected
