"""Batch/stream equivalence for the corpus quality gates: the filter
presets are pure narrow Columns, so the SAME operator call must run
unchanged under Structured Streaming (file source → memory sink) and
agree with batch row-for-row — the property that lets one cleaning
spec serve both the backfill and the live ingest path.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _run_stream(spark, make_out, d):
    schema = spark.read.parquet(f"{SF_DIR}/documents.parquet").schema
    stream = spark.readStream.schema(schema).parquet(d)
    out = make_out(stream)
    name = f"filt_{uuid.uuid4().hex[:8]}"
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    return spark.table(name)


def test_gopher_flags_stream_equals_batch(spark):
    from rulemorph_spark.llm.filters import gopher_quality_flags
    batch = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    expected = sorted(map(tuple, gopher_quality_flags(batch).collect()))
    with tempfile.TemporaryDirectory() as d:
        shutil.copy(f"{SF_DIR}/documents.parquet",
                    os.path.join(d, "part-0.parquet"))
        got = sorted(map(tuple, _run_stream(
            spark, gopher_quality_flags, d).collect()))
    assert got == expected and got


def test_c4_and_hash_split_stream_equals_batch(spark):
    from rulemorph_spark.llm.filters import c4_clean_lines, hash_split
    batch = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    def chain(df):
        # c4 with min_line_words=1 keeps sentence-ended single-line
        # synthetic docs flowing; split annotates deterministically
        return hash_split(c4_clean_lines(df, min_line_words=1),
                          weights={"train": 0.8, "valid": 0.2})

    expected = sorted(map(tuple, chain(batch).collect()))
    with tempfile.TemporaryDirectory() as d:
        shutil.copy(f"{SF_DIR}/documents.parquet",
                    os.path.join(d, "part-0.parquet"))
        got = sorted(map(tuple, _run_stream(spark, chain, d).collect()))
    assert got == expected
