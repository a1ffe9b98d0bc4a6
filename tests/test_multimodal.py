"""Multimodal column plumbing tests: schema, Arrow batch iteration,
deterministic stub decode, frame-sample planning (llm/multimodal.py).
The codec layer is stubbed (no image/audio libs in this container); the
Spark-side contract is what's under test."""

from __future__ import annotations

from pyspark.sql import functions as F

from rulemorph_spark.llm.multimodal import (FEATURE_SCHEMA, extract_features,
                                            frame_sample_plan,
                                            synthetic_media)


def test_extract_features_schema_and_determinism(spark):
    media = synthetic_media(spark, n=12)
    feats = extract_features(media)
    assert feats.schema == FEATURE_SCHEMA
    rows = {r["media_id"]: r for r in feats.collect()}
    assert len(rows) == 12
    # images get dimensions, audio/video get durations
    assert rows[0]["kind"] == "image" and rows[0]["width"] is not None
    assert rows[1]["kind"] == "audio" and rows[1]["duration_ms"] is not None
    assert rows[0]["n_bytes"] == 128  # 32-byte sha256 digest * 4
    # deterministic: same payload → same features on a second run
    again = {r["media_id"]: r for r in extract_features(media).collect()}
    assert again[5] == rows[5]


def test_frame_sample_plan(spark):
    media = synthetic_media(spark, n=9)
    plan = frame_sample_plan(media, every_ms=100000)
    rows = plan.collect()
    assert set(plan.columns) == {"media_id", "frame_ts_ms"}
    # only video rows are planned; frames start at t=0
    kinds = {r["media_id"] % 3 for r in rows}
    assert kinds == {2}
    assert min(r["frame_ts_ms"] for r in rows) == 0
