"""Multimodal column plumbing: image/audio/video as opaque binary + typed
metadata, with decode/feature steps as Arrow-batched ``mapInPandas``.

The Spark-side contract is real and tested — schemas, batch iteration,
partition-preserving shape; the codec calls themselves are stubbed
behind ``DecodeUnavailable`` (no image/audio libraries in this
container) with a deterministic fake for tests.  Swapping in Pillow /
torchaudio is a one-function change inside the pandas iterator.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),     # image|audio|video
    T.StructField("mime", T.StringType(), True),
    T.StructField("payload", T.BinaryType(), True),   # opaque bytes
    T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("sha1", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),
])


class DecodeUnavailable(NotImplementedError):
    """Raised when a real codec is required but not installed."""


def _fake_decode(payload: bytes, kind: str) -> dict:
    """Deterministic stand-in for the codec layer (STUB).

    Real implementation: Pillow for images, soundfile/torchaudio for
    audio, pyav frame sampling for video — replace this function only.
    Env limitation (re-verified round 2): PIL, soundfile, cv2, av and
    librosa are all absent from this container and cannot be installed,
    so the real-decode path is untestable here; the Spark-side plumbing
    (schema, partitioning, Arrow batch shape) is real and tested.
    """
    h = hashlib.sha1(payload or b"").hexdigest()
    seed = int(h[:8], 16)
    if kind == "image":
        return {"width": 64 + seed % 1024, "height": 64 + (seed >> 10) % 1024,
                "duration_ms": None}
    if kind in ("audio", "video"):
        return {"width": None, "height": None,
                "duration_ms": 1000 + seed % 600000}
    raise DecodeUnavailable(f"unknown media kind: {kind}")


def extract_features(df: DataFrame, *, use_stub: bool = True) -> DataFrame:
    """Decode/probe each media payload → typed feature rows.

    ``mapInPandas`` keeps Arrow batches columnar end-to-end; partitioning
    is preserved (no shuffle), so a 100 TB media table processes as a
    pure map stage.
    """
    if not use_stub:
        raise DecodeUnavailable(
            "real codecs are not installed in this environment")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            # itertuples over the three needed columns — iterrows
            # materializes a Series per row (10×+ slower per batch)
            for media_id, kind, payload in zip(
                    pdf["media_id"], pdf["kind"], pdf["payload"]):
                payload = bytes(payload) if payload is not None else b""
                d = _fake_decode(payload, kind)
                feats.append({
                    "media_id": media_id,
                    "kind": kind,
                    "n_bytes": len(payload),
                    "sha1": hashlib.sha1(payload).hexdigest(),
                    "width": d["width"],
                    "height": d["height"],
                    "duration_ms": d["duration_ms"],
                })
            yield pd.DataFrame(feats, columns=[f.name for f in FEATURE_SCHEMA])

    return df.mapInPandas(batches, FEATURE_SCHEMA)


PROBE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("md5", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),
])


def probe_payloads(df: DataFrame, id_col: str = "media_id",
                   kind_col: str = "kind",
                   payload_col: str = "payload") -> DataFrame:
    """Oracle-able twin of ``extract_features``: same Arrow-batched
    ``mapInPandas`` plumbing (the real multimodal execution path), but
    the deterministic fake decode is seeded from md5 so a SQL engine
    can replay it bit-for-bit.  Used by the correctness gate to prove
    the batch iteration, schema, and partition-preserving shape — the
    codec call is the only stubbed piece (see ``_fake_decode``).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for media_id, kind, payload in zip(
                    pdf["media_id"], pdf["kind"], pdf["payload"]):
                payload = bytes(payload) if payload is not None else b""
                h = hashlib.md5(payload).hexdigest()
                seed = int(h[:8], 16)
                width = height = duration = None
                if kind == "image":
                    width = 64 + seed % 1024
                    height = 64 + (seed >> 10) % 1024
                else:
                    duration = 1000 + seed % 600000
                out.append({"media_id": media_id, "kind": kind,
                            "n_bytes": len(payload), "md5": h,
                            "width": width, "height": height,
                            "duration_ms": duration})
            yield pd.DataFrame(out, columns=[f.name for f in PROBE_SCHEMA])

    cols = [F.col(id_col).alias("media_id"), F.col(kind_col).alias("kind"),
            F.col(payload_col).alias("payload")]
    return df.select(*cols).mapInPandas(batches, PROBE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Plan video frame-sampling: one row per (media_id, frame_ts).

    The expensive decode happens downstream per planned frame; planning
    itself is a pure projection + explode (scales linearly).
    """
    feats = extract_features(df)
    ts = F.sequence(F.lit(0),
                    F.coalesce(F.col("duration_ms"), F.lit(0)),
                    F.lit(every_ms))
    return (feats.filter(F.col("kind") == "video")
            .select("media_id", F.explode(ts).alias("frame_ts_ms")))


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (payload = seeded bytes)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(str(i).encode()).digest() * 4
        rows.append((i, kind, f"application/x-{kind}", payload,
                     {"src": f"synthetic://{i}"}))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
