"""Pure-stdlib codec layer: PNG/BMP/WAV round-trips, JPEG/GIF/AVI
probes, and the real (non-stub) multimodal Spark operators.

Closes the round-1 'real codecs' gap without external libraries: the
decoders parse the formats directly (zlib/struct/numpy), and the
Spark tests run them through the same Arrow-batched ``mapInPandas``
plumbing the stub path uses.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from rulemorph_spark.llm import codecs as C

# ---------------------------------------------------------------- PNG


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_round_trip(channels):
    rng = np.random.default_rng(42 + channels)
    img = rng.integers(0, 256, size=(37, 23, channels), dtype=np.uint8)
    png = C.encode_png(img)
    assert C.sniff_format(png) == "png"
    hdr = C.probe_png(png)
    assert (hdr["width"], hdr["height"]) == (23, 37)
    assert hdr["channels"] == channels
    dec = C.decode_png(png)
    assert dec.shape == img.shape
    assert (dec == img).all()


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
    return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)


def test_png_all_five_filters_decode():
    """Hand-filter each scanline with filter type y%5 and check the
    decoder inverts every filter exactly."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(10, 8, 3), dtype=np.uint8)
    h, w, chn = img.shape
    stride = w * chn
    rows, prev = [], np.zeros(stride, dtype=np.int32)
    for y in range(h):
        cur = img[y].reshape(-1).astype(np.int32)
        f = y % 5
        enc = cur.copy()
        if f == 1:
            enc[chn:] = (cur[chn:] - cur[:-chn]) % 256
        elif f == 2:
            enc = (cur - prev) % 256
        elif f == 3:
            for i in range(stride):
                left = cur[i - chn] if i >= chn else 0
                enc[i] = (cur[i] - ((left + prev[i]) >> 1)) % 256
        elif f == 4:
            for i in range(stride):
                left = cur[i - chn] if i >= chn else 0
                ul = prev[i - chn] if i >= chn else 0
                enc[i] = (cur[i] - C._paeth(left, int(prev[i]), ul)) % 256
        rows.append(bytes([f]) + bytes(enc.astype(np.uint8)))
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (C._PNG_SIG + _png_chunk(b"IHDR", ihdr)
           + _png_chunk(b"IDAT", zlib.compress(b"".join(rows)))
           + _png_chunk(b"IEND", b""))
    assert (C.decode_png(png) == img).all()


def test_png_palette_decode():
    rng = np.random.default_rng(3)
    pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, size=(5, 7), dtype=np.uint8)
    ihdr = struct.pack(">IIBBBBB", 7, 5, 8, 3, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(idx[y]) for y in range(5))
    png = (C._PNG_SIG + _png_chunk(b"IHDR", ihdr)
           + _png_chunk(b"PLTE", pal.tobytes())
           + _png_chunk(b"IDAT", zlib.compress(raw))
           + _png_chunk(b"IEND", b""))
    assert (C.decode_png(png) == pal[idx]).all()


def test_png_unsupported_and_corrupt():
    ihdr16 = struct.pack(">IIBBBBB", 4, 4, 16, 2, 0, 0, 0)
    png16 = (C._PNG_SIG + _png_chunk(b"IHDR", ihdr16)
             + _png_chunk(b"IEND", b""))
    with pytest.raises(C.UnsupportedMedia):
        C.decode_png(png16)
    with pytest.raises(C.CorruptMedia):
        C.probe_png(C._PNG_SIG + b"\x00\x00")


def test_resize_nearest():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    up = C.resize_nearest(img, 16, 4)
    assert up.shape == (4, 16, 3)
    # nearest-neighbor: every output pixel equals some input pixel
    assert (C.resize_nearest(img, 8, 8) == img).all()


# ---------------------------------------------------------------- BMP


def _make_bmp(pix: np.ndarray) -> bytes:
    bh, bw = pix.shape[:2]
    row_bytes = (bw * 3 + 3) & ~3
    rows = []
    for y in range(bh - 1, -1, -1):           # bottom-up
        bgr = pix[y][:, ::-1].tobytes()
        rows.append(bgr + b"\x00" * (row_bytes - len(bgr)))
    data = b"".join(rows)
    return (b"BM" + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
            + struct.pack("<IiiHHIIiiII", 40, bw, bh, 1, 24, 0,
                          len(data), 0, 0, 0, 0) + data)


def test_bmp_decode():
    rng = np.random.default_rng(9)
    pix = rng.integers(0, 256, size=(4, 6, 3), dtype=np.uint8)
    bmp = _make_bmp(pix)
    assert C.sniff_format(bmp) == "bmp"
    hdr = C.probe_bmp(bmp)
    assert (hdr["width"], hdr["height"]) == (6, 4)
    assert (C.decode_bmp(bmp) == pix).all()


# ---------------------------------------------------------------- WAV


def test_wav_round_trip():
    rng = np.random.default_rng(5)
    samples = rng.integers(-3000, 3000, size=(4410, 2), dtype=np.int16)
    wav = C.encode_wav(samples, 44100)
    hdr = C.probe_wav(wav)
    assert hdr["channels"] == 2
    assert hdr["sample_rate"] == 44100
    assert hdr["n_frames"] == 4410
    assert hdr["duration_ms"] == 100
    dec, rate = C.decode_wav(wav)
    assert rate == 44100
    assert (dec == samples).all()


def test_wav_non_pcm_rejected():
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 16000, 2, 16)  # IEEE float
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 4) + b"\x00" * 4)
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(C.UnsupportedMedia):
        C.decode_wav(wav)


# ------------------------------------------------------- JPEG/GIF/AVI


def _make_jpeg(width: int, height: int) -> bytes:
    return (b"\xff\xd8"
            + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
            + b"\x00" * 9
            + b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"
            + struct.pack(">HH", height, width) + b"\x03" + b"\x00" * 9
            + b"\xff\xd9")


def test_jpeg_probe():
    assert C.probe_jpeg(_make_jpeg(640, 480)) == {
        "width": 640, "height": 480, "channels": 3}


def test_gif_probe():
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 10
    assert C.probe_gif(gif) == {"width": 320, "height": 200}


def test_avi_probe_and_frames():
    frames = [_make_jpeg(64, 48), _make_jpeg(64, 48), _make_jpeg(64, 48)]
    avi = C.encode_avi_mjpeg(frames, 64, 48, fps=10)
    hdr = C.probe_avi(avi)
    assert (hdr["width"], hdr["height"]) == (64, 48)
    assert hdr["n_frames"] == 3
    assert hdr["duration_ms"] == 300
    out = C.avi_frames(avi)
    assert out == frames
    assert C.probe_jpeg(out[0])["width"] == 64


def test_unified_probe_dispatch():
    rng = np.random.default_rng(2)
    png = C.encode_png(rng.integers(0, 256, size=(5, 5, 3), dtype=np.uint8))
    wav = C.encode_wav(rng.integers(-100, 100, size=(80, 1),
                                    dtype=np.int16), 8000)
    avi = C.encode_avi_mjpeg([_make_jpeg(10, 10)], 10, 10)
    gif = b"GIF87a" + struct.pack("<HH", 1, 2) + b"\x00" * 4
    for payload, fmt in [(png, "png"), (wav, "wav"), (avi, "avi"),
                         (gif, "gif"), (_make_jpeg(3, 4), "jpeg")]:
        assert C.probe(payload)["format"] == fmt
    with pytest.raises(C.UnsupportedMedia):
        C.probe(b"not media at all")


# --------------------------------------------------- Spark operators


@pytest.fixture(scope="module")
def spark():
    from rulemorph_spark.engine import get_spark
    return get_spark("test-codecs", cpus="4")


def test_extract_features_real(spark):
    from rulemorph_spark.llm.multimodal import (extract_features,
                                                synthetic_real_media)
    media = synthetic_real_media(spark, n=12)
    feats = {r["media_id"]: r for r in
             extract_features(media, use_stub=False).collect()}
    assert len(feats) == 12
    for i, row in feats.items():
        assert row["error"] is None, row["error"]
        if row["kind"] == "image":
            assert row["format"] == "png"
            assert row["width"] == 12 + i % 5
            assert row["height"] == 16 + i % 7
        elif row["kind"] == "audio":
            assert row["format"] == "wav"
            assert row["sample_rate"] == 8000
            assert row["duration_ms"] == (800 + 100 * (i % 4)) * 1000 // 8000
        else:
            assert row["format"] == "avi"
            assert row["width"] == 64 + i
            assert row["n_frames"] == 2 + i % 3


def test_extract_features_real_corrupt_isolated(spark):
    """A corrupt payload yields an error row; good rows still decode."""
    from rulemorph_spark.llm.multimodal import (MEDIA_SCHEMA,
                                                extract_features)
    rng = np.random.default_rng(11)
    good = C.encode_png(rng.integers(0, 256, size=(4, 4, 3),
                                     dtype=np.uint8))
    bad = b"\x89PNG\r\n\x1a\n" + b"garbage"
    df = spark.createDataFrame(
        [(0, "image", "image/png", good, {}),
         (1, "image", "image/png", bad, {})], MEDIA_SCHEMA)
    rows = {r["media_id"]: r for r in
            extract_features(df, use_stub=False).collect()}
    assert rows[0]["error"] is None and rows[0]["width"] == 4
    assert rows[1]["error"] is not None and rows[1]["width"] is None


def test_resize_images_spark(spark):
    from rulemorph_spark.llm.multimodal import (resize_images,
                                                synthetic_real_media)
    media = synthetic_real_media(spark, n=9).filter("kind = 'image'")
    out = {r["media_id"]: r for r in
           resize_images(media, 8, 6).collect()}
    assert len(out) == 3
    for row in out.values():
        assert row["error"] is None
        img = C.decode_png(bytes(row["payload"]))
        assert img.shape == (6, 8, 3)


def test_audio_stats_spark(spark):
    from rulemorph_spark.llm.multimodal import (audio_stats,
                                                synthetic_real_media)
    media = synthetic_real_media(spark, n=9).filter("kind = 'audio'")
    rows = audio_stats(media).collect()
    assert len(rows) == 3
    for row in rows:
        assert row["error"] is None
        assert row["sample_rate"] == 8000
        assert 0.0 < row["rms"] <= row["peak"] <= 1.0


def test_extract_frames_spark(spark):
    from rulemorph_spark.llm.multimodal import (extract_frames,
                                                synthetic_real_media)
    media = synthetic_real_media(spark, n=9).filter("kind = 'video'")
    rows = extract_frames(media).collect()
    # media_ids 2,5,8 → 2+2%3, 2+5%3, 2+8%3 = 4,4,4 frames... (i%3)
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r)
    for i, frames in by_id.items():
        assert len(frames) == 2 + i % 3
        for fr in sorted(frames, key=lambda r: r["frame_index"]):
            assert fr["frame_width"] == 64 + i
            assert fr["frame_height"] == 48 + i
            assert C.probe_jpeg(bytes(fr["frame_payload"]))

    # stride sampling keeps frame 0 and drops within-stride frames
    sampled = extract_frames(media, every_ms=100_000).collect()
    assert {r["frame_index"] for r in sampled} == {0}


# ------------------------------------------------- property round-trips

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 40), st.integers(1, 40), st.integers(1, 4),
       st.integers(0, 2**32 - 1))
def test_png_round_trip_property(h, w, channels, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, channels), dtype=np.uint8)
    dec = C.decode_png(C.encode_png(img))
    assert dec.shape == img.shape and (dec == img).all()


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 2000), st.integers(1, 3),
       st.sampled_from([8000, 16000, 44100]), st.integers(0, 2**32 - 1))
def test_wav_round_trip_property(frames, channels, rate, seed):
    rng = np.random.default_rng(seed)
    samples = rng.integers(-32768, 32768, size=(frames, channels),
                           dtype=np.int16)
    wav = C.encode_wav(samples, rate)
    hdr = C.probe_wav(wav)
    assert hdr["n_frames"] == frames and hdr["channels"] == channels
    dec, got_rate = C.decode_wav(wav)
    assert got_rate == rate and (dec == samples).all()


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 64), st.integers(1, 64), st.integers(1, 64),
       st.integers(1, 64), st.integers(0, 2**32 - 1))
def test_resize_property(h, w, oh, ow, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    out = C.resize_nearest(img, ow, oh)
    assert out.shape == (oh, ow, 3)
    # every output pixel is an input pixel (nearest-neighbor invariant)
    flat_in = {img[y, x].tobytes() for y in range(h) for x in range(w)}
    sample = out[rng.integers(0, oh)][rng.integers(0, ow)]
    assert sample.tobytes() in flat_in
