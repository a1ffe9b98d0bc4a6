"""Pure-stdlib media codecs for the multimodal pipeline.

Real decoders — no Pillow/soundfile/ffmpeg required (none are
installable in this environment), only ``zlib``/``struct``/``numpy``:

- **PNG**: full decode (8-bit gray / gray+alpha / RGB / RGBA /
  palette, all five scanline filters, non-interlaced) and encode
  (filter 0 + zlib).  Covers the overwhelming majority of real-world
  PNGs; interlaced (Adam7) and 16-bit raise ``UnsupportedMedia``.
- **BMP**: uncompressed 24/32-bit BITMAPINFOHEADER decode.
- **WAV**: RIFF parse + PCM 8/16/32-bit decode to a numpy array.
- **JPEG / GIF**: header probe (dimensions) — full JPEG entropy
  decode is out of scope; probing is what the feature-extract stage
  needs.
- **AVI**: header probe (dimensions, duration, frame count) plus
  real frame extraction from the ``movi`` list — for MJPEG AVIs the
  extracted frames are standalone JPEGs and feed back into the JPEG
  prober, making video frame-sampling a genuine decode path.

These run inside Arrow-batched ``mapInPandas`` workers (see
``multimodal.py``), so per-image Python cost is amortized across
columnar batches and the stage stays a pure narrow map at cluster
scale.  Mirrors the reference's media-probe surface (it shells out to
codec libraries; here the container has none, so the formats are
parsed directly).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


class UnsupportedMedia(ValueError):
    """Payload is recognized but uses a feature this codec lacks."""


class CorruptMedia(ValueError):
    """Payload does not parse as its sniffed format."""


# --------------------------------------------------------------------------
# format sniffing
# --------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def sniff_format(payload: bytes) -> str | None:
    """Identify a payload by magic bytes.

    Returns one of ``png bmp jpeg gif wav avi`` or ``None``.
    """
    if not payload:
        return None
    if payload[:8] == _PNG_SIG:
        return "png"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:2] == b"\xff\xd8":
        return "jpeg"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        return "avi"
    return None


# --------------------------------------------------------------------------
# PNG
# --------------------------------------------------------------------------

def _png_chunks(payload: bytes):
    pos = 8
    n = len(payload)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        if len(data) != length:
            raise CorruptMedia("truncated PNG chunk")
        yield ctype, data
        pos += 12 + length  # len + type + data + crc
        if ctype == b"IEND":
            return
    raise CorruptMedia("PNG missing IEND")


_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def probe_png(payload: bytes) -> dict:
    for ctype, data in _png_chunks(payload):
        if ctype == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data[:13])
            return {"width": int(w), "height": int(h), "bit_depth": depth,
                    "color_type": color, "interlaced": bool(interlace),
                    "channels": _PNG_CHANNELS.get(color)}
    raise CorruptMedia("PNG missing IHDR")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(payload: bytes) -> np.ndarray:
    """Decode a PNG to ``uint8[H, W, C]`` (C per color type; palette → RGB).

    Filters: all five (None/Sub/Up/Average/Paeth).  Vectorized where the
    filter allows (None/Up are whole-row numpy ops); Sub/Average/Paeth
    carry per-pixel state and run as tight per-row loops — fine inside
    an Arrow batch worker where rows are typically thumbnails/tiles.
    """
    hdr = probe_png(payload)
    if hdr["bit_depth"] != 8:
        raise UnsupportedMedia(f"PNG bit depth {hdr['bit_depth']} (only 8)")
    if hdr["interlaced"]:
        raise UnsupportedMedia("interlaced (Adam7) PNG")
    w, h = hdr["width"], hdr["height"]
    channels = hdr["channels"]
    if channels is None:
        raise UnsupportedMedia(f"PNG color type {hdr['color_type']}")

    idat = b"".join(d for t, d in _png_chunks(payload) if t == b"IDAT")
    palette = None
    if hdr["color_type"] == 3:
        for t, d in _png_chunks(payload):
            if t == b"PLTE":
                palette = np.frombuffer(d, dtype=np.uint8).reshape(-1, 3)
                break
        if palette is None:
            raise CorruptMedia("palette PNG missing PLTE")
    raw = zlib.decompress(idat)
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise CorruptMedia("PNG pixel data length mismatch")

    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = channels
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        off = y * (stride + 1)
        ftype = raw[off]
        line = np.frombuffer(raw, dtype=np.uint8,
                             count=stride, offset=off + 1).astype(np.int32)
        if ftype == 0:                      # None
            cur = line
        elif ftype == 2:                    # Up
            cur = (line + prev) & 0xFF
        elif ftype == 1:                    # Sub
            cur = line.copy()
            for i in range(bpp, stride):
                cur[i] = (cur[i] + cur[i - bpp]) & 0xFF
        elif ftype == 3:                    # Average
            cur = line.copy()
            for i in range(stride):
                left = cur[i - bpp] if i >= bpp else 0
                cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:                    # Paeth
            cur = line.copy()
            for i in range(stride):
                left = cur[i - bpp] if i >= bpp else 0
                ul = prev[i - bpp] if i >= bpp else 0
                cur[i] = (cur[i] + _paeth(left, int(prev[i]), ul)) & 0xFF
        else:
            raise CorruptMedia(f"PNG filter type {ftype}")
        out[y] = cur
        prev = cur

    img = out.reshape(h, w, channels)
    if palette is not None:
        img = palette[img[:, :, 0]]
    return img


def encode_png(img: np.ndarray) -> bytes:
    """Encode ``uint8[H, W]`` or ``uint8[H, W, C]`` (C ∈ 1,2,3,4) as PNG."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, channels = img.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}.get(channels)
    if color is None:
        raise UnsupportedMedia(f"cannot encode {channels}-channel image")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    # filter byte 0 per scanline; zlib default level
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    idat = zlib.compress(raw)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + \
            struct.pack(">I", crc)

    return (_PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
            + chunk(b"IEND", b""))


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize via index gather (pure numpy, O(out))."""
    h, w = img.shape[:2]
    ys = (np.arange(height) * (h / height)).astype(np.int64).clip(0, h - 1)
    xs = (np.arange(width) * (w / width)).astype(np.int64).clip(0, w - 1)
    return img[ys][:, xs]


# --------------------------------------------------------------------------
# BMP
# --------------------------------------------------------------------------

def probe_bmp(payload: bytes) -> dict:
    if len(payload) < 54 or payload[:2] != b"BM":
        raise CorruptMedia("not a BMP")
    w, h = struct.unpack("<ii", payload[18:26])
    bpp, compression = struct.unpack("<HI", payload[28:34])
    return {"width": int(w), "height": abs(int(h)), "bits_per_pixel": bpp,
            "compression": compression, "bottom_up": h > 0}


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode uncompressed 24/32-bit BMP to ``uint8[H, W, 3|4]`` (RGB order)."""
    hdr = probe_bmp(payload)
    if hdr["compression"] != 0:
        raise UnsupportedMedia(f"BMP compression {hdr['compression']}")
    if hdr["bits_per_pixel"] not in (24, 32):
        raise UnsupportedMedia(f"BMP {hdr['bits_per_pixel']} bpp")
    (offset,) = struct.unpack("<I", payload[10:14])
    w, h = hdr["width"], hdr["height"]
    nch = hdr["bits_per_pixel"] // 8
    row_bytes = (w * nch + 3) & ~3  # rows padded to 4 bytes
    need = offset + row_bytes * h
    if len(payload) < need:
        raise CorruptMedia("truncated BMP pixel data")
    rows = np.frombuffer(payload, dtype=np.uint8, count=row_bytes * h,
                         offset=offset).reshape(h, row_bytes)
    img = rows[:, :w * nch].reshape(h, w, nch)
    if hdr["bottom_up"]:
        img = img[::-1]
    # BGR(A) → RGB(A)
    img = img[:, :, [2, 1, 0] + ([3] if nch == 4 else [])]
    return np.ascontiguousarray(img)


# --------------------------------------------------------------------------
# JPEG / GIF probes
# --------------------------------------------------------------------------

_JPEG_SOF = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
             0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def probe_jpeg(payload: bytes) -> dict:
    if payload[:2] != b"\xff\xd8":
        raise CorruptMedia("not a JPEG")
    pos, n = 2, len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seg_len,) = struct.unpack(">H", payload[pos + 2:pos + 4])
        if marker in _JPEG_SOF:
            if pos + 9 > n:
                break
            h, w = struct.unpack(">HH", payload[pos + 5:pos + 9])
            ncomp = payload[pos + 9]
            return {"width": int(w), "height": int(h), "channels": int(ncomp)}
        pos += 2 + seg_len
    raise CorruptMedia("JPEG missing SOF marker")


def probe_gif(payload: bytes) -> dict:
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise CorruptMedia("not a GIF")
    w, h = struct.unpack("<HH", payload[6:10])
    return {"width": int(w), "height": int(h)}


# --------------------------------------------------------------------------
# WAV
# --------------------------------------------------------------------------

def _riff_chunks(payload: bytes, start: int = 12):
    pos, n = start, len(payload)
    while pos + 8 <= n:
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        yield cid, pos + 8, size
        pos += 8 + size + (size & 1)  # chunks are word-aligned


def probe_wav(payload: bytes) -> dict:
    if sniff_format(payload) != "wav":
        raise CorruptMedia("not a WAV")
    fmt = None
    data_size = 0
    for cid, off, size in _riff_chunks(payload):
        if cid == b"fmt " and size >= 16:
            (audio_fmt, channels, rate, _br, block_align,
             bits) = struct.unpack("<HHIIHH", payload[off:off + 16])
            fmt = {"audio_format": audio_fmt, "channels": channels,
                   "sample_rate": rate, "block_align": block_align,
                   "bits_per_sample": bits}
        elif cid == b"data":
            data_size = size
    if fmt is None:
        raise CorruptMedia("WAV missing fmt chunk")
    frames = data_size // fmt["block_align"] if fmt["block_align"] else 0
    fmt["n_frames"] = frames
    fmt["duration_ms"] = (frames * 1000) // fmt["sample_rate"] \
        if fmt["sample_rate"] else 0
    return fmt


_WAV_DTYPES = {8: np.uint8, 16: np.int16, 32: np.int32}


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode PCM WAV → (``samples[frames, channels]``, sample_rate)."""
    fmt = probe_wav(payload)
    if fmt["audio_format"] != 1:
        raise UnsupportedMedia(f"WAV audio format {fmt['audio_format']} "
                               "(only PCM)")
    dtype = _WAV_DTYPES.get(fmt["bits_per_sample"])
    if dtype is None:
        raise UnsupportedMedia(f"WAV {fmt['bits_per_sample']}-bit samples")
    for cid, off, size in _riff_chunks(payload):
        if cid == b"data":
            count = size // np.dtype(dtype).itemsize
            samples = np.frombuffer(payload, dtype=dtype, count=count,
                                    offset=off)
            return samples.reshape(-1, fmt["channels"]), fmt["sample_rate"]
    raise CorruptMedia("WAV missing data chunk")


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode int16 ``samples[frames, channels]`` as PCM WAV."""
    samples = np.ascontiguousarray(samples, dtype=np.int16)
    if samples.ndim == 1:
        samples = samples[:, None]
    channels = samples.shape[1]
    data = samples.tobytes()
    block_align = channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
                      sample_rate * block_align, block_align, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


# --------------------------------------------------------------------------
# AVI
# --------------------------------------------------------------------------

def probe_avi(payload: bytes) -> dict:
    """Parse the ``avih`` main header: dimensions, frame count, duration."""
    if sniff_format(payload) != "avi":
        raise CorruptMedia("not an AVI")
    for cid, off, size in _riff_chunks(payload):
        if cid != b"LIST" or payload[off:off + 4] != b"hdrl":
            continue
        for cid2, off2, size2 in _riff_chunks(payload[:off + size],
                                              start=off + 4):
            if cid2 == b"avih" and size2 >= 40:
                vals = struct.unpack("<10I", payload[off2:off2 + 40])
                usec_pf, total_frames = vals[0], vals[4]
                w, h = vals[8], vals[9]
                return {"width": int(w), "height": int(h),
                        "n_frames": int(total_frames),
                        "usec_per_frame": int(usec_pf),
                        "duration_ms": (usec_pf * total_frames) // 1000}
    raise CorruptMedia("AVI missing avih header")


def avi_frames(payload: bytes) -> list[bytes]:
    """Extract raw video-frame chunks from the ``movi`` list.

    For MJPEG AVIs each returned payload is a standalone JPEG (probe it
    with :func:`probe_jpeg`); for other codecs the bytes are the raw
    compressed frame.
    """
    frames: list[bytes] = []
    for cid, off, size in _riff_chunks(payload):
        if cid != b"LIST" or payload[off:off + 4] != b"movi":
            continue
        for cid2, off2, size2 in _riff_chunks(payload[:off + size],
                                              start=off + 4):
            # '00dc'/'00db' = stream-0 compressed/uncompressed video
            if cid2[2:4] in (b"dc", b"db"):
                frames.append(payload[off2:off2 + size2])
    return frames


def encode_avi_mjpeg(frames: list[bytes], width: int, height: int,
                     fps: int = 25) -> bytes:
    """Build a minimal MJPEG AVI from per-frame JPEG payloads.

    Used by tests to exercise the real video probe/frame-extraction
    path without ffmpeg; the output parses in standard players.
    """
    usec_pf = 1_000_000 // fps

    def chunk(cid: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) & 1 else b""
        return cid + struct.pack("<I", len(data)) + data + pad

    def lst(kind: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", kind + data)

    avih = struct.pack("<14I", usec_pf, 0, 0, 0x10, len(frames), 0, 1,
                       0, width, height, 0, 0, 0, 0)
    strh = struct.pack("<4s4sIHHIIIIIIIIhhhh", b"vids", b"MJPG", 0, 0, 0,
                       0, 1, fps, 0, len(frames), 0, 0xFFFFFFFF, 0,
                       0, 0, width, height)
    strf = struct.pack("<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
                       width * height * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


# --------------------------------------------------------------------------
# unified probe
# --------------------------------------------------------------------------

def probe(payload: bytes) -> dict:
    """Sniff + probe any supported payload.

    Returns ``{"format", "width", "height", "channels", "sample_rate",
    "n_frames", "duration_ms"}`` with ``None`` for fields the format
    lacks.  Raises :class:`UnsupportedMedia` for unrecognized bytes.
    """
    base = {"format": None, "width": None, "height": None, "channels": None,
            "sample_rate": None, "n_frames": None, "duration_ms": None}
    fmt = sniff_format(payload)
    if fmt is None:
        raise UnsupportedMedia("unrecognized media payload")
    base["format"] = fmt
    if fmt == "png":
        p = probe_png(payload)
        base.update(width=p["width"], height=p["height"],
                    channels=p["channels"])
    elif fmt == "bmp":
        p = probe_bmp(payload)
        base.update(width=p["width"], height=p["height"],
                    channels=p["bits_per_pixel"] // 8)
    elif fmt == "jpeg":
        p = probe_jpeg(payload)
        base.update(width=p["width"], height=p["height"],
                    channels=p["channels"])
    elif fmt == "gif":
        p = probe_gif(payload)
        base.update(width=p["width"], height=p["height"])
    elif fmt == "wav":
        p = probe_wav(payload)
        base.update(channels=p["channels"], sample_rate=p["sample_rate"],
                    n_frames=p["n_frames"], duration_ms=p["duration_ms"])
    elif fmt == "avi":
        p = probe_avi(payload)
        base.update(width=p["width"], height=p["height"],
                    n_frames=p["n_frames"], duration_ms=p["duration_ms"])
    return base
