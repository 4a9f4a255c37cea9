"""Pure-numpy media codecs for the UNCOMPRESSED formats — no
third-party codec library needed, so these paths are REAL in any
environment:

* PPM (P6 binary)      — decode + encode, RGB uint8
* BMP (24-bit, BI_RGB) — decode + encode (bottom-up rows, 4-byte pad)
* WAV (PCM 8/16/32)    — decode via the stdlib ``wave`` module
* Y4M (YUV4MPEG2)      — uncompressed video, luma-plane frames

Baseline JPEG (pure-numpy T.81 codec, :mod:`.jpeg`) and 8-bit PNG
(stdlib zlib + numpy unfiltering, :mod:`.png`) additionally
decode/encode for REAL — round-trip tested, no external library.
Remaining compressed formats (FLAC/MP4/WEBP...) still require
external libraries and stay stubbed in ``multimodal.py`` — the format
sniffer here tells the stages which payloads they can decode for
real.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np


def sniff_format(payload: bytes) -> str:
    """'ppm' | 'bmp' | 'wav' | 'y4m' | 'jpeg' | 'png' | 'gif' |
    'unknown' from magic bytes."""
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:9] == b"YUV4MPEG2":
        return "y4m"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    return "unknown"


# ---------------------------------------------------------------------------
# PPM (P6)
# ---------------------------------------------------------------------------

def decode_ppm(payload: bytes) -> np.ndarray:
    """P6 binary PPM -> (H, W, 3) uint8.  Header: 'P6' <w> <h> <maxval>
    separated by whitespace/comments, then raw RGB."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    # tokenize the header: three ints after the magic, skipping
    # '#' comments
    pos = 2
    vals = []
    while len(vals) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":
            while pos < len(payload) and payload[pos:pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        vals.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = vals
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    n = w * h * 3
    return np.frombuffer(payload, np.uint8, count=n, offset=pos) \
        .reshape(h, w, 3).copy()


def encode_ppm(img: np.ndarray) -> bytes:
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


# ---------------------------------------------------------------------------
# BMP (24-bit BI_RGB)
# ---------------------------------------------------------------------------

def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP -> (H, W, 3) uint8 (RGB).  Rows are
    stored bottom-up, BGR, padded to 4-byte multiples."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ValueError("unsupported BMP header")
    w, h = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, comp={compression})")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(payload, np.uint8, count=stride * h,
                         offset=data_off).reshape(h, stride)
    img = rows[:, :w * 3].reshape(h, w, 3)[..., ::-1]  # BGR -> RGB
    if not top_down:
        img = img[::-1]
    return img.copy()


def encode_bmp(img: np.ndarray) -> bytes:
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, :w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    pixel_bytes = rows.tobytes()
    file_hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pixel_bytes),
                           0, 0, 14 + 40)
    info_hdr = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                           len(pixel_bytes), 2835, 2835, 0, 0)
    return file_hdr + info_hdr + pixel_bytes


# ---------------------------------------------------------------------------
# WAV (PCM)
# ---------------------------------------------------------------------------

def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV -> (float32 mono samples in [-1, 1], sample_rate).
    Multi-channel audio is averaged to mono."""
    with wave.open(io.BytesIO(payload), "rb") as f:
        rate = f.getframerate()
        width = f.getsampwidth()
        nchan = f.getnchannels()
        raw = f.readframes(f.getnframes())
    if width == 2:
        x = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, np.int32).astype(np.float32) / 2147483648.0
    elif width == 1:
        x = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported sample width {width}")
    if nchan > 1:
        x = x.reshape(-1, nchan).mean(axis=1)
    return x, rate


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """float32 [-1, 1] mono -> 16-bit PCM WAV bytes."""
    pcm = np.clip(samples, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(pcm.tobytes())
    return buf.getvalue()


# ---------------------------------------------------------------------------
# resize / features (pure numpy)
# ---------------------------------------------------------------------------

def resize_nearest(img: np.ndarray, height: int, width: int) -> np.ndarray:
    """Nearest-neighbour resize via index gather — the dependency-free
    standardization step before feature extraction."""
    h, w = img.shape[:2]
    yi = np.minimum((np.arange(height) * h) // height, h - 1)
    xi = np.minimum((np.arange(width) * w) // width, w - 1)
    return img[yi][:, xi]


def image_features(img: np.ndarray) -> np.ndarray:
    """8-float summary: per-channel mean/std (scaled to [0,1]), log
    area, aspect ratio — deterministic, codec-independent."""
    f = img.astype(np.float32) / 255.0
    means = f.mean(axis=(0, 1))
    stds = f.std(axis=(0, 1))
    h, w = img.shape[:2]
    return np.concatenate([
        means, stds,
        np.array([np.log1p(h * w) / 20.0, h / max(w, 1)], np.float32),
    ]).astype(np.float32)


# ---------------------------------------------------------------------------
# Y4M (YUV4MPEG2) — uncompressed video
# ---------------------------------------------------------------------------

def decode_y4m(payload: bytes):
    """YUV4MPEG2 (uncompressed) -> (frames, width, height, fps) where
    ``frames`` is a list of (H, W) uint8 LUMA planes (the Y channel —
    chroma is parsed and skipped).  Supports C420 (default) and C444
    subsampling.  A REAL standard container decodable with zero codec
    libraries; compressed video (MP4/WebM...) stays stubbed."""
    if not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    nl = payload.index(b"\n")
    header = payload[:nl].decode("ascii", "replace").split(" ")
    w = h = 0
    fps = 0.0
    csp = "420"
    for tok in header[1:]:
        if not tok:
            continue
        if tok[0] == "W":
            w = int(tok[1:])
        elif tok[0] == "H":
            h = int(tok[1:])
        elif tok[0] == "F":
            num, den = tok[1:].split(":")
            fps = float(num) / float(den)
        elif tok[0] == "C":
            csp = tok[1:]
    if w <= 0 or h <= 0:
        raise ValueError("missing W/H in y4m header")
    if csp.startswith("420"):
        frame_bytes = w * h + 2 * ((w // 2) * (h // 2))
    elif csp.startswith("444"):
        frame_bytes = w * h * 3
    else:
        raise ValueError(f"unsupported y4m colourspace C{csp}")
    frames = []
    pos = nl + 1
    while pos < len(payload):
        fnl = payload.index(b"\n", pos)
        if not payload[pos:fnl].startswith(b"FRAME"):
            raise ValueError("bad y4m FRAME marker")
        pos = fnl + 1
        y = np.frombuffer(payload, np.uint8, count=w * h,
                          offset=pos).reshape(h, w)
        frames.append(y.copy())
        pos += frame_bytes
    return frames, w, h, fps


def encode_y4m(frames, fps: int = 25) -> bytes:
    """list of (H, W) uint8 luma planes -> YUV4MPEG2 C420 bytes
    (chroma planes neutral 128)."""
    h, w = frames[0].shape
    out = [b"YUV4MPEG2 W%d H%d F%d:1 Ip A1:1 C420\n" % (w, h, fps)]
    chroma = np.full(((h // 2) * (w // 2)), 128, np.uint8).tobytes()
    for f in frames:
        assert f.shape == (h, w) and f.dtype == np.uint8
        out.append(b"FRAME\n")
        out.append(f.tobytes())
        out.append(chroma)
        out.append(chroma)
    return b"".join(out)
