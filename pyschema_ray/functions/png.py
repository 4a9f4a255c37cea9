"""Pure-numpy + stdlib-zlib PNG codec (RFC 2083 / ISO 15948, the
public spec).  With baseline JPEG (jpeg.py) this makes both dominant
web image formats decode for REAL in this environment.

Scope:

* decode: 8-bit greyscale (color type 0), RGB (2), palette (3),
  greyscale+alpha (4), RGBA (6); all five scanline filters
  (None/Sub/Up/Average/Paeth); multiple IDAT chunks; tRNS ignored
  (alpha from palette transparency is dropped — features downstream
  use RGB).  Interlaced (Adam7) and 16-bit streams raise ValueError.
* encode: RGB / greyscale / RGBA 8-bit, filter 0, one IDAT,
  compression via stdlib zlib.

Performance contract: zlib inflate is C; unfiltering is one numpy
pass per row only for Sub/Average/Paeth (the sequential filters —
Up/None are whole-array vectorized).  Meant for thumbnail-scale
payloads inside actor-pool ``map_batches`` stages.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# bytes-per-pixel by color type (8-bit depth)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunks(payload: bytes):
    i = 8
    n = len(payload)
    while i + 8 <= n:
        ln, typ = struct.unpack(">I4s", payload[i:i + 8])
        data = payload[i + 8:i + 8 + ln]
        yield typ, data
        i += 12 + ln  # len + type + data + crc
        if typ == b"IEND":
            return


def decode_png(payload: bytes) -> np.ndarray:
    """PNG -> (H, W, 3) RGB uint8 (greyscale/palette expanded; alpha
    channels dropped after compositing is NOT applied — raw RGB)."""
    if payload[:8] != _SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    width = height = None
    color_type = bit_depth = None
    palette = None
    idat = bytearray()
    for typ, data in _chunks(payload):
        if typ == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, \
                interlace = struct.unpack(">IIBBBBB", data)
            if bit_depth != 8:
                raise ValueError(f"png: bit depth {bit_depth} "
                                 "unsupported (8-bit only)")
            if color_type not in _CHANNELS:
                raise ValueError(f"png: color type {color_type} "
                                 "unsupported")
            if interlace:
                raise ValueError("png: Adam7 interlace unsupported")
        elif typ == b"PLTE":
            palette = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat += data
    if width is None:
        raise ValueError("png: missing IHDR")
    ch = _CHANNELS[color_type]
    raw = np.frombuffer(zlib.decompress(bytes(idat)), np.uint8)
    stride = width * ch
    rows = raw.reshape(height, stride + 1)
    filters = rows[:, 0]
    data = rows[:, 1:].astype(np.int64)

    if np.all(filters == 0):
        recon = data
    elif np.all(filters == 2):  # Up only: one cumulative sum
        recon = np.cumsum(data, axis=0) % 256
    else:
        recon = np.zeros_like(data)
        prev = np.zeros(stride, np.int64)
        for y in range(height):
            f = filters[y]
            cur = data[y].copy()
            if f == 0:
                pass
            elif f == 1:  # Sub: sequential in x per pixel-width lag
                for x in range(ch, stride):
                    cur[x] = (cur[x] + cur[x - ch]) % 256
            elif f == 2:  # Up
                cur = (cur + prev) % 256
            elif f == 3:  # Average
                for x in range(stride):
                    a = cur[x - ch] if x >= ch else 0
                    cur[x] = (cur[x] + (a + prev[x]) // 2) % 256
            elif f == 4:  # Paeth
                for x in range(stride):
                    a = cur[x - ch] if x >= ch else 0
                    b = prev[x]
                    c = prev[x - ch] if x >= ch else 0
                    p = a + b - c
                    pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                    if pa_ <= pb and pa_ <= pc_:
                        pred = a
                    elif pb <= pc_:
                        pred = b
                    else:
                        pred = c
                    cur[x] = (cur[x] + pred) % 256
            else:
                raise ValueError(f"png: unknown filter {f}")
            recon[y] = cur
            prev = cur
    img = (recon % 256).astype(np.uint8).reshape(height, width, ch)
    if color_type == 0:
        return np.repeat(img, 3, axis=2)
    if color_type == 2:
        return img
    if color_type == 3:
        if palette is None:
            raise ValueError("png: palette stream without PLTE")
        return palette[img[:, :, 0]]
    if color_type == 4:  # grey + alpha -> RGB
        return np.repeat(img[:, :, :1], 3, axis=2)
    return img[:, :, :3]  # RGBA -> RGB


def encode_png(img: np.ndarray, level: int = 6) -> bytes:
    """(H, W, 3) RGB / (H, W) grey / (H, W, 4) RGBA uint8 -> PNG
    bytes (filter 0 rows, one IDAT)."""
    if img.ndim == 2:
        color_type, ch = 0, 1
        flat = img[:, :, None]
    elif img.shape[2] == 3:
        color_type, ch = 2, 3
        flat = img
    elif img.shape[2] == 4:
        color_type, ch = 6, 4
        flat = img
    else:
        raise ValueError("encode_png: grey, RGB or RGBA uint8 only")
    h, w = flat.shape[:2]
    rows = np.zeros((h, w * ch + 1), np.uint8)
    rows[:, 1:] = flat.reshape(h, w * ch)
    idat = zlib.compress(rows.tobytes(), level)

    def chunk(typ: bytes, data: bytes) -> bytes:
        return struct.pack(">I", len(data)) + typ + data \
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return _SIGNATURE + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) \
        + chunk(b"IEND", b"")
