"""Pure-python/numpy GIF codec (87a/89a) — closes another compressed
image format without external libraries, from the public GIF
specification alone.

* ``decode_gif`` — first image frame -> (H, W, 3) uint8: global and
  local color tables, LZW decompression (variable code width, 12-bit
  max), interlaced row order, 89a extension blocks skipped.
  Transparency is ignored (the transparent index renders its palette
  color) — feature extraction does not need alpha.
* ``encode_gif`` — (H, W, 3) uint8 with <= 256 distinct colors ->
  GIF87a bytes.  LZW output uses the public fixed-width technique:
  literal codes only, with CLEAR emitted before the decoder's table
  would force a width increase — valid LZW, no compression, trivially
  correct.  ``interlace=True`` writes the four-pass row order (and is
  how the decoder's interlace path is round-trip tested).

The LZW loops are per-CODE python loops — acceptable for the
actor-stage decode of individual payloads (images are small next to
batch text); the surrounding pipeline stays vectorized.
"""

from __future__ import annotations

import numpy as np

__all__ = ["decode_gif", "encode_gif"]


# ---------------------------------------------------------------------------
# bit I/O (GIF packs LZW codes LSB-first)
# ---------------------------------------------------------------------------

class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0        # bit position

    def read(self, nbits: int) -> int:
        out = 0
        for i in range(nbits):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise ValueError("truncated LZW stream")
            bit = (self.data[byte] >> (self.pos & 7)) & 1
            out |= bit << i
            self.pos += 1
        return out


class _BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.cur = 0
        self.nbits = 0

    def write(self, code: int, width: int):
        self.cur |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.bytes.append(self.cur & 0xFF)
            self.cur >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.bytes.append(self.cur & 0xFF)
            self.cur = 0
            self.nbits = 0
        return bytes(self.bytes)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(h: int) -> np.ndarray:
    """Row indices in GIF interlace transmission order."""
    return np.concatenate([np.arange(start, h, step)
                           for start, step in _INTERLACE_PASSES
                           if start < h]).astype(np.int64)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> np.ndarray:
    clear = 1 << min_code_size
    end = clear + 1
    br = _BitReader(data)
    width = min_code_size + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    out = bytearray()
    prev: int | None = None
    while len(out) < n_pixels:
        code = br.read(width)
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(table[prev] + entry[:1])
        elif code == len(table):
            entry = table[prev] + table[prev][:1]
            table.append(entry)
        else:
            raise ValueError(f"bad LZW code {code}")
        out += entry
        if prev is not None and len(table) == (1 << width) and width < 12:
            width += 1
        prev = code
    return np.frombuffer(bytes(out[:n_pixels]), np.uint8)


def decode_gif(payload: bytes) -> np.ndarray:
    """GIF bytes -> first frame as (H, W, 3) uint8 RGB."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    pos = 6
    sw, sh, packed, _bg, _ar = (
        int.from_bytes(payload[6:8], "little"),
        int.from_bytes(payload[8:10], "little"),
        payload[10], payload[11], payload[12])
    pos = 13
    global_table = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        global_table = np.frombuffer(payload, np.uint8, count=n * 3,
                                     offset=pos).reshape(n, 3)
        pos += n * 3
    while pos < len(payload):
        intro = payload[pos]
        pos += 1
        if intro == 0x3B:           # trailer
            break
        if intro == 0x21:           # extension: label + sub-blocks
            pos += 1
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if intro != 0x2C:
            raise ValueError(f"unexpected block 0x{intro:02x}")
        # image descriptor
        _left = int.from_bytes(payload[pos:pos + 2], "little")
        _top = int.from_bytes(payload[pos + 2:pos + 4], "little")
        w = int.from_bytes(payload[pos + 4:pos + 6], "little")
        h = int.from_bytes(payload[pos + 6:pos + 8], "little")
        ipacked = payload[pos + 8]
        pos += 9
        table = global_table
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            table = np.frombuffer(payload, np.uint8, count=n * 3,
                                  offset=pos).reshape(n, 3)
            pos += n * 3
        if table is None:
            raise ValueError("GIF image with no color table")
        min_code_size = payload[pos]
        pos += 1
        chunks = []
        while payload[pos]:
            ln = payload[pos]
            chunks.append(payload[pos + 1:pos + 1 + ln])
            pos += 1 + ln
        pos += 1
        idx = _lzw_decode(min_code_size, b"".join(chunks), w * h)
        if len(idx) < w * h:
            raise ValueError("truncated GIF pixel data")
        rows = idx.reshape(h, w)
        if ipacked & 0x40:          # interlaced: undo transmission order
            order = _interlace_order(h)
            out_rows = np.empty_like(rows)
            out_rows[order] = rows
            rows = out_rows
        return table[rows]           # (H, W, 3) palette gather
    raise ValueError(f"no image block in GIF ({sw}x{sh} screen)")


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def encode_gif(img: np.ndarray, interlace: bool = False) -> bytes:
    """(H, W, 3) uint8 with <= 256 distinct colors -> GIF87a bytes."""
    img = np.ascontiguousarray(img, np.uint8)
    h, w, c = img.shape
    if c != 3:
        raise ValueError("expected (H, W, 3) RGB")
    flat = img.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(f"{len(palette)} distinct colors > 256 "
                         "(quantize first)")
    bits = max(2, int(len(palette) - 1).bit_length())
    tsize = 1 << bits
    pal = np.zeros((tsize, 3), np.uint8)
    pal[:len(palette)] = palette
    idx = inverse.astype(np.uint32).reshape(h, w)
    if interlace:
        idx = idx[_interlace_order(h)]
    pixels = idx.reshape(-1)

    out = bytearray()
    out += b"GIF87a"
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | (bits - 1), 0, 0])       # global table present
    out += pal.tobytes()
    out += b"\x2c" + b"\x00" * 4                   # image at (0, 0)
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x40 if interlace else 0x00])

    min_code = bits
    clear = 1 << min_code
    end = clear + 1
    width = min_code + 1
    # fixed-width LZW: literals only; CLEAR before the decoder's table
    # (clear+2 entries after reset, +1 per literal after the first)
    # would reach 1<<width and force a width bump
    budget = (1 << width) - (clear + 2)
    bw = _BitWriter()
    bw.write(clear, width)
    since_clear = 0
    for p in pixels:
        if since_clear >= budget:
            bw.write(clear, width)
            since_clear = 0
        bw.write(int(p), width)
        since_clear += 1
    bw.write(end, width)
    data = bw.flush()

    out += bytes([min_code])
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)
